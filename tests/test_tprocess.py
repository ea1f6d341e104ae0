"""Student-t process tests: the ν → ∞ Gaussian reduction (NLML and
predictive), the β-dependent predictive-variance inflation the TP
exists for, FD gradients, NLPD robustness under outliers vs the GP,
and the end-to-end joint (θ, ν) fit."""

import jax
import jax.numpy as jnp
import numpy as np

import pygpr_tpu as gp
from pygpr_tpu.models import exact_gp, likelihood, tprocess


def _problem(n=80, seed=0, noise=0.15):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(0, 4, (n, 1)), axis=0))
    y = jnp.asarray(
        np.sin(2 * np.asarray(x)[:, 0]) + noise * rng.normal(size=n)
    )
    return x, y


def test_nlml_reduces_to_gaussian_at_large_nu():
    x, y = _problem()
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    params = jnp.asarray([1.0, 1.0, 0.2])
    v_g = float(likelihood.nlml(cov, params, x, y))
    prev_gap = np.inf
    for nu in (10.0, 100.0, 1e4, 1e6):
        v_t = float(tprocess.nlml_tp(cov, params, nu, x, y))
        gap = abs(v_t - v_g)
        assert gap < prev_gap  # monotone convergence in ν
        prev_gap = gap
    assert prev_gap < 1e-3, prev_gap


def test_predictive_mean_equals_gp_and_variance_inflates():
    x, y = _problem()
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    params = jnp.asarray([1.0, 1.0, 0.2])
    state = exact_gp.factorize(cov, params, x, y)
    xs = jnp.asarray(np.linspace(0.2, 3.8, 33)[:, None])
    m_g, v_g = exact_gp.predict(cov, state, xs, "diag")

    m_t, v_t, dof = tprocess.predict_tp(cov, state, 5.0, xs)
    # mean is EXACTLY the GP mean (lemma 3)
    np.testing.assert_allclose(np.asarray(m_t), np.asarray(m_g),
                               rtol=1e-12)
    assert float(dof) == 5.0 + x.shape[0]
    # scale = (ν + β − 2)/(ν + n − 2), checked explicitly
    from pygpr_tpu.ops import linalg
    z = linalg.solve_lower(state.chol, y)
    beta = float(z @ z)
    scale = (5.0 + beta - 2.0) / (5.0 + x.shape[0] - 2.0)
    np.testing.assert_allclose(
        np.asarray(v_t), scale * np.asarray(v_g), rtol=1e-10
    )
    # surprising data (β ≫ n) must inflate; ν → ∞ recovers the GP var
    m_inf, v_inf, _ = tprocess.predict_tp(cov, state, 1e7, xs)
    np.testing.assert_allclose(np.asarray(v_inf), np.asarray(v_g),
                               rtol=1e-5)


def test_nlml_fd_gradients():
    x, y = _problem(n=40, seed=2)
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))

    def obj(u):
        nu = 2.0 + jax.nn.softplus(u[-1])
        return tprocess.nlml_tp(cov, jnp.exp(u[:-1]), nu, x, y)

    u0 = jnp.asarray([0.1, -0.2, jnp.log(0.3), 1.0])
    g = jax.grad(obj)(u0)
    eps = 1e-6
    for i in range(4):
        e = jnp.zeros(4).at[i].set(eps)
        fd = (float(obj(u0 + e)) - float(obj(u0 - e))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd, rtol=1e-5,
                                   atol=1e-9)


def test_tp_marginalizes_amplitude_surprise():
    """The TP's defining deterministic property (it is a Gaussian
    scale mixture): when the realized amplitude disagrees with the
    kernel (β = yᵀK⁻¹y ≠ n), a FINITE ν gives strictly higher marginal
    likelihood than the Gaussian at the same kernel parameters, with
    an interior optimum in ν.  A single elliptical draw cannot
    identify ν beyond this amplitude effect — that is exactly what the
    test pins."""
    rng = np.random.default_rng(5)
    n = 150
    x = jnp.asarray(np.sort(rng.uniform(0, 4, (n, 1)), axis=0))
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    params = jnp.asarray([1.0, 1.0, 0.1])
    K = np.asarray(cov.matrix(params, x)) + 1e-8 * np.eye(n)
    L = np.linalg.cholesky(K)
    # amplitude-surprising data: a unit draw scaled 2.5× ⇒ β ≈ 6n
    y = jnp.asarray(2.5 * (L @ rng.standard_normal(n)))

    v_gauss = float(likelihood.nlml(cov, params, x, y))
    vals = {
        nu: float(tprocess.nlml_tp(cov, params, nu, x, y))
        for nu in (2.5, 4.0, 8.0, 32.0, 1e6)
    }
    # ν → ∞ recovers the Gaussian (gap is O(β²/ν) — β ≈ 6n here);
    # moderate ν strictly beats it
    np.testing.assert_allclose(vals[1e6], v_gauss, rtol=2e-3)
    assert vals[4.0] < v_gauss - 10.0, (vals, v_gauss)
    # interior optimum: the profile is not monotone toward ν → 2
    assert vals[2.5] > vals[4.0], vals
    # and the joint fit exploits it: fitted TP evidence ≤ fitted
    # Gaussian evidence (the TP contains the Gaussian)
    res_t = tprocess.fit_tp(cov, x, y, nu0=8.0, max_iter=150)
    from pygpr_tpu.optimize.lbfgs import fit_mle
    res_g = fit_mle(cov, cov.init_params(x), x, y, max_iter=150)
    v_g_fit = float(likelihood.nlml(cov, res_g.params, x, y))
    assert float(res_t.nlml) <= v_g_fit + 1e-3, (
        float(res_t.nlml), v_g_fit
    )


def test_tprocess_wrapper():
    x, y = _problem(n=50, seed=7)
    tp = tprocess.TProcess(x, y, gp.Sum((gp.RBF(), gp.WhiteNoise())))
    res = tp.train(max_iter=60)
    mean, cov_d, dof = tp.predict(x)
    assert np.isfinite(np.asarray(mean)).all()
    assert np.all(np.asarray(cov_d) > 0)
    assert float(dof) > 52.0  # ν > 2 plus n
    assert np.isfinite(float(res.nlml))
