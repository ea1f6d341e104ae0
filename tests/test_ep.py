"""Expectation-propagation tests.

Anchors: (1) with a Gaussian likelihood EP must terminate at the EXACT
posterior and exact LML (sites can represent the likelihood exactly);
(2) on a tiny probit problem the EP evidence must match a brute-force
tensor-quadrature ground truth — and beat the Laplace approximation's
evidence error (the Kuss & Rasmussen 2005 result the module exists
for).  Plus: GH fallback == closed-form probit moments, FD evidence
gradients through the AD-through-sweeps path, end-to-end fit, OO
wrapper."""

import jax
import jax.numpy as jnp
import numpy as np

import pygpr_tpu as gp
from pygpr_tpu.models import ep, exact_gp, laplace, likelihood, obs


def _problem(n=60, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(0, 4, (n, 1)), axis=0))
    f = np.sin(2.0 * np.asarray(x)[:, 0])
    y = jnp.asarray(f + 0.2 * rng.normal(size=n))
    return x, f, y


def test_ep_gaussian_likelihood_is_exact():
    """Gaussian sites represent a Gaussian likelihood exactly, so the
    EP fixed point IS the exact posterior: evidence, marginals, and
    predictive moments must match the closed-form exact GP."""
    x, f, y = _problem()
    kern = gp.RBF()
    params = jnp.asarray([1.0, 1.0])
    lik = obs.GaussianLik()
    lp = jnp.asarray([np.log(0.2)])
    st = ep.posterior_ep(kern, params, lik, lp, x, y,
                         n_sweeps=40, damping=0.9)
    assert bool(st.ok)
    assert float(st.delta) < 1e-10  # converged to fixed point

    cov_exact = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    pe = jnp.asarray([1.0, 1.0, 0.2])
    v_exact = likelihood.nlml(cov_exact, pe, x, y)
    np.testing.assert_allclose(
        float(st.nlml), float(v_exact), rtol=2e-5
    )

    state_e = exact_gp.factorize(cov_exact, pe, x, y)
    mu_e, _ = exact_gp.predict(cov_exact, state_e, x, "diag")
    np.testing.assert_allclose(
        np.asarray(st.mu), np.asarray(mu_e), atol=1e-6
    )
    xs = jnp.asarray(np.linspace(0, 4, 33)[:, None])
    m_ep, v_ep = ep.predict(kern, st, xs, lik, space="latent")
    m_ex, v_ex = exact_gp.predict(cov_exact, state_e, xs, "diag")
    np.testing.assert_allclose(
        np.asarray(m_ep), np.asarray(m_ex), atol=1e-6
    )
    # exact-GP variance includes the σₙ² noise block on the diagonal
    np.testing.assert_allclose(
        np.asarray(v_ep), np.asarray(v_ex) - 0.04, atol=1e-6
    )


def _brute_force_log_evidence(K, s, n_nodes=48):
    """Ground-truth log ∫ N(f; 0, K) Πᵢ Φ(sᵢ fᵢ) df by tensor-grid
    Gauss-Hermite in the whitened space f = L e."""
    from scipy.stats import norm

    L = np.linalg.cholesky(K)
    xg, wg = np.polynomial.hermite.hermgauss(n_nodes)
    xg = xg * np.sqrt(2.0)
    wg = wg / np.sqrt(np.pi)
    n = K.shape[0]
    grids = np.meshgrid(*([xg] * n), indexing="ij")
    e = np.stack([g.ravel() for g in grids], axis=-1)     # [M, n]
    w = np.ones(e.shape[0])
    for g in np.meshgrid(*([wg] * n), indexing="ij"):
        w = w * g.ravel()
    fv = e @ L.T
    integrand = norm.cdf(s[None, :] * fv).prod(axis=-1)
    return float(np.log(np.sum(w * integrand)))


def test_ep_evidence_matches_brute_force_and_beats_laplace():
    """n=3 probit: EP's log Z vs exact quadrature — small error, and
    no worse than Laplace's (EP is the calibration gold standard among
    the deterministic approximations)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 2, (3, 1)))
    yc = jnp.asarray(np.array([1.0, 0.0, 1.0]))
    kern = gp.RBF()
    params = jnp.asarray([1.2, 0.8])
    K = np.asarray(kern.matrix(params, x))
    s = 2.0 * np.asarray(yc) - 1.0

    log_z_true = _brute_force_log_evidence(K, s)
    lik = obs.BernoulliProbit()
    st = ep.posterior_ep(kern, params, lik, jnp.zeros(0), x, yc,
                         n_sweeps=50, damping=0.8)
    err_ep = abs(float(-st.nlml) - log_z_true)

    st_l = laplace.posterior_mode(kern, params, lik, jnp.zeros(0),
                                  x, yc)
    err_laplace = abs(float(-st_l.nlml) - log_z_true)

    assert err_ep < 0.02, (err_ep, log_z_true)
    assert err_ep <= err_laplace + 1e-6, (err_ep, err_laplace)


def test_gh_fallback_matches_closed_form_probit_moments():
    """The generic log-domain Gauss-Hermite tilted moments must agree
    with the probit's exact R&W §3.9 formulas."""

    class ProbitNoClosedForm:
        n_params = 0

        def log_lik(self, lp, y, f):
            return jax.scipy.stats.norm.logcdf((2.0 * y - 1.0) * f)

    rng = np.random.default_rng(1)
    y = jnp.asarray((rng.uniform(size=16) > 0.4).astype(np.float64))
    mu = jnp.asarray(rng.normal(size=16))
    var = jnp.asarray(rng.uniform(0.2, 2.0, size=16))

    lz_g, mu_g, var_g = ep._tilted_moments(
        ProbitNoClosedForm(), jnp.zeros(0), y, mu, var
    )
    lz_c, mu_c, var_c = obs.BernoulliProbit().tilted_moments(
        jnp.zeros(0), y, mu, var
    )
    np.testing.assert_allclose(np.asarray(lz_g), np.asarray(lz_c),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(mu_g), np.asarray(mu_c),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(var_g), np.asarray(var_c),
                               atol=1e-7)


def test_ep_evidence_gradients_fd():
    """AD through the damped sweeps vs central finite differences of
    −log Z_EP in log-hyperparameter space."""
    x, f, _ = _problem(n=24, seed=2)
    yc = jnp.asarray((f > 0).astype(np.float64))
    kern = gp.RBF()
    lik = obs.BernoulliProbit()

    def obj(u):
        return ep.nlml(kern, jnp.exp(u), lik, jnp.zeros(0), x, yc,
                       n_sweeps=30, damping=0.7)

    u0 = jnp.asarray([0.2, -0.1])
    g = jax.grad(obj)(u0)
    eps = 1e-5
    for i in range(2):
        e = jnp.zeros(2).at[i].set(eps)
        fd = (float(obj(u0 + e)) - float(obj(u0 - e))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd, rtol=2e-4,
                                   atol=1e-6)


def test_ep_fit_classification_end_to_end():
    """L-BFGS on −log Z_EP must improve the evidence and produce a
    calibrated classifier on held-out points."""
    rng = np.random.default_rng(5)
    n = 80
    x = jnp.asarray(np.sort(rng.uniform(0, 4, (n, 1)), axis=0))
    f = np.sin(2.0 * np.asarray(x)[:, 0])
    yc = jnp.asarray((f + 0.3 * rng.normal(size=n) > 0).astype(
        np.float64
    ))
    kern = gp.RBF()
    lik = obs.BernoulliProbit()

    v0 = float(ep.nlml(kern, jnp.asarray([1.0, 1.0]), lik,
                       jnp.zeros(0), x, yc))
    res = ep.fit(kern, lik, x, yc, max_iter=40)
    assert float(res.nlml) < v0
    assert bool(res.state.ok)

    xs = jnp.asarray(np.linspace(0.1, 3.9, 64)[:, None])
    p, pvar = ep.predict(kern, res.state, xs, lik)
    truth = (np.sin(2.0 * np.asarray(xs)[:, 0]) > 0)
    acc = float(np.mean((np.asarray(p) > 0.5) == truth))
    assert acc >= 0.9, acc
    assert np.all(np.asarray(pvar) >= 0.0)


def test_epgp_wrapper():
    x, f, _ = _problem(n=40, seed=7)
    yc = jnp.asarray((f > 0).astype(np.float64))
    model = ep.EPGP(x, yc, gp.RBF(), obs.BernoulliProbit())
    res = model.train(max_iter=25)
    p, _ = model.predict(x)
    acc = float(np.mean((np.asarray(p) > 0.5) == (np.asarray(yc) > 0.5)))
    assert acc >= 0.95
    assert np.isfinite(float(res.nlml))
