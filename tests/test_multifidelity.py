"""Multi-fidelity (AR(1) co-kriging) tests: exact ρ recovery on-model,
the ρ = 0 reduction to an independent hi-only GP, FD gradients of the
joint (θ_δ, ρ) stage-2 objective, and the headline property — scarce
high-fidelity data + plentiful low-fidelity data beats the hi-only
exact GP out of sample."""

import jax
import jax.numpy as jnp
import numpy as np

import pygpr_tpu as gp
from pygpr_tpu.models import exact_gp, multifidelity as mf
from pygpr_tpu.optimize.lbfgs import fit_mle


def _mf_problem(n_lo=120, n_hi=12, rho=1.8, seed=0):
    """f_lo = sin(2x); f_hi = ρ·f_lo + 0.4·cos(5x) (smooth bias)."""
    rng = np.random.default_rng(seed)
    x_lo = jnp.asarray(np.sort(rng.uniform(0, 4, (n_lo, 1)), axis=0))
    x_hi = jnp.asarray(np.sort(rng.uniform(0.1, 3.9, (n_hi, 1)),
                               axis=0))
    f_lo = lambda x: np.sin(2 * x[:, 0])
    f_hi = lambda x: rho * np.sin(2 * x[:, 0]) + 0.4 * np.cos(
        5 * x[:, 0]
    )
    y_lo = jnp.asarray(
        f_lo(np.asarray(x_lo)) + 0.05 * rng.normal(size=n_lo)
    )
    y_hi = jnp.asarray(
        f_hi(np.asarray(x_hi)) + 0.05 * rng.normal(size=n_hi)
    )
    return x_lo, y_lo, x_hi, y_hi, f_hi


def test_rho_recovery_and_prediction_quality():
    x_lo, y_lo, x_hi, y_hi, f_hi = _mf_problem()
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    state = mf.fit_mf(cov, cov, x_lo, y_lo, x_hi, y_hi)
    assert 1.4 < float(state.rho) < 2.2, float(state.rho)

    rng = np.random.default_rng(9)
    xq_h = np.sort(rng.uniform(0.2, 3.8, (64, 1)), axis=0)
    xq = jnp.asarray(xq_h)
    mean, var = mf.predict_mf(cov, cov, state, xq)
    truth = f_hi(xq_h)
    rmse_mf = float(np.sqrt(np.mean((np.asarray(mean) - truth) ** 2)))
    assert np.all(np.asarray(var) > 0)

    # hi-only exact GP on the same 12 points
    res_hi = fit_mle(cov, cov.init_params(x_hi), x_hi, y_hi,
                     max_iter=150)
    st_hi = exact_gp.factorize(cov, res_hi.params, x_hi, y_hi)
    m_hi, _ = exact_gp.predict(cov, st_hi, xq, "diag")
    rmse_hi = float(np.sqrt(np.mean((np.asarray(m_hi) - truth) ** 2)))
    assert rmse_mf < 0.5 * rmse_hi, (rmse_mf, rmse_hi)
    # the cos(5x) discrepancy is genuinely under-sampled at 12 hi
    # points; ~0.19 is the recursive estimator's level here
    assert rmse_mf < 0.25, rmse_mf


def test_rho_zero_reduces_to_independent_hi_gp():
    """With ρ pinned at 0 the stage-2 NLML is exactly the hi-only
    Gaussian NLML."""
    from pygpr_tpu.models.likelihood import nlml as gauss_nlml

    x_lo, y_lo, x_hi, y_hi, _ = _mf_problem(seed=2)
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    res_lo = fit_mle(cov, cov.init_params(x_lo), x_lo, y_lo,
                     max_iter=80)
    st_lo = exact_gp.factorize(cov, res_lo.params, x_lo, y_lo)
    pd = jnp.asarray([1.0, 1.0, 0.2])
    v2 = float(mf.nlml_stage2(cov, pd, jnp.asarray(0.0), cov, st_lo,
                              x_hi, y_hi))
    v_ind = float(gauss_nlml(cov, pd, x_hi, y_hi))
    np.testing.assert_allclose(v2, v_ind, rtol=1e-12)


def test_stage2_fd_gradients():
    x_lo, y_lo, x_hi, y_hi, _ = _mf_problem(seed=3)
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    res_lo = fit_mle(cov, cov.init_params(x_lo), x_lo, y_lo,
                     max_iter=60)
    st_lo = exact_gp.factorize(cov, res_lo.params, x_lo, y_lo)

    def obj(u):
        return mf.nlml_stage2(cov, jnp.exp(u[:3]), u[3], cov, st_lo,
                              x_hi, y_hi)

    u0 = jnp.asarray([0.1, -0.2, np.log(0.3), 1.2])
    g = jax.grad(obj)(u0)
    eps = 1e-6
    for i in range(4):
        e = jnp.zeros(4).at[i].set(eps)
        fd = (float(obj(u0 + e)) - float(obj(u0 - e))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd, rtol=1e-5,
                                   atol=1e-8)


def test_wrapper():
    x_lo, y_lo, x_hi, y_hi, f_hi = _mf_problem(seed=4)
    model = mf.MultiFidelityGP(
        x_lo, y_lo, x_hi, y_hi, gp.Sum((gp.RBF(), gp.WhiteNoise()))
    )
    st = model.train(max_iter=100)
    mean, var = model.predict(x_hi)
    assert np.isfinite(np.asarray(mean)).all()
    assert np.all(np.asarray(var) > 0)
    assert np.isfinite(float(st.nlml_d))
