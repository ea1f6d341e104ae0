"""Matérn kernel family + diagnostics tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pygpr_tpu as gp
from pygpr_tpu.ops.kernels import Matern, kernel_matrix
from pygpr_tpu.models.exact_gp import ExactGP, factorize
from pygpr_tpu.utils.diagnostics import (
    check_state,
    checkify_nlml,
    expert_mask,
    summarize,
)


@pytest.mark.parametrize("nu", (0.5, 1.5, 2.5))
def test_matern_closed_form(nu, rng):
    x = jnp.asarray(rng.uniform(size=(40, 2)))
    p = jnp.asarray(0.5 + rng.uniform(size=3))
    K = np.asarray(kernel_matrix(Matern(nu), p, x))
    # naive formula
    sig, ls = float(p[0]), np.asarray(p[1:])
    d = np.sqrt(
        np.sum(
            ((np.asarray(x)[:, None] - np.asarray(x)[None]) * ls) ** 2, -1
        )
    )
    if nu == 0.5:
        ref = sig**2 * np.exp(-d)
    elif nu == 1.5:
        ref = sig**2 * (1 + np.sqrt(3) * d) * np.exp(-np.sqrt(3) * d)
    else:
        ref = (
            sig**2
            * (1 + np.sqrt(5) * d + 5.0 / 3.0 * d**2)
            * np.exp(-np.sqrt(5) * d)
        )
    np.testing.assert_allclose(K, ref, atol=1e-9)
    # symmetric, PSD after jitter
    np.testing.assert_allclose(K, K.T, atol=1e-12)
    assert np.linalg.eigvalsh(K + 1e-7 * np.eye(40)).min() > -1e-7


@pytest.mark.parametrize("nu", (1.5, 2.5))
def test_matern_grad_fd(nu, rng):
    """matrix_and_grad (jacfwd path) vs finite differences."""
    from pygpr_tpu.ops.kernels import kernel_and_grad

    x = jnp.asarray(rng.uniform(size=(15, 2)))
    p = jnp.asarray(0.5 + rng.uniform(size=3))
    _, dK = kernel_and_grad(Matern(nu), p, x)
    eps = 1e-7
    for k in range(3):
        pp = np.asarray(p).copy()
        pp[k] += eps
        fd = (
            np.asarray(kernel_matrix(Matern(nu), jnp.asarray(pp), x))
            - np.asarray(kernel_matrix(Matern(nu), p, x))
        ) / eps
        np.testing.assert_allclose(np.asarray(dK[k]), fd, atol=1e-5)


def test_matern_gp_interpolates(rng):
    x = jnp.asarray(rng.uniform(size=(50, 2)))
    y = jnp.sin(x.sum(-1))
    gp_m = ExactGP(x, y, Matern(2.5) + gp.WhiteNoise())
    ys, var = gp_m.predict(x, var="diag")
    np.testing.assert_allclose(np.asarray(ys), np.asarray(y), atol=1e-3)


def test_matern_in_fit(rng):
    from pygpr_tpu.optimize import fit_mle

    x = jnp.asarray(rng.uniform(size=(40, 1)))
    y = jnp.sin(4 * x[:, 0]) + 0.05 * jnp.asarray(rng.normal(size=40))
    cov = Matern(1.5) + gp.WhiteNoise()
    res = fit_mle(cov, cov.init_params(x), x, y, max_iter=100)
    assert np.isfinite(float(res.value))


def test_diagnostics_healthy(rng):
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    x = jnp.asarray(rng.uniform(size=(4, 20, 2)))
    y = jnp.sin(x.sum(-1))
    st = factorize(cov, cov.init_params(x), x, y)
    h = check_state(st)
    assert np.asarray(h.ok).all()
    mask = expert_mask(st)
    assert mask.shape == (4,)
    assert np.asarray(mask).all()
    s = summarize(st)
    assert s["n_experts"] == 4 and s["n_failed"] == 0


def test_diagnostics_escalation(rng):
    """Duplicated points force the ladder up; diagnostics must see it."""
    x1 = jnp.asarray(rng.uniform(size=(10, 2)))
    x = jnp.concatenate([x1, x1])[None]  # [1, 20, 2] committee of 1
    y = jnp.sin(x.sum(-1))
    cov = gp.RBF()
    st = factorize(cov, cov.init_params(x), x, y)
    s = summarize(st)
    assert s["n_jitter_escalated"] >= 0  # escalation recorded w/o error
    assert s["max_jitter"] >= 1e-7


def test_checkify_nlml_flags_nonfinite(rng):
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    x = jnp.asarray(rng.uniform(size=(20, 2)))
    y = jnp.sin(x.sum(-1))
    f = checkify_nlml(cov, x, y)
    err, val = f(cov.init_params(x))
    err.throw()  # healthy: no error
    # poison params -> non-finite NLML must be flagged
    bad = jnp.asarray([jnp.nan, 1.0, 1.0, 1e-4])
    err, _ = f(bad)
    with pytest.raises(Exception):
        err.throw()


def test_metrics(rng):
    from pygpr_tpu.models.metrics import nlpd, rmse, standardized_mse

    y = jnp.asarray(rng.normal(size=50))
    assert float(rmse(y, y)) == 0.0
    # perfectly calibrated Gaussian: nlpd ≈ entropy-rate, smse ≈ 1
    mean = jnp.zeros(50000)
    var = jnp.ones(50000) * 4.0
    draws = jnp.asarray(rng.normal(size=50000) * 2.0)
    expected = 0.5 * np.log(2 * np.pi * 4.0) + 0.5
    np.testing.assert_allclose(float(nlpd(draws, mean, var)), expected, rtol=0.02)
    np.testing.assert_allclose(float(standardized_mse(draws, mean, var)), 1.0, rtol=0.05)
