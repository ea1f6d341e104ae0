"""Spectral mixture kernel (ops/kernels.py::SpectralMixture).

Oracles: exact RBF reduction at Q=1/μ=0, PSD/symmetry/stationarity,
jacfwd==FD gradients, batched==stacked, and the defining capability —
extrapolating a periodic pattern beyond the training range, which RBF
cannot do.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pygpr_tpu as gp
from pygpr_tpu.models import exact_gp
from pygpr_tpu.ops.kernels import kernel_matrix
from pygpr_tpu.optimize.lbfgs import fit_mle


def test_reduces_to_rbf(rng):
    """Q=1, μ=0: K = w² exp(−‖τ⊙s‖²) == RBF(σ=w, ℓ=s)."""
    d = 3
    sm = gp.SpectralMixture(q=1)
    x = jnp.asarray(rng.uniform(0, 2, (20, d)))
    w, s = 1.3, np.array([0.5, 1.0, 2.0])
    p_sm = jnp.asarray(np.r_[w, np.zeros(d), s])
    p_rbf = jnp.asarray(np.r_[w, s])
    np.testing.assert_allclose(
        np.asarray(sm.matrix(p_sm, x)),
        np.asarray(gp.RBF().matrix(p_rbf, x)),
        rtol=1e-12,
    )
    xp = jnp.asarray(rng.uniform(0, 2, (7, d)))
    np.testing.assert_allclose(
        np.asarray(sm.matrix(p_sm, x, xp)),
        np.asarray(gp.RBF().matrix(p_rbf, x, xp)),
        rtol=1e-12,
    )


def test_psd_symmetric_stationary(rng):
    sm = gp.SpectralMixture(q=3)
    x = jnp.asarray(rng.uniform(0, 4, (30, 2)))
    p = jnp.asarray(
        np.abs(np.asarray(sm.init_params(x)))
        + 0.3 * rng.uniform(size=sm.n_params(2))
    )
    K = np.asarray(sm.matrix(p, x))
    np.testing.assert_allclose(K, K.T, rtol=1e-10)
    assert (np.linalg.eigvalsh(K + 1e-9 * np.eye(30)) > 0).all()
    # stationarity: shifting every input leaves K unchanged
    K2 = np.asarray(sm.matrix(p, x + 13.7))
    np.testing.assert_allclose(K2, K, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(sm.diag(p, x)), np.diag(K), rtol=1e-10
    )


def test_grads_match_fd(rng):
    sm = gp.SpectralMixture(q=2)
    x = jnp.asarray(rng.uniform(0, 2, (10, 2)))
    p = jnp.asarray(0.5 + rng.uniform(size=sm.n_params(2)))
    K, dK = sm.matrix_and_grad(p, x)
    eps = 1e-6
    for j in range(p.shape[0]):
        fd = (
            sm.matrix(p.at[j].add(eps), x)
            - sm.matrix(p.at[j].add(-eps), x)
        ) / (2 * eps)
        np.testing.assert_allclose(
            np.asarray(dK[j]), np.asarray(fd), rtol=1e-4, atol=1e-7
        )


def test_batched_equals_stacked(rng):
    sm = gp.SpectralMixture(q=2)
    x = jnp.asarray(rng.uniform(0, 2, (4, 12, 2)))
    p = jnp.asarray(0.5 + rng.uniform(size=(4, sm.n_params(2))))
    Kb = np.asarray(kernel_matrix(sm, p, x))
    for c in range(4):
        np.testing.assert_allclose(
            Kb[c], np.asarray(sm.matrix(p[c], x[c])), rtol=1e-12
        )


def test_constant_kernel(rng):
    """Constant bias kernel: RBF + Constant + noise absorbs a big
    offset that plain RBF + noise must strain to represent."""
    kern = gp.Constant()
    x = jnp.asarray(rng.uniform(0, 2, (12, 2)))
    p = jnp.asarray([1.7])
    K = np.asarray(kern.matrix(p, x))
    np.testing.assert_allclose(K, 1.7**2, rtol=1e-12)
    Kc, dK = kern.matrix_and_grad(p, x)
    np.testing.assert_allclose(np.asarray(dK[0]), 2 * 1.7, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(kern.diag(p, x)), 1.7**2, rtol=1e-12
    )
    # end-to-end: y = 10 + sin(2x); the fitted constant soaks the level
    n = 96
    xr = jnp.asarray(rng.uniform(0, 4, (n, 1)))
    yr = 10.0 + jnp.sin(2 * xr[:, 0]) + 0.05 * jnp.asarray(
        rng.normal(size=n)
    )
    cov = gp.RBF() + gp.Constant() + gp.WhiteNoise()
    res = fit_mle(cov, cov.init_params(xr), xr, yr, max_iter=150)
    st = exact_gp.factorize(cov, res.params, xr, yr)
    xs = jnp.asarray(rng.uniform(0, 4, (48, 1)))
    m, _ = exact_gp.predict(cov, st, xs, "diag")
    rmse = float(jnp.sqrt(jnp.mean(
        (m - (10.0 + jnp.sin(2 * xs[:, 0]))) ** 2)))
    assert rmse < 0.1, rmse


def test_random_kernel_trees_psd_and_grads(rng):
    """Property test over random Sum/Product compositions: every tree
    yields a symmetric PSD gram whose analytic param-gradients match
    jacfwd of its own matrix()."""
    leaves = [
        lambda: gp.RBF(),
        lambda: gp.Matern(2.5),
        lambda: gp.RationalQuadratic(),
        lambda: gp.Linear(),
        lambda: gp.Periodic(),
        lambda: gp.Constant(),
        lambda: gp.WhiteNoise(),
    ]

    def random_tree(depth):
        if depth == 0 or rng.uniform() < 0.4:
            return leaves[rng.integers(len(leaves))]()
        a, b = random_tree(depth - 1), random_tree(depth - 1)
        return a + b if rng.uniform() < 0.5 else a * b

    x = jnp.asarray(rng.uniform(0, 2, (10, 2)))
    for _ in range(12):
        kern = random_tree(2)
        nhp = kern.n_params(2)
        p = jnp.asarray(0.4 + 0.8 * rng.uniform(size=nhp))
        K = np.asarray(kern.matrix(p, x))
        np.testing.assert_allclose(K, K.T, rtol=1e-9, atol=1e-11)
        ev = np.linalg.eigvalsh(K + 1e-9 * np.eye(10))
        assert (ev > -1e-8).all(), type(kern).__name__
        _, dK = kern.matrix_and_grad(p, x)
        jac = jnp.moveaxis(
            jax.jacfwd(lambda q: kern.matrix(q, x))(p), -1, 0
        )
        np.testing.assert_allclose(
            np.asarray(dK), np.asarray(jac), rtol=1e-7, atol=1e-9
        )


def test_pattern_extrapolation_beats_rbf(rng):
    """The SM selling point: learn the spectrum on [0, 6], predict on
    [7, 9] — far outside the RBF correlation length."""
    n = 192
    x = np.sort(rng.uniform(0, 6, n))[:, None]
    f = lambda t: np.cos(3.0 * t) + 0.5 * np.cos(7.0 * t)
    y = f(x[:, 0]) + 0.05 * rng.normal(size=n)
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    xs = jnp.asarray(np.linspace(7.0, 9.0, 80)[:, None])
    want = f(np.asarray(xs)[:, 0])

    sm = gp.SpectralMixture(q=2)
    cov_sm = sm + gp.WhiteNoise()
    # the standard SM workflow: R spectral restarts, vmapped into ONE
    # fit program by fit_mle's committee axis, keep the best NLML
    R = 8
    p0 = np.c_[
        sm.init_from_data(x, seed=1, n_restarts=R),
        np.full((R, 1), 0.1),
    ]
    xr = jnp.broadcast_to(xj, (R,) + xj.shape)
    yr = jnp.broadcast_to(yj, (R,) + yj.shape)
    res = fit_mle(cov_sm, jnp.asarray(p0), xr, yr, max_iter=300)
    best = int(np.nanargmin(np.asarray(res.value)))
    p_best = res.params[best]
    st = exact_gp.factorize(cov_sm, p_best, xj, yj)
    m_sm, _ = exact_gp.predict(cov_sm, st, xs, "diag")
    rmse_sm = float(np.sqrt(np.mean((np.asarray(m_sm) - want) ** 2)))

    cov_r = gp.RBF() + gp.WhiteNoise()
    res_r = fit_mle(cov_r, cov_r.init_params(xj), xj, yj, max_iter=300)
    st_r = exact_gp.factorize(cov_r, res_r.params, xj, yj)
    m_r, _ = exact_gp.predict(cov_r, st_r, xs, "diag")
    rmse_r = float(np.sqrt(np.mean((np.asarray(m_r) - want) ** 2)))

    assert rmse_sm < 0.25, rmse_sm
    assert rmse_sm < 0.5 * rmse_r, (rmse_sm, rmse_r)
