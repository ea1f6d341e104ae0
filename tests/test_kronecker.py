"""Kronecker grid-GP tests: EXACT parity with the dense O(N³) pipeline
(NLML, predictive mean/variance) on 2-D and 3-D grids, FD gradients
through the eigendecomposition, end-to-end fit, and the scaling
headline — an N≈10⁴ grid NLML that the dense path would need ~10¹²
FLOPs for runs in milliseconds."""

import time

import jax
import jax.numpy as jnp
import numpy as np

import pygpr_tpu as gp
from pygpr_tpu.models import exact_gp, kronecker, likelihood


def _grid2(seed=0, g1=8, g2=7):
    rng = np.random.default_rng(seed)
    ax1 = jnp.asarray(np.sort(rng.uniform(0, 3, g1)))
    ax2 = jnp.asarray(np.sort(rng.uniform(0, 2, g2)))
    X1, X2 = np.meshgrid(np.asarray(ax1), np.asarray(ax2),
                         indexing="ij")
    x_full = jnp.asarray(np.stack([X1.ravel(), X2.ravel()], -1))
    y = jnp.asarray(
        np.sin(2 * X1) * np.cos(3 * X2)
        + 0.1 * rng.normal(size=X1.shape)
    )
    return [ax1, ax2], x_full, y


#: dense-path comparisons fold the exact pipeline's fixed 1e-7 jitter
#: (reference parity, PyGPR/gpr.py:68) into the Kronecker noise term —
#: the structured path needs no jitter at all.
_SN_ADJ = np.sqrt(0.04 + 1e-7)


def test_nlml_matches_dense_exactly():
    axes, x_full, y = _grid2()
    kern = gp.Separable("rbf")
    pf = jnp.asarray([1.0, 1.2, 0.9, _SN_ADJ])
    v_k = float(kronecker.nlml_kron(kern, pf, axes, y))

    cov = gp.Sum((gp.Separable("rbf"), gp.WhiteNoise()))
    pd = jnp.asarray([1.0, 1.2, 0.9, 0.2])
    v_d = float(likelihood.nlml(cov, pd, x_full, y.ravel()))
    np.testing.assert_allclose(v_k, v_d, rtol=1e-9)


def test_nlml_matches_dense_3d():
    rng = np.random.default_rng(1)
    axes = [jnp.asarray(np.sort(rng.uniform(0, 1, 5)))
            for _ in range(3)]
    G = np.meshgrid(*[np.asarray(a) for a in axes], indexing="ij")
    x_full = jnp.asarray(np.stack([g.ravel() for g in G], -1))
    y = jnp.asarray(
        np.sin(G[0] + G[1]) * G[2] + 0.05 * rng.normal(size=G[0].shape)
    )
    for profile in ("rbf", "matern32"):
        kern = gp.Separable(profile)
        pk = jnp.asarray([1.0, 1.0, 1.0, 1.0, _SN_ADJ])
        pd = jnp.asarray([1.0, 1.0, 1.0, 1.0, 0.2])
        v_k = float(kronecker.nlml_kron(kern, pk, axes, y))
        cov = gp.Sum((gp.Separable(profile), gp.WhiteNoise()))
        v_d = float(likelihood.nlml(cov, pd, x_full, y.ravel()))
        np.testing.assert_allclose(v_k, v_d, rtol=1e-9)


def test_predict_matches_dense_exact_gp():
    axes, x_full, y = _grid2()
    kern = gp.Separable("rbf")
    pf = jnp.asarray([1.0, 1.2, 0.9, _SN_ADJ])
    st = kronecker.factorize_kron(kern, pf, axes, y)
    assert bool(st.ok)

    rng = np.random.default_rng(2)
    xq = jnp.asarray(rng.uniform(0, 2, (11, 2)))
    m_k, v_k = kronecker.predict_kron(kern, st, xq)

    cov = gp.Sum((gp.Separable("rbf"), gp.WhiteNoise()))
    pd = jnp.asarray([1.0, 1.2, 0.9, 0.2])
    se = exact_gp.factorize(cov, pd, x_full, y.ravel())
    m_e, v_e = exact_gp.predict(cov, se, xq, "diag")
    np.testing.assert_allclose(
        np.asarray(m_k), np.asarray(m_e), atol=1e-9
    )
    # dense diag includes the σₙ² noise block on the query diagonal
    # (jitter touches only the train gram)
    np.testing.assert_allclose(
        np.asarray(v_k), np.asarray(v_e) - 0.04, atol=1e-9
    )
    # var="none" contract
    m_n, v_n = kronecker.predict_kron(kern, st, xq, "none")
    assert v_n is None
    np.testing.assert_allclose(np.asarray(m_n), np.asarray(m_k))


def test_nlml_fd_gradients_through_eigh():
    axes, _, y = _grid2(seed=3)
    kern = gp.Separable("rbf")

    def obj(u):
        return kronecker.nlml_kron(kern, jnp.exp(u), axes, y)

    u0 = jnp.log(jnp.asarray([1.0, 1.2, 0.9, 0.25]))
    g = jax.grad(obj)(u0)
    eps = 1e-6
    for i in range(4):
        e = jnp.zeros(4).at[i].set(eps)
        fd = (float(obj(u0 + e)) - float(obj(u0 - e))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd, rtol=1e-5,
                                   atol=1e-8)


def test_large_grid_exact_nlml_is_cheap():
    """N = 96×96 = 9,216 exact NLML: dense needs ~2.6·10¹¹ FLOPs of
    Cholesky; the Kronecker path is two 96³ eigensolves + O(N) — must
    run in well under a second even on the CPU test host."""
    rng = np.random.default_rng(4)
    ax = jnp.asarray(np.linspace(0, 4, 96))
    X1, X2 = np.meshgrid(np.asarray(ax), np.asarray(ax), indexing="ij")
    y = jnp.asarray(
        np.sin(2 * X1) * np.cos(X2) + 0.05 * rng.normal(size=X1.shape)
    )
    kern = gp.Separable("rbf")
    pf = jnp.asarray([1.0, 1.0, 1.0, 0.2])
    f = jax.jit(lambda p: kronecker.nlml_kron(kern, p, [ax, ax], y))
    float(f(pf))  # compile
    t0 = time.perf_counter()
    v = float(f(pf))
    dt = time.perf_counter() - t0
    assert np.isfinite(v)
    assert dt < 1.0, dt


def test_fit_and_wrapper_end_to_end():
    rng = np.random.default_rng(5)
    ax1 = jnp.asarray(np.linspace(0, 3, 24))
    ax2 = jnp.asarray(np.linspace(0, 3, 20))
    X1, X2 = np.meshgrid(np.asarray(ax1), np.asarray(ax2),
                         indexing="ij")
    f_true = np.sin(2 * X1) * np.cos(2 * X2)
    y = jnp.asarray(f_true + 0.1 * rng.normal(size=X1.shape))

    model = kronecker.KroneckerGP([ax1, ax2], y, profile="rbf")
    res = model.train(max_iter=150)
    # fitted noise near the generating 0.1 (the quality gate — the
    # L-BFGS tol flag is allowed to time out on this plateaued NLML)
    assert 0.05 < float(res.params[-1]) < 0.2, float(res.params[-1])

    xq = jnp.asarray(rng.uniform(0.2, 2.8, (64, 2)))
    mean, var = model.predict(xq)
    truth = np.sin(2 * np.asarray(xq)[:, 0]) * np.cos(
        2 * np.asarray(xq)[:, 1]
    )
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - truth) ** 2)))
    assert rmse < 0.05, rmse
    assert np.all(np.asarray(var) > 0)
