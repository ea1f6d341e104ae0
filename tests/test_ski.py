"""SKI / KISS-GP (``models/ski.py``).

Structural invariants (interpolation exactness, Kronecker matvec vs
dense Kronecker product), approximation quality vs the dense gram
(including grid-refinement convergence), estimator agreement with the
dense NLML, and the end-to-end fit/predict path in 1-D and 2-D.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pygpr_tpu.models import iterative, ski
from pygpr_tpu.models.likelihood import nlml_value_and_grad as dense_vg
from pygpr_tpu.ops.kernels import RBF, Sum, WhiteNoise

KERN = RBF()


def _dense_gram(params, x):
    """(K + σₙ²+jitter I) for packed params [σ, ℓ…, σₙ]."""
    from pygpr_tpu.config import DEFAULT

    theta, sn = params[:-1], params[-1]
    k = KERN.matrix(theta, x)
    return k + (sn**2 + DEFAULT.jitter) * jnp.eye(x.shape[0], dtype=x.dtype)


def test_interp_reproduces_quadratics(rng):
    """Cubic convolution (a=−1/2) is exact on quadratics: W applied to
    grid samples of p(x) returns p at the points."""
    x = rng.uniform(0.3, 1.7, size=(200, 1))
    grid = ski.make_grid(x, 64)
    idx, wts = ski.interp_weights(x, grid)
    np.testing.assert_allclose(wts.sum(axis=(1, 2)), 1.0, atol=1e-12)

    g = grid.axis_points(0)
    for p in (lambda t: 2.0 + 0 * t,
              lambda t: 3.0 * t - 1.0,
              lambda t: t * t - 0.5 * t + 2.0):
        u = jnp.asarray(p(g))[:, None]
        got = ski.interp_matvec(
            jnp.asarray(idx), jnp.asarray(wts), grid.sizes, u
        )[:, 0]
        np.testing.assert_allclose(np.asarray(got), p(x[:, 0]),
                                   atol=1e-10)


def test_kron_matvec_matches_dense_kron(rng):
    """Per-axis GEMM contraction == materialized T₁⊗T₂ matvec."""
    g1, g2 = 5, 7
    t1 = jnp.asarray(rng.normal(size=(g1, g1)))
    t2 = jnp.asarray(rng.normal(size=(g2, g2)))
    u = jnp.asarray(rng.normal(size=(g1 * g2, 3)))
    got = ski.kron_matvec((t1, t2), (g1, g2), u)
    want = jnp.kron(t1, t2) @ u
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("dim,grid_size", [(1, 256), (2, 48)])
def test_ski_matvec_close_to_dense(dim, grid_size, rng):
    """(W K_grid Wᵀ + σₙ²I)v tracks the dense gram matvec."""
    n = 300
    x = jnp.asarray(rng.uniform(0.0, 2.0, size=(n, dim)))
    params = jnp.asarray([1.3] + [1.1] * dim + [0.3])
    grid = ski.make_grid(np.asarray(x), grid_size)
    v = jnp.asarray(rng.normal(size=(n, 2)))
    got = ski.ski_gram_matvec(KERN, params, x, grid, v)
    want = _dense_gram(params, x) @ v
    err = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert err < 2e-3, err


def test_ski_error_shrinks_with_grid(rng):
    """O(h³) interpolation: refining the grid must cut the gram-matvec
    error by ≳ the cubic factor."""
    n = 200
    x = jnp.asarray(rng.uniform(0.0, 2.0, size=(n, 1)))
    params = jnp.asarray([1.0, 1.5, 0.2])
    v = jnp.asarray(rng.normal(size=(n, 1)))
    want = _dense_gram(params, x) @ v

    def err(g):
        grid = ski.make_grid(np.asarray(x), g)
        got = ski.ski_gram_matvec(KERN, params, x, grid, v)
        return float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))

    e_coarse, e_fine = err(32), err(128)
    assert e_fine < e_coarse / 8.0, (e_coarse, e_fine)


def test_ski_nlml_close_to_dense(rng):
    """SKI value/grad ≈ dense-exact NLML value/grad (estimator noise +
    interpolation only)."""
    n = 256
    x = jnp.asarray(rng.uniform(0.0, 2.0, size=(n, 1)))
    y = jnp.sin(2.0 * x[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=n))
    params = jnp.asarray([1.0, 1.0, 0.4])
    grid = ski.make_grid(np.asarray(x), 256)
    probes = jnp.asarray(iterative.make_probes(n, 32, seed=1),
                         x.dtype)
    v_ski, g_ski = ski.nlml_value_and_grad(
        KERN, params, x, y, probes, grid,
        rank=48, num_lanczos=25, cg_tol=1e-9, max_cg=400,
    )
    cov = Sum((RBF(), WhiteNoise()))
    v_d, g_d = dense_vg(cov, params, x, y)
    assert abs(float(v_ski - v_d)) / abs(float(v_d)) < 0.02, (
        float(v_ski), float(v_d))
    np.testing.assert_allclose(np.asarray(g_ski), np.asarray(g_d),
                               rtol=0.15, atol=0.5)


def test_ski_fit_predict_1d(rng):
    """End-to-end: fit on n=1024 sin data through the structured
    operator, predict accurately with calibrated variance."""
    n = 1024
    x = np.sort(rng.uniform(0.0, 4.0, size=(n, 1)), axis=0)
    y = np.sin(2.0 * x[:, 0]) + 0.1 * rng.normal(size=n)
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    grid = ski.make_grid(x, 256)
    probes = jnp.asarray(iterative.make_probes(n, 16, seed=2), xj.dtype)
    p0 = jnp.asarray([1.0, 1.0, 1.0])
    params, trace = ski.fit(
        KERN, p0, xj, yj, probes, grid,
        iters=60, learning_rate=0.08, rank=48,
    )
    assert float(trace[-1]) < float(trace[0])
    assert float(params[-1]) < 0.5  # noise pulled toward 0.1

    xs = np.linspace(0.2, 3.8, 200)[:, None]
    mean, var = ski.predict(KERN, params, xj, yj, jnp.asarray(xs),
                            grid, rank=48)
    rmse = float(np.sqrt(np.mean(
        (np.asarray(mean) - np.sin(2.0 * xs[:, 0])) ** 2)))
    assert rmse < 0.06, rmse
    v = np.asarray(var)
    assert np.all(np.isfinite(v)) and np.all(v >= float(params[-1]) ** 2)


def test_ski_predict_matches_exact_gp(rng):
    """At a dense grid and tight CG the SKI posterior must sit on top
    of the dense exact-GP posterior."""
    from pygpr_tpu.models import exact_gp

    n = 200
    x = jnp.asarray(rng.uniform(0.0, 2.0, size=(n, 1)))
    y = jnp.sin(3.0 * x[:, 0]) + 0.05 * jnp.asarray(rng.normal(size=n))
    params = jnp.asarray([1.0, 1.2, 0.15])
    grid = ski.make_grid(np.asarray(x), 512)
    xs = jnp.asarray(np.linspace(0.1, 1.9, 64)[:, None])

    mean, var = ski.predict(KERN, params, x, y, xs, grid,
                            cg_tol=1e-11, max_cg=600, rank=64)

    cov = Sum((RBF(), WhiteNoise()))
    state = exact_gp.factorize(cov, params, x, y)
    m_ref, v_ref = exact_gp.predict(cov, state, xs, "diag")
    np.testing.assert_allclose(np.asarray(mean), np.asarray(m_ref),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(var), np.asarray(v_ref),
                               rtol=0.05, atol=1e-3)


def test_skigp_wrapper_2d(rng):
    """OO wrapper, 2-D grid (direct path at G=1600): train converges,
    predict is accurate."""
    n = 512
    x = rng.uniform(0.0, 2.0, size=(n, 2))
    y = np.sin(2.0 * x[:, 0]) * np.cos(x[:, 1]) + 0.1 * rng.normal(size=n)
    model = ski.SKIGP(x, y, grid_size=40, num_probes=8, rank=32, seed=3)
    assert model.direct
    trace = model.train(iters=40, learning_rate=0.1)
    assert np.isfinite(float(trace[-1]))
    xs = rng.uniform(0.2, 1.8, size=(100, 2))
    mean, var = model.predict(jnp.asarray(xs))
    truth = np.sin(2.0 * xs[:, 0]) * np.cos(xs[:, 1])
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - truth) ** 2)))
    assert rmse < 0.15, rmse
    assert np.all(np.isfinite(np.asarray(var)))


def test_skigp_krylov_fallback_1d(rng):
    """Above direct_max the wrapper still runs the Krylov path."""
    n = 256
    x = np.sort(rng.uniform(0.0, 4.0, size=(n, 1)), axis=0)
    y = np.sin(2.0 * x[:, 0]) + 0.1 * rng.normal(size=n)
    model = ski.SKIGP(x, y, grid_size=64, num_probes=8, rank=24,
                      seed=0, direct_max=32)
    assert not model.direct
    trace = model.train(iters=20, learning_rate=0.1, max_cg=80)
    assert float(trace[-1]) < float(trace[0])
    mean, var = model.predict(jnp.asarray(x[:50]))
    assert np.isfinite(np.asarray(mean)).all()
    assert np.isfinite(np.asarray(var)).all()


# ------------------------------------------------------- direct path


def test_direct_nlml_matches_dense_on_fine_grid(rng):
    """At a dense grid the SKI model ≈ the exact kernel, so the direct
    NLML (exact for the SKI model, no estimator noise) must sit on the
    dense NLML to interpolation accuracy."""
    from pygpr_tpu.models.likelihood import nlml as dense_nlml

    n = 300
    x = jnp.asarray(rng.uniform(0.0, 2.0, size=(n, 1)))
    y = jnp.sin(3.0 * x[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=n))
    params = jnp.asarray([1.1, 1.4, 0.3])
    grid = ski.make_grid(np.asarray(x), 512)
    stats = ski.compute_stats(x, y, grid)
    v = float(ski.nlml_direct(KERN, params, stats, grid))
    cov = Sum((RBF(), WhiteNoise()))
    v_d = float(dense_nlml(cov, params, x, y))
    assert abs(v - v_d) / abs(v_d) < 1e-3, (v, v_d)

    # gradient agrees too (autodiff through chol ladder + Woodbury)
    g = jax.grad(
        lambda p: ski.nlml_direct(KERN, p, stats, grid)
    )(params)
    from pygpr_tpu.models.likelihood import nlml_value_and_grad as dvg
    _, g_d = dvg(cov, params, x, y)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_d),
                               rtol=5e-2, atol=5e-2)


def test_direct_quadform_psd(rng):
    """PSD by construction: vᵀ(ΦΦᵀ)v ≥ 0 for random v even in the
    high-concentration regime (n/G large) where the factored-gram
    operator of the Krylov path goes indefinite."""
    n, g = 4096, 32
    x = jnp.asarray(rng.uniform(0.0, 2.0, size=(n, 1)), jnp.float32)
    grid = ski.make_grid(np.asarray(x), g)
    theta = jnp.asarray([1.5, 0.8], jnp.float32)
    from pygpr_tpu.config import DEFAULT
    from pygpr_tpu.models.ski import _grid_chol_factors

    Ls = _grid_chol_factors(theta, grid, jnp.float32, DEFAULT)
    idx_np, wts_np = ski.interp_weights(np.asarray(x), grid)
    idx = jnp.asarray(idx_np)
    wts = jnp.asarray(wts_np, jnp.float32)
    for seed in range(5):
        v = jnp.asarray(
            np.random.default_rng(seed).normal(size=(n, 1)), jnp.float32
        )
        u = ski.interp_t_matvec(idx, wts, grid.sizes, v, grid.total)
        bu = ski.kron_matvec([L.T for L in Ls], grid.sizes, u)
        q = float(jnp.sum(jnp.square(bu)))  # vᵀΦΦᵀv = ‖Bᵀ Wᵀv‖²
        assert q >= 0.0


def test_direct_fit_predict_matches_exact(rng):
    """fit_direct + predict_direct on a dense grid reproduce the dense
    exact-GP fit and posterior."""
    from pygpr_tpu.models import exact_gp
    from pygpr_tpu.optimize.lbfgs import fit_mle

    n = 256
    x = jnp.asarray(rng.uniform(0.0, 4.0, size=(n, 1)))
    y = jnp.sin(2.0 * x[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=n))
    grid = ski.make_grid(np.asarray(x), 256)
    res = ski.fit_direct(KERN, jnp.ones(3), x, y, grid)
    cov = Sum((RBF(), WhiteNoise()))
    mle = fit_mle(cov, jnp.ones(3), x, y)
    np.testing.assert_allclose(
        np.abs(np.asarray(res.params)[-1]),
        np.abs(np.asarray(mle.params)[-1]), rtol=5e-2,
    )

    xs = jnp.asarray(np.linspace(0.1, 3.9, 64)[:, None])
    mean, var = ski.predict_direct(KERN, res.params, x, y, xs, grid)
    state = exact_gp.factorize(cov, mle.params, x, y)
    m_ref, v_ref = exact_gp.predict(cov, state, xs, "diag")
    np.testing.assert_allclose(np.asarray(mean), np.asarray(m_ref),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(var), np.asarray(v_ref),
                               rtol=0.1, atol=5e-3)


def test_direct_nlml_n_independent_cost_shape(rng):
    """The per-eval inputs are the G-sized stats only — evaluating at
    10× the data costs the same compiled program.  (Checked
    structurally: stats shapes depend on G, not n.)"""
    for n in (100, 1000):
        x = rng.uniform(0.0, 2.0, size=(n, 1))
        y = np.sin(x[:, 0])
        grid = ski.make_grid(x, 64)
        stats = ski.compute_stats(x, jnp.asarray(y), grid)
        assert stats.z.shape == (grid.total, grid.total)
        assert stats.wty.shape == (grid.total,)
        assert stats.n == n
    v = ski.nlml_direct(
        KERN, jnp.asarray([1.0, 1.0, 0.3]), stats, grid)
    assert np.isfinite(float(v))


def test_ski_rejects_nonseparable():
    from pygpr_tpu.ops.kernels import Matern

    with pytest.raises(ValueError):
        ski.make_ski_matvec(Matern(1.5), np.zeros((10, 1)),
                            ski.make_grid(np.random.rand(10, 1), 32))


# --------------------------------------------------- separable kernels


def test_separable_kernel_properties(rng):
    """Separable('rbf') == RBF; Matérn profiles are PSD, symmetric,
    and match the explicit per-dimension product."""
    from pygpr_tpu.ops.kernels import Separable

    x = jnp.asarray(rng.uniform(size=(40, 3)))
    p = jnp.asarray([1.3, 0.8, 1.5, 0.6])
    np.testing.assert_allclose(
        np.asarray(Separable("rbf").matrix(p, x)),
        np.asarray(RBF().matrix(p, x)), rtol=1e-12,
    )
    for prof in ("exp", "matern32", "matern52"):
        k = Separable(prof).matrix(p, x)
        kn = np.asarray(k)
        np.testing.assert_allclose(kn, kn.T, atol=1e-12)
        ev = np.linalg.eigvalsh(kn + 1e-10 * np.eye(40))
        assert ev.min() > -1e-8, (prof, ev.min())
        # explicit product-of-1D check on one entry
        a, b = np.asarray(x)[3], np.asarray(x)[17]
        want = 1.3**2
        pr = {"exp": lambda r: np.exp(-r),
              "matern32": lambda r: (1 + np.sqrt(3) * r)
              * np.exp(-np.sqrt(3) * r),
              "matern52": lambda r: (1 + np.sqrt(5) * r + 5 * r * r / 3)
              * np.exp(-np.sqrt(5) * r)}[prof]
        for j, lsc in enumerate([0.8, 1.5, 0.6]):
            want *= pr(lsc * abs(a[j] - b[j]))
        np.testing.assert_allclose(kn[3, 17], want, rtol=1e-10)


def test_separable_fd_gradient(rng):
    """matrix_and_grad (jacfwd fallback) matches finite differences."""
    from pygpr_tpu.ops.kernels import Separable

    kern = Separable("matern52")
    x = jnp.asarray(rng.uniform(size=(12, 2)))
    p = jnp.asarray([1.1, 0.9, 1.3])
    _, dk = kern.matrix_and_grad(p, x)
    eps = 1e-6
    for i in range(3):
        dp = np.zeros(3)
        dp[i] = eps
        fd = (np.asarray(kern.matrix(p + dp, x))
              - np.asarray(kern.matrix(p - dp, x))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(dk[i]), fd,
                                   rtol=1e-4, atol=1e-6)


def test_ski_direct_with_separable_matern(rng):
    """The direct path under a separable Matérn-5/2: NLML matches the
    dense Separable NLML at a fine grid, and the fit recovers noise."""
    from pygpr_tpu.models.likelihood import nlml as dense_nlml
    from pygpr_tpu.ops.kernels import Separable

    kern = Separable("matern52")
    n = 300
    x = jnp.asarray(rng.uniform(0.0, 2.0, size=(n, 1)))
    y = jnp.sin(3.0 * x[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=n))
    grid = ski.make_grid(np.asarray(x), 1024)  # Matérn needs finer h
    stats = ski.compute_stats(x, y, grid)
    params = jnp.asarray([1.0, 1.2, 0.3])
    v = float(ski.nlml_direct(kern, params, stats, grid))
    cov = Sum((kern, WhiteNoise()))
    v_d = float(dense_nlml(cov, params, x, y))
    assert abs(v - v_d) / abs(v_d) < 2e-2, (v, v_d)

    res = ski.fit_direct(kern, jnp.ones(3), x, y, grid, stats=stats)
    assert np.isfinite(float(res.value))
    assert abs(abs(float(res.params[-1])) - 0.1) < 0.05

    xs = jnp.asarray(np.linspace(0.1, 1.9, 50)[:, None])
    mean, var = ski.predict_direct(kern, res.params, x, y, xs, grid,
                                   stats=stats)
    rmse = float(np.sqrt(np.mean(
        (np.asarray(mean) - np.sin(3.0 * np.asarray(xs)[:, 0])) ** 2)))
    assert rmse < 0.08, rmse
    assert np.isfinite(np.asarray(var)).all()


def test_direct_analytic_grad_matches_ad(rng):
    """The closed-form gradient (custom_vjp) == plain AD through the
    factorization chain, in f64 where AD is trustworthy."""
    n = 200
    for dim, gsz, prof in [(1, 64, None), (2, 16, None),
                           (1, 64, "matern52")]:
        from pygpr_tpu.ops.kernels import Separable

        kern = KERN if prof is None else Separable(prof)
        x = jnp.asarray(rng.uniform(0.0, 2.0, size=(n, dim)))
        y = jnp.sin(2.0 * x.sum(-1)) + 0.1 * jnp.asarray(
            rng.normal(size=n))
        grid = ski.make_grid(np.asarray(x), gsz)
        stats = ski.compute_stats(x, y, grid)
        params = jnp.asarray([1.2] + [0.9] * dim + [0.3])
        g_ana = jax.grad(lambda p: ski.nlml_direct(
            kern, p, stats, grid))(params)
        g_ad = jax.grad(lambda p: ski.nlml_direct(
            kern, p, stats, grid, analytic_grad=False))(params)
        # residual: the ladder jitter is a constant in the analytic
        # form but (weakly) differentiated by AD — agreement to ~1e-4
        np.testing.assert_allclose(
            np.asarray(g_ana), np.asarray(g_ad), rtol=5e-4, atol=1e-5,
        )
