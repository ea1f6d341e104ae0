"""Exact-GP model tests, mirroring ``PyGPR/tests/test_gpr.py``
(interpolation oracle, posterior-covariance properties, batch-vs-loop)."""

from itertools import product

import jax.numpy as jnp
import numpy as np
import pytest

from pygpr_tpu import ExactGP, RBF, Sum, WhiteNoise, factorize, predict

DIMS = (2, 3, 7)
NS = (10, 50, 100)


def _data(rng, n, dim):
    x = jnp.asarray(rng.uniform(size=(n, dim)))
    y = jnp.sin(-x.sum(-1))
    return x, y


@pytest.mark.parametrize("n,dim", list(product(NS, DIMS)))
def test_interpolate(n, dim, rng):
    """Noiseless GP reproduces its training targets
    (``tests/test_gpr.py:18-32``, atol 1e-4)."""
    x, y = _data(rng, n, dim)
    gp = ExactGP(x, y, Sum((RBF(), WhiteNoise())))
    ys, var = gp.predict(x, var="diag")
    np.testing.assert_allclose(np.asarray(ys), np.asarray(y), atol=1e-4)
    assert var.shape == ys.shape
    assert np.all(np.asarray(var) < 1e6)


@pytest.mark.parametrize("n,dim", list(product(NS, DIMS)))
def test_pred_covar_symmetric_psd(n, dim, rng):
    """Posterior covariance is symmetric PSD (``tests/test_gpr.py:36-52``)."""
    x, y = _data(rng, n, dim)
    gp = ExactGP(x, y, Sum((RBF(), WhiteNoise())))
    ys, cov = gp.predict(x, var="full")
    cov = np.asarray(cov)
    tol = 1e-7
    np.testing.assert_allclose(cov, cov.T, atol=tol)
    eig = np.linalg.eigvalsh(cov)
    assert np.all(eig > -tol)


@pytest.mark.parametrize("nc,n,dim", list(product((2, 5), (10, 50), (2, 3))))
def test_interpolate_batch(nc, n, dim, rng):
    """Batched committees equal replicated single fits
    (``tests/test_gpr.py:60-76``)."""
    xl, yl = _data(rng, n, dim)
    x = jnp.broadcast_to(xl, (nc, n, dim))
    y = jnp.broadcast_to(yl, (nc, n))
    gp = ExactGP(x, y, Sum((RBF(), WhiteNoise())))
    ys, var = gp.predict(xl, var="diag")
    assert ys.shape == (nc, n)
    np.testing.assert_allclose(
        np.asarray(ys), np.broadcast_to(np.asarray(yl), (nc, n)), atol=1e-4
    )
    assert np.all(np.asarray(var) < 1e6)


def test_batched_equals_stacked_states(rng):
    """Sharding invariant: vmapped factorize/predict == per-expert calls."""
    nc, n, m, dim = 3, 40, 11, 2
    cov = Sum((RBF(), WhiteNoise()))
    xb = jnp.asarray(rng.uniform(size=(nc, n, dim)))
    yb = jnp.sin(xb.sum(-1))
    hp = jnp.asarray(1.0 + rng.uniform(size=(nc, cov.n_params(dim))))
    xp = jnp.asarray(rng.uniform(size=(m, dim)))

    state_b = factorize(cov, hp, xb, yb)
    mean_b, var_b = predict(cov, state_b, xp, var="diag")
    for i in range(nc):
        s = factorize(cov, hp[i], xb[i], yb[i])
        mi, vi = predict(cov, s, xp, var="diag")
        np.testing.assert_allclose(np.asarray(mean_b[i]), np.asarray(mi), atol=1e-10)
        np.testing.assert_allclose(np.asarray(var_b[i]), np.asarray(vi), atol=1e-10)


def test_full_covar_consistent_with_diag(rng):
    x, y = _data(rng, 30, 3)
    cov = Sum((RBF(), WhiteNoise()))
    gp = ExactGP(x, y, cov)
    xp = jnp.asarray(rng.uniform(size=(9, 3)))
    _, full = gp.predict(xp, var="full")
    _, diag = gp.predict(xp, var="diag")
    np.testing.assert_allclose(
        np.diag(np.asarray(full)), np.asarray(diag), atol=1e-9
    )


def test_var_none(rng):
    x, y = _data(rng, 20, 2)
    gp = ExactGP(x, y, Sum((RBF(), WhiteNoise())))
    ys, cov = gp.predict(x, var="none")
    assert cov is None
    np.testing.assert_allclose(np.asarray(ys), np.asarray(y), atol=1e-4)


def test_jitter_ladder_rescues_singular_kernel(rng):
    """Duplicate training points make K exactly singular; the ladder
    (SURVEY.md §5.3) must still produce a finite factorization."""
    x1 = jnp.asarray(rng.uniform(size=(10, 2)))
    x = jnp.concatenate([x1, x1], axis=0)  # rank-deficient RBF gram
    y = jnp.sin(x.sum(-1))
    cov = RBF()  # no noise term => genuinely near-singular
    state = factorize(cov, cov.init_params(x), x, y)
    assert bool(state.ok)
    assert np.all(np.isfinite(np.asarray(state.chol)))
    mean, var = predict(cov, state, x1, var="diag")
    assert np.all(np.isfinite(np.asarray(mean)))


def test_batched_jitter_ladder_per_matrix(rng):
    """One sick matrix in an explicitly batched stack must not inflate
    the healthy matrices' jitter: the ladder state is per matrix, so the
    batch-visible (use_pallas committee) path bit-matches the vmapped
    path on healthy experts."""
    import jax

    from pygpr_tpu.config import Config
    from pygpr_tpu.ops.linalg import safe_cholesky

    cfg = Config()
    n = 16
    healthy = np.stack(
        [np.eye(n) + 0.1 * np.ones((n, n)) for _ in range(3)]
    )
    sick = np.eye(n)
    sick[0, 0] = -5e-7  # fails at base jitter 1e-7, passes at 1e-5
    K = jnp.asarray(np.concatenate([healthy, sick[None]], axis=0))

    res = safe_cholesky(K, cfg)  # batch-visible [4, n, n] call
    assert res.jitter.shape == (4,)
    assert res.ok.shape == (4,)
    assert np.asarray(res.ok).all()
    # healthy matrices stay on the base rung; the sick one escalated
    np.testing.assert_allclose(np.asarray(res.jitter[:3]), cfg.jitter)
    assert float(res.jitter[3]) > cfg.jitter * 1.5

    # bit-match against the vmapped (per-matrix) path on healthy experts
    res_v = jax.vmap(lambda k: safe_cholesky(k, cfg))(K)
    np.testing.assert_array_equal(
        np.asarray(res.chol[:3]), np.asarray(res_v.chol[:3])
    )
    np.testing.assert_array_equal(
        np.asarray(res.jitter), np.asarray(res_v.jitter)
    )


def test_precompute_tinv_predict_parity(rng):
    """Serving state (T = L⁻¹ GEMM path) matches the solve path."""
    from pygpr_tpu import precompute_tinv

    x, y = _data(rng, 100, 3)
    gp = ExactGP(x, y, Sum((RBF(), WhiteNoise())))
    gp.update()
    ys, var = predict(gp.cov, gp.state, x, var="diag")
    ysf, cov = predict(gp.cov, gp.state, x, var="full")
    st = precompute_tinv(gp.state)
    ys2, var2 = predict(gp.cov, st, x, var="diag")
    ys2f, cov2 = predict(gp.cov, st, x, var="full")
    np.testing.assert_allclose(np.asarray(ys2), np.asarray(ys), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(var2), np.asarray(var), rtol=1e-7, atol=1e-12)
    np.testing.assert_allclose(np.asarray(cov2), np.asarray(cov), rtol=1e-6, atol=1e-10)


def test_precompute_tinv_batched(rng):
    """Batched committee serving state matches per-expert solves."""
    from pygpr_tpu import precompute_tinv

    nc, n, dim = 3, 40, 2
    x = jnp.asarray(rng.uniform(size=(nc, n, dim)))
    y = jnp.sin(-x.sum(-1))
    cov = Sum((RBF(), WhiteNoise()))
    p = jnp.ones((cov.n_params(dim),))
    st = factorize(cov, p, x, y)
    ys, var = predict(cov, st, x, var="diag")
    st2 = precompute_tinv(st)
    ys2, var2 = predict(cov, st2, x, var="diag")
    np.testing.assert_allclose(np.asarray(ys2), np.asarray(ys), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(var2), np.asarray(var), rtol=1e-7, atol=1e-12)


def test_sample_predictive_moments(rng):
    """Posterior draws reproduce the predictive mean and covariance,
    and collapse onto the targets at noiseless training points."""
    from pygpr_tpu import sample_predictive

    x, y = _data(rng, 60, 2)
    gp = ExactGP(x, y, Sum((RBF(), WhiteNoise())))
    gp.update()
    xs = jnp.asarray(rng.uniform(size=(20, 2)))
    mean, covar = predict(gp.cov, gp.state, xs, var="full")

    import jax

    draws = sample_predictive(
        gp.cov, gp.state, xs, jax.random.PRNGKey(0), n_samples=4000
    )
    assert draws.shape == (4000, 20)
    emp_mean = jnp.mean(draws, axis=0)
    emp_cov = jnp.cov(np.asarray(draws).T)
    np.testing.assert_allclose(
        np.asarray(emp_mean), np.asarray(mean), atol=5e-2
    )
    np.testing.assert_allclose(
        emp_cov, np.asarray(covar), atol=5e-2
    )

    # draws at (noiseless) training inputs interpolate the targets
    d_train = sample_predictive(
        gp.cov, gp.state, x, jax.random.PRNGKey(1), n_samples=8
    )
    np.testing.assert_allclose(
        np.asarray(d_train),
        np.broadcast_to(np.asarray(gp.y), (8, x.shape[0])),
        atol=5e-2,
    )


def test_sample_predictive_batched(rng):
    """Committee state: [nc, n_samples, m] with independent per-expert
    randomness."""
    from pygpr_tpu import sample_predictive

    import jax

    nc, n, dim = 3, 30, 2
    x = jnp.asarray(rng.uniform(size=(nc, n, dim)))
    y = jnp.sin(-x.sum(-1))
    cov = Sum((RBF(), WhiteNoise()))
    p = jnp.ones((cov.n_params(dim),))
    st = factorize(cov, p, x, y)
    xs = jnp.asarray(rng.uniform(size=(10, dim)))
    d = sample_predictive(cov, st, xs, jax.random.PRNGKey(0), n_samples=5)
    assert d.shape == (nc, 5, 10)
    assert np.isfinite(np.asarray(d)).all()
    assert not np.allclose(np.asarray(d[0]), np.asarray(d[1]))


def test_precompute_tinv_ill_conditioned_f32(rng):
    """The serving inverse (explicit T = L⁻¹) does not amplify f32
    error relative to the triangular-solve path, even on a near-
    singular gram (long lengthscales, reference's hostile σn=1e-4
    init): both paths are bounded by the f32 gram-build error."""
    n = 256
    x = jnp.asarray(rng.uniform(0, 4, (n, 2)).astype(np.float32))
    y = jnp.sin(x.sum(-1))
    cov = Sum((RBF(), WhiteNoise()))
    p = np.ones(4, np.float32)
    p[1:3] = 3.0   # long inverse-lengthscales → ill-conditioned K
    p[-1] = 1e-4
    st = factorize(cov, jnp.asarray(p), x, y)
    xs = jnp.asarray(rng.uniform(0, 4, (64, 2)).astype(np.float32))
    m1, v1 = predict(cov, st, xs, var="diag")

    from pygpr_tpu import precompute_tinv

    st2 = precompute_tinv(st)
    m2, v2 = predict(cov, st2, xs, var="diag")

    # f64 ground truth through the same code path
    st64 = factorize(
        cov,
        jnp.asarray(p.astype(np.float64)),
        jnp.asarray(np.asarray(x, np.float64)),
        jnp.asarray(np.asarray(y, np.float64)),
    )
    _, v0 = predict(
        cov, st64, jnp.asarray(np.asarray(xs, np.float64)), var="diag"
    )
    err_solve = float(jnp.max(jnp.abs(v1 - v0.astype(jnp.float32))))
    err_tinv = float(jnp.max(jnp.abs(v2 - v0.astype(jnp.float32))))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    assert err_tinv <= 2.0 * err_solve + 1e-6, (err_tinv, err_solve)
