"""Random-Fourier-feature + pathwise-conditioning tests: Monte-Carlo
gram convergence to the exact stationary kernels (both parameterized
per this package's inverse-lengthscale convention), Woodbury NLML
consistency, weight-space posterior correctness, and Matheron-update
posterior draws matching the exact GP's moments."""

import jax
import jax.numpy as jnp
import numpy as np

import pygpr_tpu as gp
from pygpr_tpu.models import exact_gp, likelihood, rff


def _data(n=80, d=2, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(0, 3, (n, d)))
    y = jnp.asarray(
        np.sin(2 * np.asarray(x).sum(-1)) + 0.1 * rng.normal(size=n)
    )
    return x, y


def test_gram_converges_to_rbf():
    x, _ = _data()
    params = jnp.asarray([1.0, 1.2, 0.8])
    k_exact = np.asarray(gp.RBF().matrix(params, x))

    def err(m):
        basis = rff.make_basis(m, 2, seed=1, dtype=np.float64)
        return np.abs(
            np.asarray(rff.gram(basis, params, x)) - k_exact
        ).max()

    e_small, e_big = err(256), err(8192)
    assert e_big < 0.05, e_big
    assert e_big < e_small  # O(m^{-1/2}) Monte-Carlo rate


def test_gram_converges_to_matern():
    """The multivariate-t spectral draws must reproduce the Matérn
    family in ops/kernels.py's √(2ν)·r convention."""
    x, _ = _data(n=50)
    params = jnp.asarray([1.0, 1.2, 0.8])
    for nu in (0.5, 1.5, 2.5):
        basis = rff.make_basis(
            20000, 2, profile="matern", nu=nu, seed=2, dtype=np.float64
        )
        k_a = np.asarray(rff.gram(basis, params, x))
        k_e = np.asarray(gp.Matern(nu).matrix(params, x))
        assert np.abs(k_a - k_e).max() < 0.06, nu


def test_nlml_woodbury_matches_dense_feature_model():
    """The O(m³) Woodbury NLML must equal the dense O(n³) NLML of the
    same approximate kernel ΦΦᵀ + σₙ²I — an exact identity."""
    x, y = _data(n=60)
    basis = rff.make_basis(128, 2, seed=3, dtype=np.float64)
    pf = jnp.asarray([1.0, 1.2, 0.8, 0.2])
    v = float(rff.nlml_rff(basis, pf, x, y))

    phi = np.asarray(rff.feature_map(basis, pf[:-1], x))
    # effective noise = σₙ² + the ladder's base jitter carried by A
    K = phi @ phi.T + (0.04 + 1e-7) * np.eye(60)
    L = np.linalg.cholesky(K)
    w = np.linalg.solve(K, np.asarray(y))
    v_dense = (
        0.5 * float(np.asarray(y) @ w)
        + np.sum(np.log(np.diag(L)))
        + 0.5 * 60 * np.log(2 * np.pi)
    )
    np.testing.assert_allclose(v, v_dense, rtol=1e-10)


def test_nlml_close_to_exact_at_large_m_and_fd_grads():
    x, y = _data()
    basis = rff.make_basis(8192, 2, seed=1, dtype=np.float64)
    pf = jnp.asarray([1.0, 1.2, 0.8, 0.2])
    v_rff = float(rff.nlml_rff(basis, pf, x, y))
    v_ex = float(
        likelihood.nlml(gp.Sum((gp.RBF(), gp.WhiteNoise())), pf, x, y)
    )
    assert abs(v_rff - v_ex) < 1.0, (v_rff, v_ex)

    small = rff.make_basis(256, 2, seed=4, dtype=np.float64)

    def obj(u):
        return rff.nlml_rff(small, jnp.exp(u), x, y)

    u0 = jnp.log(pf)
    g = jax.grad(obj)(u0)
    eps = 1e-6
    for i in range(4):
        e = jnp.zeros(4).at[i].set(eps)
        fd = (float(obj(u0 + e)) - float(obj(u0 - e))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd, rtol=1e-4, atol=1e-7)


def test_predict_matches_exact_gp_at_large_m():
    x, y = _data()
    basis = rff.make_basis(8192, 2, seed=1, dtype=np.float64)
    pf = jnp.asarray([1.0, 1.2, 0.8, 0.2])
    st = rff.factorize_rff(basis, pf, x, y)
    assert bool(st.ok)
    xs = jnp.asarray(np.random.default_rng(5).uniform(0, 3, (16, 2)))
    m_r, v_r = rff.predict_rff(basis, st, xs, "diag")

    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    se = exact_gp.factorize(cov, pf, x, y)
    m_e, v_e = exact_gp.predict(cov, se, xs, "diag")
    np.testing.assert_allclose(
        np.asarray(m_r), np.asarray(m_e), atol=0.05
    )
    # exact-GP diag includes the σₙ² = 0.04 noise block
    np.testing.assert_allclose(
        np.asarray(v_r), np.asarray(v_e) - 0.04, atol=0.01
    )
    # full covariance consistent with diag
    _, c_full = rff.predict_rff(basis, st, xs, "full")
    np.testing.assert_allclose(
        np.diag(np.asarray(c_full)), np.asarray(v_r), rtol=1e-10
    )


def test_weight_space_posterior_sampling():
    """Empirical covariance of θ draws must match σₙ²A⁻¹."""
    x, y = _data(n=40)
    basis = rff.make_basis(24, 2, seed=6, dtype=np.float64)
    pf = jnp.asarray([1.0, 1.0, 1.0, 0.3])
    st = rff.factorize_rff(basis, pf, x, y)
    rng = np.random.default_rng(7)
    z = jnp.asarray(rng.standard_normal((40000, 24)))
    thetas = np.asarray(rff.sample_weights(st, z))
    np.testing.assert_allclose(
        thetas.mean(0), np.asarray(st.theta_hat), atol=0.01
    )
    la = np.asarray(st.chol_a)
    cov_true = 0.09 * np.linalg.inv(la @ la.T)
    emp = np.cov(thetas.T)
    # MC error of a variance estimate at S=40k draws on entries up to
    # ~0.84 is ~0.006 (1σ) — 0.03 is a 5σ gate
    np.testing.assert_allclose(emp, cov_true, atol=0.03)


def test_pathwise_draws_match_exact_posterior():
    """Matheron-update function draws are samples from the exact GP
    posterior (up to the RFF prior approximation): their pointwise
    moments and cross-covariance must match the closed form."""
    x, y = _data()
    basis = rff.make_basis(8192, 2, seed=1, dtype=np.float64)
    pf = jnp.asarray([1.0, 1.2, 0.8, 0.2])
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    se = exact_gp.factorize(cov, pf, x, y)
    xs = jnp.asarray(np.random.default_rng(8).uniform(0, 3, (12, 2)))

    noise = rff.make_path_noise(
        4000, 8192, 80, seed=3, dtype=np.float64
    )
    draws = np.asarray(
        rff.pathwise_draws(gp.RBF(), se, basis, noise, xs)
    )
    assert draws.shape == (4000, 12)

    m_e, c_e = exact_gp.predict(cov, se, xs, "full")
    m_e, c_e = np.asarray(m_e), np.asarray(c_e)
    # latent covariance: subtract the noise block the Sum kernel put on
    # the query diagonal
    c_lat = c_e - 0.04 * np.eye(12)
    np.testing.assert_allclose(draws.mean(0), m_e, atol=0.03)
    np.testing.assert_allclose(np.cov(draws.T), c_lat, atol=0.012)


def test_fit_rff_end_to_end():
    x, y = _data(n=120, seed=9)
    basis = rff.make_basis(512, 2, seed=10, dtype=np.float64)
    p0 = jnp.asarray([1.0, 1.0, 1.0, 0.5])
    v0 = float(rff.nlml_rff(basis, p0, x, y))
    st, p_fit, v_fit = rff.fit_rff(basis, x, y, p0, max_iter=60)
    assert float(v_fit) < v0
    assert bool(st.ok)
    # recovered noise near the generating 0.1 (loose: RFF + MLE)
    assert 0.03 < float(p_fit[-1]) < 0.3
    m_r, _ = rff.predict_rff(basis, st, x, "none")
    rmse = float(
        np.sqrt(np.mean((np.asarray(m_r) - np.asarray(y)) ** 2))
    )
    assert rmse < 0.2, rmse
