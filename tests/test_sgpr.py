"""SGPR (Titsias collapsed bound) — mathematical oracles.

The reference has no sparse-GP model; these tests validate the new
family against the exact-GP implementation already proven against the
live reference (tests/test_reference_parity.py):

  1. −ELBO upper-bounds the exact NLML for any inducing set (the bound
     property), and is TIGHT when z = x.
  2. With z = x, the SGPR posterior equals the exact GP posterior.
  3. jax.grad of the bound matches finite differences (f64).
  4. End-to-end: L-BFGS fit with m ≪ n recovers a smooth function, and
     optimizing inducing locations tightens the bound.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pygpr_tpu as gp
from pygpr_tpu.models import exact_gp, sgpr
from pygpr_tpu.models.likelihood import nlml


def make_data(rng, n=200, dim=2, noise=0.1):
    x = rng.uniform(0.0, 3.0, (n, dim))
    y = np.sin(2.0 * x.sum(-1)) + noise * rng.normal(size=n)
    return jnp.asarray(x), jnp.asarray(y)


def full_cov():
    """The exact-GP kernel equivalent to signal RBF + likelihood σₙ."""
    return gp.Sum((gp.RBF(), gp.WhiteNoise()))


@pytest.mark.parametrize("m", [10, 50, 200])
def test_neg_elbo_upper_bounds_nlml(rng, m):
    x, y = make_data(rng)
    params = jnp.asarray(np.r_[rng.uniform(0.5, 2.0, 3), 0.3])
    z = jnp.asarray(sgpr.init_inducing(x, m, seed=1))
    bound = sgpr.neg_elbo(gp.RBF(), params, x, y, z)
    exact = nlml(full_cov(), params, x, y)
    assert bound + 1e-8 >= exact
    if m == x.shape[0] // 1 and m == 200:
        # z = a permutation of x ⇒ Q_ff = K_ff ⇒ tight.
        assert abs(bound - exact) < 1e-5 * abs(exact)


def test_tight_when_z_equals_x(rng):
    x, y = make_data(rng, n=120)
    params = jnp.asarray([1.2, 0.8, 1.1, 0.25])
    bound = sgpr.neg_elbo(gp.RBF(), params, x, y, x)
    exact = nlml(full_cov(), params, x, y)
    # residual = the 1e-7 Kuu jitter amplified by the gram's condition
    # number (measured 3.7e-5 at n=120) — the bound itself is tight.
    assert abs(bound - exact) < 2e-4 * max(1.0, abs(exact))


def test_predict_matches_exact_gp_when_z_equals_x(rng):
    x, y = make_data(rng, n=150)
    params = jnp.asarray([1.0, 0.9, 1.3, 0.2])
    xs = jnp.asarray(rng.uniform(0.0, 3.0, (40, 2)))

    st = sgpr.factorize(gp.RBF(), params, x, y, x)
    mean_s, var_s = sgpr.predict(gp.RBF(), st, xs, var="diag")
    mean_f, cov_f = sgpr.predict(gp.RBF(), st, xs, var="full")

    state = exact_gp.factorize(full_cov(), params, x, y)
    mean_e, var_e = exact_gp.predict(full_cov(), state, xs, var="diag")

    # atol floors reflect the 1e-7 Kuu jitter × gram conditioning
    np.testing.assert_allclose(mean_s, mean_e, atol=1e-4)
    np.testing.assert_allclose(var_s, var_e, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(mean_f, mean_s, atol=1e-12)
    # full-covariance diagonal consistent with the diag path
    np.testing.assert_allclose(
        jnp.diagonal(cov_f), var_s, rtol=1e-6, atol=1e-9
    )
    # symmetric PSD (reference test pattern, tests/test_gpr.py:80-100)
    np.testing.assert_allclose(cov_f, cov_f.T, atol=1e-10)
    assert np.linalg.eigvalsh(np.asarray(cov_f)).min() > -1e-8


def test_grad_matches_finite_differences(rng):
    x, y = make_data(rng, n=80, dim=1)
    z = jnp.asarray(sgpr.init_inducing(x, 12, seed=2))
    params = jnp.asarray([1.1, 0.7, 0.3])

    f = lambda p: sgpr.neg_elbo(gp.RBF(), p, x, y, z)
    g = jax.grad(f)(params)
    eps = 1e-6
    for j in range(params.shape[0]):
        e = jnp.zeros_like(params).at[j].set(eps)
        fd = (f(params + e) - f(params - e)) / (2 * eps)
        np.testing.assert_allclose(g[j], fd, rtol=1e-4, atol=1e-6)

    # gradient w.r.t. the inducing locations is also exact
    fz = lambda zz: sgpr.neg_elbo(gp.RBF(), params, x, y, zz)
    gz = jax.grad(fz)(z)
    e = jnp.zeros_like(z).at[3, 0].set(eps)
    fd = (fz(z + e) - fz(z - e)) / (2 * eps)
    np.testing.assert_allclose(gz[3, 0], fd, rtol=1e-4, atol=1e-6)


def test_fit_recovers_function_and_calibrates(rng):
    n, noise = 512, 0.1
    x = rng.uniform(0.0, 4.0, (n, 1))
    f_true = np.sin(2.0 * x[:, 0])
    y = f_true + noise * rng.normal(size=n)
    xs = np.linspace(0.2, 3.8, 200)[:, None]

    model = sgpr.SGPR(x, y, gp.RBF(), m=24, seed=0)
    before = float(model.neg_elbo())
    res = model.train(opt_inducing=True, max_iter=150)
    after = float(model.neg_elbo())
    assert after < before
    assert bool(res.converged) or int(res.iters) >= 100

    mean, var = model.predict(xs, var="diag")
    rmse = float(jnp.sqrt(jnp.mean((mean - jnp.sin(2.0 * xs[:, 0])) ** 2)))
    assert rmse < 0.05
    # fitted noise close to the truth; predictive var includes it
    sn = float(model.params[-1])
    assert 0.05 < abs(sn) < 0.2
    assert float(var.min()) > 0.5 * noise**2


def test_opt_inducing_tightens_bound(rng):
    x, y = make_data(rng, n=300, dim=1)
    p0 = sgpr.init_params(gp.RBF(), x)
    # deliberately bad inducing set: all clustered in a corner
    z0 = jnp.asarray(rng.uniform(0.0, 0.2, (8, 1)))
    res_fixed, _ = sgpr.fit(gp.RBF(), p0, x, y, z0, max_iter=120)
    res_opt, z_opt = sgpr.fit(
        gp.RBF(), p0, x, y, z0, opt_inducing=True, max_iter=120
    )
    assert float(res_opt.value) < float(res_fixed.value) - 1.0
    # optimized z spread out of the corner
    assert float(jnp.ptp(z_opt)) > 1.0


def test_rejects_whitenoise_kernel(rng):
    x, y = make_data(rng, n=30)
    with pytest.raises(ValueError):
        sgpr.SGPR(x, y, gp.Sum((gp.RBF(), gp.WhiteNoise())), m=5)
    with pytest.raises(ValueError):
        sgpr.fit(
            gp.WhiteNoise(),
            jnp.ones(2),
            x, y,
            jnp.asarray(sgpr.init_inducing(x, 5)),
        )


def test_state_is_m_sized(rng):
    """Serving story: the state carries nothing n-sized."""
    x, y = make_data(rng, n=250)
    params = jnp.asarray([1.0, 1.0, 1.0, 0.3])
    z = jnp.asarray(sgpr.init_inducing(x, 16, seed=3))
    st = sgpr.factorize(gp.RBF(), params, x, y, z)
    for leaf in jax.tree.leaves(st):
        assert all(s <= 16 + 2 for s in jnp.shape(leaf))
