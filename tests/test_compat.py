"""Reference-API compatibility: every name from the reference's flat
namespace (``PyGPR/__init__.py:1-7``) imports and works."""

import jax.numpy as jnp
import numpy as np

from pygpr_tpu.compat import (
    CG,
    GRBCM,
    MATERN1,
    MLE,
    SK_WRAP,
    UNIFORM,
    BFGS_Quad,
    CG_Quad,
    Compose,
    Covar,
    Exact_GP,
    Nelder_Mead,
    Squared_exponential,
    White_noise,
    cluster_samples,
    euclidean_dist,
    get_learn_rate,
    hessian,
    log_likelihood_batched,
    sample_gp,
)


def test_reference_style_session(rng):
    """A reference-style end-to-end session under the original names."""
    x = jnp.asarray(rng.uniform(size=(30, 2)))
    y = jnp.sin(-x.sum(-1))
    cov = Compose([Squared_exponential(), White_noise()])
    gp = Exact_GP(x, y, cov)
    ys, covar_s = gp.predict(x, var="diag")
    np.testing.assert_allclose(np.asarray(ys), np.asarray(y), atol=1e-4)

    assert isinstance(cov, Covar)
    loss = MLE(gp)
    v, g = loss.loss_and_grad(np.asarray(gp.params))
    assert np.isfinite(v) and np.isfinite(g).all()


def test_reference_style_grbcm(rng):
    xl = jnp.asarray(rng.uniform(size=(3, 30, 2)))
    yl = jnp.sin(xl.sum(-1))
    xg = jnp.asarray(rng.uniform(size=(30, 2)))
    yg = jnp.sin(xg.sum(-1))
    cov = Compose([Squared_exponential(), White_noise()])
    model = GRBCM(xl, yl, xg, yg, cov)
    xs = xl[0]
    ys, var = model.predict(xs, var="diag")
    np.testing.assert_allclose(
        np.asarray(ys), np.asarray(jnp.sin(xs.sum(-1))), atol=1e-4
    )
    v = log_likelihood_batched(cov, model.gpl.params, model.gpl.x, model.gpl.y)
    assert v.shape == (3,)


def test_reference_style_samplers():
    u = UNIFORM(seed=1)
    x = u.sample(20, jnp.zeros(2), jnp.ones(2))
    assert x.shape == (20, 2)
    m = MATERN1(seed=1)
    xc = m.sample(5, jnp.zeros(2), jnp.ones(2))
    assert xc.shape == (5, 2)
    d = euclidean_dist(x, xc)
    assert d.shape == (20, 5)
    part = cluster_samples(x, jnp.asarray(np.asarray(xc[:4])))
    assert part.shape == (4, 5, 2)
    f = sample_gp(x, Squared_exponential(), jnp.asarray([1.0, 1.0, 1.0]))
    assert f.shape == (20,)


def test_reference_kernel_method_api(rng):
    """cov.get_params_shape / cov.kernel / cov.kernel_and_grad instance
    methods (reference Covar protocol, covar.py:9-25)."""
    x = jnp.asarray(rng.uniform(size=(12, 3)))
    xb = jnp.asarray(rng.uniform(size=(4, 12, 3)))
    cov = Compose([Squared_exponential(), White_noise()])
    assert cov.get_params_shape(x) == [5]
    assert cov.get_params_shape(xb) == [4, 5]
    hp = jnp.asarray(rng.uniform(size=5))
    K = cov.kernel(hp, x)
    assert K.shape == (12, 12)
    Kx = cov.kernel(hp, x, jnp.asarray(rng.uniform(size=(7, 3))))
    assert Kx.shape == (7, 12)
    krn, dkrn = cov.kernel_and_grad(hp, x)
    assert krn.shape == (12, 12) and dkrn.shape == (5, 12, 12)
