"""Reference-API compatibility: every name from the reference's flat
namespace (``PyGPR/__init__.py:1-7``) imports and works."""

import jax.numpy as jnp
import numpy as np
import pytest

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


def test_gpr_base_subclassable(rng):
    """The reference GPR base (gpr.py:13-43) is a subclassable
    extension point: a user model overriding update/predict must get
    the base's state + dirty-flag contract, and Exact_GP must be a
    GPR subclass."""
    from pygpr_tpu.compat import GPR, Exact_GP

    assert issubclass(Exact_GP, GPR)
    assert GPR is not Exact_GP

    class MeanOnly(GPR):
        def update(self):
            self.mean_y = float(jnp.mean(self.y))
            self.need_upd = False

        def predict(self, xp, var="none"):
            if self.need_upd:
                self.update()
            return [jnp.full(xp.shape[0], self.mean_y), None]

    x = jnp.asarray(rng.uniform(size=(10, 2)))
    y = jnp.asarray(rng.normal(size=10))
    m = MeanOnly(x, y, Squared_exponential())
    assert m.need_upd and m.params is NotImplemented
    ys, _ = m.predict(x[:4])
    assert not m.need_upd
    np.testing.assert_allclose(np.asarray(ys), float(np.mean(np.asarray(y))))
    m.set_params(jnp.ones(3))     # replace + dirty (gpr.py:28-31)
    assert m.need_upd and m.params.shape == (3,)

    # abstract contract raises on the base
    base = GPR(x, y, Squared_exponential())
    for call in (base.update, lambda: base.predict(x),
                 lambda: base.predict_var(x), lambda: base.predict_covar(x)):
        with pytest.raises(NotImplementedError):
            call()


def test_exact_gp_predict_var_covar_methods(rng):
    """Exact_GP.predict_var / predict_covar (gpr.py:96-120)."""
    x = jnp.asarray(rng.uniform(size=(20, 2)))
    y = jnp.sin(x.sum(-1))
    gp = Exact_GP(x, y, Compose([Squared_exponential(), White_noise()]))
    xs = jnp.asarray(rng.uniform(size=(6, 2)))
    var = gp.predict_var(xs)
    covars = gp.predict_covar(xs)
    assert var.shape == (6,) and covars.shape == (6, 6)
    # the diag path applies the predictive-variance jitter floor
    # (exact_gp._predict_var_one, documented deviation in PARITY.md)
    np.testing.assert_allclose(
        np.asarray(var),
        np.maximum(np.diagonal(np.asarray(covars)), 1e-7),
        rtol=1e-6, atol=1e-9,
    )
