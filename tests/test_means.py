"""Prior mean functions (``models/means.py``).

The reference is zero-mean everywhere (``PyGPR/gpr.py:70-74``,
``loss.py:49-51``); these tests pin the with-mean extension: exact
reduction to the zero-mean engine, FD gradients of the joint NLML,
offset/trend recovery, and the far-from-data reversion behavior that
motivates explicit means.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pygpr_tpu import RBF, Sum, WhiteNoise, nlml
from pygpr_tpu.models import means
from pygpr_tpu.models.means import (
    ConstantMean,
    LinearMean,
    ZeroMean,
    factorize_mean,
    fit_gp_mean,
    init_params_joint,
    nlml_mean,
    predict_mean,
)

COV = Sum((RBF(), WhiteNoise()))


def _data(rng, n=64, dim=2, offset=0.0, slope=None):
    x = jnp.asarray(rng.uniform(size=(n, dim)))
    y = jnp.sin(3.0 * x.sum(-1)) + offset
    if slope is not None:
        y = y + x @ jnp.asarray(slope, x.dtype)
    return x, y


def test_zero_mean_reduces_exactly(rng):
    """ZeroMean pipeline == plain zero-mean engine, bit-for-bit."""
    x, y = _data(rng)
    pk = COV.init_params(x)
    theta = jnp.concatenate([pk, jnp.zeros((0,), x.dtype)])
    v_mean = nlml_mean(COV, ZeroMean(), theta, x, y)
    v_plain = nlml(COV, pk, x, y)
    assert float(v_mean) == float(v_plain)

    state = factorize_mean(COV, ZeroMean(), theta, x, y)
    mu, var = predict_mean(COV, ZeroMean(), theta, state, x, "diag")
    from pygpr_tpu.models import exact_gp

    mu0, var0 = exact_gp.predict(
        COV, exact_gp.factorize(COV, pk, x, y), x, "diag"
    )
    np.testing.assert_array_equal(np.asarray(mu), np.asarray(mu0))
    np.testing.assert_array_equal(np.asarray(var), np.asarray(var0))


@pytest.mark.parametrize("mean_cls", [ConstantMean, LinearMean])
def test_nlml_mean_fd_gradient(mean_cls, rng):
    """FD vs AD gradient of the joint NLML over [θ_kernel, θ_mean]
    (reference FD oracle pattern, ``tests/test_loss.py:18-44``)."""
    x, y = _data(rng, n=40, offset=2.0)
    mean = mean_cls()
    theta = init_params_joint(COV, mean, x, y)
    # keep away from the all-ones saddle
    theta = theta.at[: COV.n_params(x.shape[-1])].mul(1.3)

    f = lambda t: nlml_mean(COV, mean, t, x, y)
    g = jax.grad(f)(theta)
    for j in range(theta.shape[0]):
        eps = 1e-6 * max(1.0, abs(float(theta[j])))
        tp = theta.at[j].add(eps)
        tm = theta.at[j].add(-eps)
        fd = (float(f(tp)) - float(f(tm))) / (2 * eps)
        # reference FD tolerance (tests/test_loss.py:44)
        np.testing.assert_allclose(float(g[j]), fd, rtol=1e-3, atol=1e-6)


def test_constant_mean_recovers_offset(rng):
    """Joint fit on y + 100 recovers the offset; far from the data the
    posterior reverts to the fitted constant, not to 0."""
    x, y = _data(rng, n=96, offset=100.0)
    mean = ConstantMean()
    res = fit_gp_mean(COV, mean, x, y, max_iter=150)
    theta = res.params
    c = float(theta[-1])
    assert abs(c - 100.0) < 1.5, c

    state = factorize_mean(COV, mean, theta, x, y)
    mu, _ = predict_mean(COV, mean, theta, state, x, "none")
    rmse = float(jnp.sqrt(jnp.mean((mu - y) ** 2)))
    assert rmse < 0.05, rmse

    far = 50.0 + jnp.asarray(np.random.default_rng(1).uniform(size=(8, 2)))
    mu_far, var_far = predict_mean(COV, mean, theta, state, far, "diag")
    np.testing.assert_allclose(np.asarray(mu_far), c, rtol=0.05)
    assert np.all(np.asarray(var_far) > 0)


def test_linear_mean_beats_zero_mean_extrapolation(rng):
    """Linear-trend data: extrapolation error with LinearMean is far
    below the zero-mean GP's (which decays to 0 off-support)."""
    # wide support ([0,3]²) makes the trend identifiable against the
    # stationary RBF: the sin wiggles average out over ~3 periods, so
    # the fitted slope can't be absorbed into a long lengthscale
    slope = jnp.asarray((4.0, -3.0))
    x = 3.0 * jnp.asarray(rng.uniform(size=(128, 2)))
    y = jnp.sin(3.0 * x.sum(-1)) + 5.0 + x @ slope
    mean = LinearMean()
    res = fit_gp_mean(COV, mean, x, y, max_iter=150)

    xq = 3.5 + jnp.asarray(
        np.random.default_rng(2).uniform(size=(32, 2))
    )
    yq = jnp.sin(3.0 * xq.sum(-1)) + 5.0 + xq @ slope

    state = factorize_mean(COV, mean, res.params, x, y)
    mu, _ = predict_mean(COV, mean, res.params, state, xq, "none")
    err_mean = float(jnp.sqrt(jnp.mean((mu - yq) ** 2)))

    from pygpr_tpu.models import exact_gp
    from pygpr_tpu.optimize import fit_mle

    res0 = fit_mle(COV, COV.init_params(x), x, y, max_iter=150)
    st0 = exact_gp.factorize(COV, res0.params, x, y)
    mu0, _ = exact_gp.predict(COV, st0, xq, "none")
    err_zero = float(jnp.sqrt(jnp.mean((mu0 - yq) ** 2)))

    # residual sin (amplitude 1, RMSE≈0.71) is unmodelable off-support,
    # so the floor is ~1; the zero-mean GP additionally loses the whole
    # trend (err ~8 here)
    assert err_mean < 1.6, err_mean
    assert err_mean < 0.2 * err_zero, (err_mean, err_zero)


def test_linear_mean_init_is_lstsq(rng):
    """LinearMean.init_params equals the normal-equations solution."""
    x, y = _data(rng, n=50, offset=-3.0, slope=(2.0, 1.0))
    p = LinearMean().init_params(x, y)
    a = np.concatenate([np.ones((x.shape[0], 1)), np.asarray(x)], axis=1)
    coef, *_ = np.linalg.lstsq(a, np.asarray(y), rcond=None)
    np.testing.assert_allclose(np.asarray(p), coef, rtol=1e-6)


def test_fit_gp_mean_jits(rng):
    """The whole joint fit is one XLA program."""
    x, y = _data(rng, n=32, offset=7.0)
    fit = jax.jit(
        lambda xx, yy: fit_gp_mean(
            COV, ConstantMean(), xx, yy, max_iter=60
        ).params
    )
    theta = fit(x, y)
    assert np.isfinite(np.asarray(theta)).all()


def test_means_shapes(rng):
    x = jnp.asarray(rng.uniform(size=(10, 3)))
    for m, npar in ((ZeroMean(), 0), (ConstantMean(), 1), (LinearMean(), 4)):
        assert m.n_params(3) == npar
        p = m.init_params(x)
        assert p.shape == (npar,)
        assert m(p, x).shape == (10,)
    assert means.n_params_joint(COV, LinearMean(), 3) == COV.n_params(3) + 4
