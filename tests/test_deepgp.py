"""Deep GP (doubly stochastic variational) tests.

The oracle: depth 1 is an ordinary whitened SVGP, so the deep bound
must equal ``svgp.neg_elbo`` exactly — the deep model degenerates to
the shallow one it generalizes.  Depth 2 must then beat the shallow
model on a step function (the canonical non-stationary target a
stationary single-layer kernel oversmooths).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pygpr_tpu import RBF
from pygpr_tpu.models import deepgp, obs, svgp
from pygpr_tpu.models.deepgp import DGPParams, LayerParams


def _data_step(rng, n=256):
    x = np.sort(rng.uniform(0, 4, (n, 1)), axis=0)
    f = np.where(x[:, 0] < 2.0, -1.0, 1.0)
    y = f + 0.05 * rng.normal(size=n)
    return jnp.asarray(x), jnp.asarray(y), f


def test_depth1_equals_svgp(rng):
    """No hidden layers ⇒ the doubly stochastic bound is sample-free
    and must equal the whitened SVGP bound to round-off."""
    n, m, d = 40, 9, 2
    x = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.asarray(rng.normal(size=n))
    z = x[:m]
    kern = RBF()
    lik = obs.GaussianLik()
    vp = svgp.init_variational(kern, lik, x, z)
    # random (valid) variational state
    vp = vp._replace(
        m_w=jnp.asarray(rng.normal(size=m)),
        ls_raw=jnp.asarray(rng.normal(size=(m, m)) * 0.2),
        log_theta=jnp.asarray(rng.normal(size=d + 1) * 0.1),
    )
    dp = DGPParams(
        layers=(
            LayerParams(
                log_theta=vp.log_theta,
                z=vp.z,
                m_w=vp.m_w[None],
                ls_raw=vp.ls_raw[None],
            ),
        ),
        lik=vp.lik,
    )
    eps = jnp.zeros((1, 1, n), x.dtype)
    a = float(svgp.neg_elbo(kern, lik, vp, x, y, scale=1.7))
    b = float(
        deepgp.neg_elbo((kern,), lik, dp, (), x, y, eps, scale=1.7)
    )
    np.testing.assert_allclose(b, a, rtol=1e-12)


def test_kl_zero_at_prior(rng):
    m, w = 7, 3
    lp = LayerParams(
        log_theta=jnp.zeros(2),
        z=jnp.asarray(rng.uniform(size=(m, 1))),
        m_w=jnp.zeros((w, m)),
        ls_raw=jnp.zeros((w, m, m)),
    )
    assert float(deepgp._kl_layer(lp)) == pytest.approx(0.0, abs=1e-12)
    # and strictly positive away from it
    lp2 = lp._replace(m_w=jnp.ones((w, m)))
    assert float(deepgp._kl_layer(lp2)) > 0.1


def test_skip_mean_identity():
    means = deepgp.skip_means((2, 3), d_in=2)
    np.testing.assert_allclose(means[0], np.eye(2))
    assert means[1].shape == (2, 3)
    # every column is a coordinate selector (norm-1)
    np.testing.assert_allclose(np.abs(means[1]).sum(0), np.ones(3))


def test_propagate_deterministic_with_zero_noise(rng):
    """With ε = 0 and near-deterministic hidden init, the two-layer
    forward equals the one-layer forward on the skip-mean-mapped
    inputs (the hidden layer starts as the identity map)."""
    n, m = 30, 10
    x = jnp.asarray(rng.uniform(size=(n, 1)))
    y = jnp.asarray(rng.normal(size=n))
    kerns = (RBF(), RBF())
    lik = obs.GaussianLik()
    dp = deepgp.init_deep(kerns, lik, x, widths=(1,), m=m, seed=0)
    means = deepgp.skip_means((1,), 1, np.float64)
    eps = jnp.zeros((1, n))
    mu2, var2 = deepgp.propagate(kerns, dp, means, x, eps)
    assert mu2.shape == (n,) and var2.shape == (n,)
    assert np.isfinite(np.asarray(mu2)).all()
    # hidden layer ≈ identity at init (zero mean posterior + skip):
    # the final layer sees ≈ x, so its marginals match a depth-1 pass
    dp1 = DGPParams(layers=(dp.layers[1],), lik=dp.lik)
    mu1, var1 = deepgp.propagate((kerns[1],), dp1, (), x, eps)
    np.testing.assert_allclose(
        np.asarray(mu2), np.asarray(mu1), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(var2), np.asarray(var1), rtol=1e-4, atol=1e-6
    )


def test_deepgp_beats_shallow_on_step(rng):
    """The canonical deep-GP win: a step function. The stationary
    single-layer SVGP oversmooths the discontinuity; the 2-layer deep
    GP warps the input and tracks it."""
    x, y, _ = _data_step(rng)
    xq = jnp.asarray(np.linspace(0.1, 3.9, 101)[:, None])
    fq = np.where(np.asarray(xq)[:, 0] < 2.0, -1.0, 1.0)

    model = deepgp.DeepGP(x, y, widths=(1,), m=24)
    model.train(n_steps=600, learning_rate=0.03, seed=0)
    mean, var = model.predict(xq, n_samples=24)
    rmse_deep = float(np.sqrt(np.mean((np.asarray(mean) - fq) ** 2)))
    assert np.isfinite(np.asarray(var)).all() and (np.asarray(var) >= 0).all()

    # shallow baseline: same inducing budget, same optimizer budget
    z0 = np.asarray(x)[
        np.random.default_rng(0).choice(x.shape[0], 24, replace=False)
    ]
    res = svgp.fit(
        RBF(), obs.GaussianLik(), x, y, z0,
        n_steps=600, learning_rate=0.03,
    )
    mean_s, _ = svgp.predict(RBF(), obs.GaussianLik(), res.params, xq)
    rmse_shallow = float(
        np.sqrt(np.mean((np.asarray(mean_s) - fq) ** 2))
    )
    assert rmse_deep < 0.2, rmse_deep
    assert rmse_deep < rmse_shallow, (rmse_deep, rmse_shallow)
    # the training loss must actually have decreased
    losses = np.asarray(model.losses)
    assert losses[-1] < losses[0]


def test_deepgp_classification(rng):
    """2-layer Bernoulli deep GP separates a nonlinear boundary."""
    n = 200
    x = rng.uniform(-1, 1, (n, 2))
    ylab = (np.sin(3 * x[:, 0]) > x[:, 1]).astype(float)
    model = deepgp.DeepGP(
        jnp.asarray(x), jnp.asarray(ylab), widths=(2,),
        lik=obs.BernoulliLogit(), m=24,
    )
    model.train(n_steps=400, learning_rate=0.05, seed=1)
    p, _ = model.predict(jnp.asarray(x), n_samples=16)
    acc = float(np.mean((np.asarray(p) > 0.5) == (ylab > 0.5)))
    assert acc > 0.9, acc
