"""Heteroscedastic known-noise kernel (ops/fixed_noise.py).

Oracles: constant noise column == WhiteNoise closed form (gram, NLML,
predict), zero column == bare base kernel, fast/AD/analytic/FD gradient
agreement, batched == stacked, and the defining end-to-end property —
conditioning on the TRUE per-point noise beats a fitted homoscedastic
model on heteroscedastic data.
"""

import jax
import jax.numpy as jnp
import numpy as np

import pygpr_tpu as gp
from pygpr_tpu.models import exact_gp
from pygpr_tpu.models.likelihood import (
    nlml,
    nlml_and_grad_analytic,
    nlml_value_and_grad,
)
from pygpr_tpu.models.metrics import nlpd
from pygpr_tpu.ops.fixed_noise import FixedNoise, with_noise
from pygpr_tpu.optimize.lbfgs import fit_mle


def _data(rng, n=40, dim=2):
    x = rng.uniform(0, 3, (n, dim))
    y = np.sin(2 * x.sum(-1)) + 0.05 * rng.normal(size=n)
    return x, jnp.asarray(y)


def test_constant_column_equals_white_noise(rng):
    """FixedNoise with a constant s² column reproduces
    base + WhiteNoise(σₙ=s) exactly: gram, diag, NLML, and predict."""
    x, y = _data(rng)
    s2 = 0.07
    kern_h = FixedNoise(gp.RBF())
    kern_w = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    xa = jnp.asarray(with_noise(x, s2))
    p_base = jnp.asarray(np.r_[1.3, 0.8, 0.6])
    p_w = jnp.concatenate([p_base, jnp.asarray([np.sqrt(s2)])])

    np.testing.assert_allclose(
        np.asarray(kern_h.matrix(p_base, xa)),
        np.asarray(kern_w.matrix(p_w, jnp.asarray(x))),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(kern_h.diag(p_base, xa)),
        np.asarray(kern_w.diag(p_w, jnp.asarray(x))),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        float(nlml(kern_h, p_base, xa, y)),
        float(nlml(kern_w, p_w, jnp.asarray(x), y)),
        rtol=1e-10,
    )

    xq = rng.uniform(0, 3, (9, x.shape[1]))
    xqa = jnp.asarray(with_noise(xq, s2))
    st_h = exact_gp.factorize(kern_h, p_base, xa, y)
    st_w = exact_gp.factorize(kern_w, p_w, jnp.asarray(x), y)
    m_h, v_h = exact_gp.predict(kern_h, st_h, xqa, var="diag")
    m_w, v_w = exact_gp.predict(kern_w, st_w, jnp.asarray(xq), var="diag")
    np.testing.assert_allclose(np.asarray(m_h), np.asarray(m_w), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(v_h), np.asarray(v_w), rtol=1e-8)


def test_zero_column_equals_base(rng):
    """A zero noise column is the bare base kernel (cross block too)."""
    x, _ = _data(rng, n=17)
    xq = rng.uniform(0, 3, (6, x.shape[1]))
    kern = FixedNoise(gp.Matern(2.5))
    xa = jnp.asarray(with_noise(x, 0.0))
    xqa = jnp.asarray(with_noise(xq, 0.0))
    p = kern.init_params(xa)
    assert p.shape == gp.Matern(2.5).init_params(jnp.asarray(x)).shape
    base = gp.Matern(2.5)
    np.testing.assert_allclose(
        np.asarray(kern.matrix(p, xa)),
        np.asarray(base.matrix(p, jnp.asarray(x))),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(kern.matrix(p, xa, xqa)),
        np.asarray(base.matrix(p, jnp.asarray(x), jnp.asarray(xq))),
        rtol=1e-12,
    )


def test_gradient_paths_agree(rng):
    """fast == AD == analytic == finite differences (noise col fixed)."""
    x, y = _data(rng, n=24)
    s2 = rng.uniform(0.01, 0.2, size=x.shape[0])
    kern = FixedNoise(gp.RBF())
    xa = jnp.asarray(with_noise(x, s2))
    p = jnp.asarray(np.r_[1.1, 0.7, 0.9])

    import dataclasses
    cfg_fast = dataclasses.replace(gp.DEFAULT, grad_mode="fast")
    cfg_ad = dataclasses.replace(gp.DEFAULT, grad_mode="ad")
    v1, g1 = nlml_value_and_grad(kern, p, xa, y, cfg_fast)
    v2, g2 = nlml_value_and_grad(kern, p, xa, y, cfg_ad)
    v3, g3 = nlml_and_grad_analytic(kern, p, xa, y)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-10)
    np.testing.assert_allclose(float(v1), float(v3), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g3), rtol=1e-7)

    eps = 1e-6
    fd = np.array(
        [
            (
                float(nlml(kern, p.at[i].add(eps), xa, y))
                - float(nlml(kern, p.at[i].add(-eps), xa, y))
            )
            / (2 * eps)
            for i in range(p.shape[0])
        ]
    )
    np.testing.assert_allclose(np.asarray(g1), fd, rtol=1e-4, atol=1e-6)


def test_batched_equals_stacked(rng):
    """Committee axis: vmapped NLML over [nc,n,d+1] == per-expert."""
    nc, n = 3, 20
    kern = FixedNoise(gp.RBF())
    xs, ys = [], []
    for _ in range(nc):
        x, y = _data(rng, n=n, dim=1)
        s2 = rng.uniform(0.01, 0.1, size=n)
        xs.append(with_noise(x, s2))
        ys.append(np.asarray(y))
    xb = jnp.asarray(np.stack(xs))
    yb = jnp.asarray(np.stack(ys))
    p = jnp.asarray([1.0, 0.8])
    batched = np.asarray(nlml(kern, p, xb, yb))
    stacked = np.array(
        [float(nlml(kern, p, xb[i], yb[i])) for i in range(nc)]
    )
    np.testing.assert_allclose(batched, stacked, rtol=1e-12)


def test_known_noise_beats_homoscedastic(rng):
    """End-to-end: two noise regimes (σ=0.02 left, σ=0.6 right).
    An MLE fit conditioned on the true per-point variances yields
    better held-out NLPD than a fitted single-σₙ model, and tighter
    predictive variance in the clean region."""
    n = 120
    x = np.sort(rng.uniform(0, 4, n))[:, None]
    noise_sd = np.where(x[:, 0] < 2.0, 0.02, 0.6)
    y = jnp.asarray(
        np.sin(2 * x[:, 0]) + noise_sd * rng.normal(size=n)
    )

    # heteroscedastic, known variances
    kern_h = FixedNoise(gp.RBF())
    xa = jnp.asarray(with_noise(x, noise_sd**2))
    res_h = fit_mle(kern_h, kern_h.init_params(xa), xa, y)

    # homoscedastic, fitted σₙ
    kern_w = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    xj = jnp.asarray(x)
    p0 = kern_w.init_params(xj).at[-1].set(0.1)
    res_w = fit_mle(kern_w, p0, xj, y)

    xq = np.linspace(0.05, 3.95, 60)[:, None]
    fq = np.sin(2 * xq[:, 0])
    sq = np.where(xq[:, 0] < 2.0, 0.02, 0.6)
    yq = jnp.asarray(fq + sq * rng.normal(size=len(xq)))

    st_h = exact_gp.factorize(kern_h, res_h.params, xa, y)
    m_h, v_h = exact_gp.predict(
        kern_h, st_h, jnp.asarray(with_noise(xq, sq**2)), var="diag"
    )
    st_w = exact_gp.factorize(kern_w, res_w.params, xj, y)
    m_w, v_w = exact_gp.predict(kern_w, st_w, jnp.asarray(xq), var="diag")

    nlpd_h = float(nlpd(yq, m_h, v_h))
    nlpd_w = float(nlpd(yq, m_w, v_w))
    assert nlpd_h < nlpd_w, (nlpd_h, nlpd_w)

    # latent-f variance (zero query-noise column) is tighter in the
    # clean region than the homoscedastic model's, which is inflated
    # by the single σₙ fitted across both regimes.
    _, v_lat = exact_gp.predict(
        kern_h, st_h, jnp.asarray(with_noise(xq, 0.0)), var="diag"
    )
    clean = xq[:, 0] < 1.8
    assert float(jnp.mean(v_lat[clean])) < float(jnp.mean(v_w[clean]))
