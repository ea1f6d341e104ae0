"""NLML tests: finite-difference oracle (``PyGPR/tests/test_loss.py``),
AD-vs-analytic agreement, and batched consistency."""

from itertools import product

import jax.numpy as jnp
import numpy as np
import pytest

from pygpr_tpu import (
    MLE,
    ExactGP,
    RBF,
    Sum,
    WhiteNoise,
    nlml,
    nlml_and_grad_analytic,
    nlml_value_and_grad,
)

NS = (10, 100)
DIMS = (2, 3, 5)


def _setup(rng, n, dim):
    x = jnp.asarray(rng.uniform(size=(n, dim)))
    y = jnp.exp(-jnp.square(x).sum(-1))
    cov = Sum((RBF(), WhiteNoise()))
    return cov, x, y


@pytest.mark.parametrize("n,dim", list(product(NS, DIMS)))
def test_grad_finite_difference(n, dim, rng):
    """FD-vs-analytic ≤ 1e-3 (``tests/test_loss.py:18-44``, eps 1e-8)."""
    cov, x, y = _setup(rng, n, dim)
    params = jnp.asarray(rng.uniform(size=(cov.n_params(dim),)))
    _, grad = nlml_value_and_grad(cov, params, x, y)
    grad = np.asarray(grad)

    eps = 1e-8
    fd = np.zeros_like(grad)
    base = float(nlml(cov, params, x, y))
    for k in range(grad.shape[0]):
        p = np.asarray(params).copy()
        p[k] += eps
        fd[k] = (float(nlml(cov, jnp.asarray(p), x, y)) - base) / eps
    assert np.max(np.abs(grad - fd)) < 1e-3


@pytest.mark.parametrize("n,dim", list(product(NS, DIMS)))
def test_autodiff_matches_analytic(n, dim, rng):
    """AD through Cholesky == the reference closed form (loss.py:92-128)."""
    cov, x, y = _setup(rng, n, dim)
    params = jnp.asarray(0.3 + rng.uniform(size=(cov.n_params(dim),)))
    v_ad, g_ad = nlml_value_and_grad(cov, params, x, y)
    v_an, g_an = nlml_and_grad_analytic(cov, params, x, y)
    np.testing.assert_allclose(float(v_ad), float(v_an), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_ad), np.asarray(g_an), rtol=1e-7, atol=1e-9)


def test_batched_nlml_equals_stacked(rng):
    nc, n, dim = 4, 30, 2
    cov = Sum((RBF(), WhiteNoise()))
    xb = jnp.asarray(rng.uniform(size=(nc, n, dim)))
    yb = jnp.sin(xb.sum(-1))
    hp = jnp.asarray(0.5 + rng.uniform(size=(nc, cov.n_params(dim))))
    vb = nlml(cov, hp, xb, yb)
    vb2, gb = nlml_value_and_grad(cov, hp, xb, yb)
    assert vb.shape == (nc,)
    assert gb.shape == hp.shape
    np.testing.assert_allclose(np.asarray(vb), np.asarray(vb2), rtol=1e-12)
    for i in range(nc):
        vi = nlml(cov, hp[i], xb[i], yb[i])
        np.testing.assert_allclose(float(vb[i]), float(vi), rtol=1e-12)


def test_mle_wrapper_caches(rng):
    """MLE parity wrapper: numpy seam + loss/grad caches (loss.py:17-18)."""
    cov, x, y = _setup(rng, 20, 2)
    gp = ExactGP(x, y, cov)
    loss = MLE(gp)
    p = np.asarray(gp.params)
    v, g = loss.loss_and_grad(p)
    assert isinstance(v, float)
    assert g.shape == p.shape
    assert loss.loss_value is not None and loss.grad_value is not None
    v2 = loss.loss(p)
    np.testing.assert_allclose(v, v2, rtol=1e-12)
    g2 = loss.grad(p)
    np.testing.assert_allclose(g, g2, rtol=1e-12)

    loss_an = MLE(gp, analytic=True)
    v3, g3 = loss_an.loss_and_grad(p)
    np.testing.assert_allclose(v, v3, rtol=1e-10)
    np.testing.assert_allclose(g, g3, rtol=1e-6, atol=1e-9)


def test_batched_vg_pallas_path_equals_default(rng):
    """use_pallas batch-visible committee value+grad == vmapped default
    (on CPU the pallas kernels are inactive, but the restructured AD
    path must be exactly equivalent)."""
    from pygpr_tpu.config import Config

    nc, n, dim = 3, 30, 2
    cov = Sum((RBF(), WhiteNoise()))
    xb = jnp.asarray(rng.uniform(size=(nc, n, dim)))
    yb = jnp.sin(xb.sum(-1))
    hp = jnp.asarray(0.5 + rng.uniform(size=(nc, cov.n_params(dim))))
    v_ref, g_ref = nlml_value_and_grad(cov, hp, xb, yb)
    v_bat, g_bat = nlml_value_and_grad(
        cov, hp, xb, yb, Config(use_pallas=True)
    )
    np.testing.assert_allclose(np.asarray(v_bat), np.asarray(v_ref), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_bat), np.asarray(g_ref), rtol=1e-8)
