"""Fused Pallas gram-matvec tests (interpret mode on CPU — the
"sanitizer" for hand-written tiles, SURVEY.md §5.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import pygpr_tpu as gp
import pygpr_tpu.ops.pallas_matvec as pm
from pygpr_tpu.config import Config
from pygpr_tpu.models import iterative


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    orig = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pm.pl, "pallas_call", interp_call)


def _setup(rng, n, dim=2, k=3):
    x = jnp.asarray(rng.uniform(0, 2, size=(n, dim)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(n, k)), jnp.float32)
    theta = jnp.asarray([1.2, 0.8, 1.1], jnp.float32)[: dim + 1]
    return theta, x, v


def _dense(theta, x, v):
    return gp.RBF().matrix(theta, x) @ v


@pytest.mark.parametrize("n", (512, 300, 1030))
def test_fused_matvec_matches_dense(n, rng):
    """Fused matvec == dense K@v, including ragged n (row/col padding)."""
    theta, x, v = _setup(rng, n)
    out = pm.rbf_gram_matvec(theta, x, v)
    # rtol floor: both sides are f32 sums over n near-cancelling terms
    # accumulated in different tile orders (~1e-5 absolute noise)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_dense(theta, x, v)),
        rtol=1e-3, atol=1e-4,
    )


def test_fused_matvec_custom_vjp(rng):
    """Exact VJP in θ, x, AND v against the dense-path autodiff."""
    theta, x, v = _setup(rng, n=260)
    w = jnp.asarray(np.random.default_rng(1).normal(size=v.shape),
                    jnp.float32)

    loss_f = lambda t, z, u: jnp.sum(w * pm.rbf_gram_matvec(t, z, u))
    loss_r = lambda t, z, u: jnp.sum(w * (gp.RBF().matrix(t, z) @ u))

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(theta, x, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(theta, x, v)
    for a, b, name in zip(gf, gr, ("theta", "x", "v")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"cotangent mismatch: {name}",
        )


def test_gram_matvec_dispatch_equals_xla(rng):
    """Config(use_pallas=True) routes through the fused kernel and
    matches the blocked-XLA path, noise term included."""
    n = 300
    x = jnp.asarray(rng.uniform(0, 2, size=(n, 2)), jnp.float32)
    v = jnp.asarray(rng.normal(size=n), jnp.float32)
    params = jnp.asarray([1.1, 0.9, 1.2, 0.3], jnp.float32)

    ref = iterative.gram_matvec(gp.RBF(), params, x, v, block=64)
    got = iterative.gram_matvec(
        gp.RBF(), params, x, v, block=64, config=Config(use_pallas=True)
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_supported_matcher():
    assert pm.supported(gp.RBF(), jnp.zeros((4, 2), jnp.float32))
    assert not pm.supported(
        gp.Sum((gp.RBF(), gp.WhiteNoise())), jnp.zeros((4, 2), jnp.float32)
    )
    assert not pm.supported(gp.Matern(1.5), jnp.zeros((4, 2), jnp.float32))
    assert not pm.supported(gp.RBF(), jnp.zeros((4, 2), jnp.float64))
