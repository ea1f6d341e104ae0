"""sklearn interop + checkpoint/trace utility tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

import pygpr_tpu as gp
from pygpr_tpu.interop import SKWrap
from pygpr_tpu.utils import OptTrace, load_checkpoint, save_checkpoint


def test_skwrap_fit_predict(rng):
    x = rng.uniform(size=(40, 2))
    y = np.sin(x.sum(-1))
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    model = gp.ExactGP(jnp.asarray(x), jnp.asarray(y), cov)
    sk = SKWrap(model)
    sk.fit(x, y)
    yp = sk.predict(x)
    np.testing.assert_allclose(yp, y, atol=1e-4)
    mean, std = sk.predict(x, return_std=True)
    assert std.shape == mean.shape
    assert np.all(std >= 0)


def test_skwrap_refit_not_stale(rng):
    """The reference bug (scikit_model.py:33): refit must invalidate the
    cached Cholesky."""
    x1 = rng.uniform(size=(20, 2))
    y1 = np.sin(x1.sum(-1))
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    model = gp.ExactGP(jnp.asarray(x1), jnp.asarray(y1), cov)
    sk = SKWrap(model)
    sk.fit(x1, y1)
    sk.predict(x1)
    x2 = rng.uniform(size=(25, 2)) + 5.0
    y2 = np.cos(x2.sum(-1))
    sk.fit(x2, y2)
    yp = sk.predict(x2)  # stale n=20 Cholesky would shape-error / misfit
    np.testing.assert_allclose(yp, y2, atol=1e-4)


def test_skwrap_optimize(rng):
    x = rng.uniform(size=(30, 1))
    y = np.sin(4 * x[:, 0]) + 0.05 * rng.normal(size=30)
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    model = gp.ExactGP(jnp.asarray(x), jnp.asarray(y), cov)
    p0 = np.asarray(model.params).copy()
    SKWrap(model, optimize=True, max_iter=50).fit(x, y)
    assert not np.allclose(np.asarray(model.params), p0)


def test_skwrap_wraps_sgpr_and_iterative(rng):
    """Beyond-reference models satisfy the same sklearn facade."""
    from pygpr_tpu.models import IterativeGP, SGPR

    n = 300
    x = rng.uniform(0, 4, size=(n, 1))
    y = np.sin(2 * x[:, 0]) + 0.1 * rng.normal(size=n)

    for model in (
        SGPR(x, y, gp.RBF(), m=24),
        IterativeGP(x, y, gp.RBF(), num_probes=8, rank=32, block=64),
    ):
        sk = SKWrap(model, optimize=True, max_iter=60)
        sk.fit(x, y)
        mean, std = sk.predict(x[:50], return_std=True)
        rmse = float(np.sqrt(np.mean((mean - np.sin(2 * x[:50, 0])) ** 2)))
        assert rmse < 0.1, type(model).__name__
        assert np.all(std > 0)
        # sklearn scoring protocol (RegressorMixin.score = R²)
        assert sk.score(x[:50], y[:50]) > 0.8


def test_checkpoint_roundtrip(tmp_path, rng):
    tree = {
        "params": jnp.asarray(rng.normal(size=(3,))),
        "opt": (jnp.zeros(2), jnp.ones((2, 2))),
        "key": jax.random.PRNGKey(7),
    }
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(p, tree, meta={"step": 12})
    like = jax.tree.map(jnp.zeros_like, tree)
    restored, meta = load_checkpoint(p, like)
    assert meta == {"step": 12}
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_serving_state_roundtrip(tmp_path, rng):
    """A fitted serving state (GPState with T=L⁻¹ attached) persists
    and restores to identical predictions — the deploy/reload path."""
    import pygpr_tpu as gp
    from pygpr_tpu.models import exact_gp

    x = jnp.asarray(rng.uniform(0, 4, (32, 2)))
    y = jnp.sin(x.sum(-1))
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    p = jnp.asarray([1.0, 0.8, 0.8, 0.3])
    state = exact_gp.precompute_tinv(
        exact_gp.factorize(cov, p, x, y)
    )
    path = str(tmp_path / "serving.npz")
    save_checkpoint(path, state, meta={"model": "exact_gp"})
    like = jax.tree.map(jnp.zeros_like, state)
    restored, meta = load_checkpoint(path, like)
    assert meta == {"model": "exact_gp"}
    xs = jnp.asarray(rng.uniform(0, 4, (8, 2)))
    m0, v0 = exact_gp.predict(cov, state, xs, "diag")
    m1, v1 = exact_gp.predict(cov, restored, xs, "diag")
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), rtol=0)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=0)


def test_opt_trace_formats(tmp_path):
    dat = str(tmp_path / "opt.dat")
    jsl = str(tmp_path / "opt.jsonl")
    with OptTrace(dat, jsl) as tr:
        tr.log(np.asarray([1.0, 2.0]), loss=3.5, grad_norm=0.1, extra=7)
        tr.log(np.asarray([1.1, 2.1]), loss=3.0, grad_norm=0.05)
    lines = open(dat).read().strip().splitlines()
    assert len(lines) == 2
    assert lines[0].split()[:2] == ["1.0", "2.0"]
    import json

    recs = [json.loads(l) for l in open(jsl)]
    assert recs[0]["loss"] == 3.5
    assert recs[0]["extra"] == 7.0
    assert recs[1]["iter"] == 1
