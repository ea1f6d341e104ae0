"""Communication-volume evidence for the weak-scaling north star.

Real ≥2-host hardware is unavailable here (BASELINE.md), so the
weak-scaling claim is backed by a *measured program property* instead
of a wall-clock curve: compile the sharded paths on the 8-device mesh
and sum the bytes moved by every collective in the optimized HLO.

What must hold for ≥0.8 weak-scaling efficiency of expert-sharded
grBCM (per-device work fixed, devices grow):

  * the shared joint fit's per-iteration communication is O(nhp)
    (one psum of the NLML value + one of its gradient) — INDEPENDENT
    of the per-expert problem size n, whose local compute is O(n³);
  * sharded prediction's communication is O(n_query) (three psums of
    per-query aggregates) — independent of n as well.

Compute per device grows as n³ while the wire traffic stays constant,
so the compute/communication ratio improves with scale — the regime
where SPMD weak scaling approaches 1 and the remaining loss is
collective latency, not volume.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pygpr_tpu as gp
from pygpr_tpu.models import grbcm
from pygpr_tpu.parallel import (
    grbcm_fit_sharded,
    grbcm_predict_sharded,
    make_mesh,
)

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "pred": 1,
    "s8": 1, "u8": 1,
}

_COLLECTIVES = (
    "all-reduce(", "all-gather(", "reduce-scatter(",
    "collective-permute(", "all-to-all(",
)

_SHAPE_RE = re.compile(r"=\s*(?:\()?([a-z]+\d*)\[([\d,]*)\]")


def _collective_bytes(hlo: str) -> int:
    """Sum output bytes of every collective op in an HLO module dump.

    Static accounting: an op inside a `while` body counts once — which
    is exactly the per-iteration volume we want to bound.
    """
    total = 0
    for line in hlo.splitlines():
        if not any(c in line for c in _COLLECTIVES):
            continue
        m = _SHAPE_RE.search(line)
        if m is None:
            continue
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES.get(dt, 4)
    return total


def _committee(rng, nc, n, ng=8, dim=2, dtype=np.float64):
    xl = rng.uniform(0, 4, (nc, n, dim)).astype(dtype)
    yl = np.sin(xl.sum(-1)).astype(dtype)
    xg = rng.uniform(0, 4, (ng, dim)).astype(dtype)
    yg = np.sin(xg.sum(-1)).astype(dtype)
    return (jnp.asarray(xl), jnp.asarray(yl),
            jnp.asarray(xg), jnp.asarray(yg))


def _fit_hlo(rng, n):
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    xl, yl, xg, yg = _committee(rng, nc=8, n=n)
    x_aug, y_aug = grbcm.augment(xl, yl, xg, yg)
    p0 = jnp.ones((cov.n_params(2),), xg.dtype)
    mesh = make_mesh(n_expert=8)
    f = jax.jit(
        lambda p0, xg, yg, xa, ya: grbcm_fit_sharded(
            cov, p0, xg, yg, xa, ya, mesh, max_iter=10, shared=True
        )
    )
    return f.lower(p0, xg, yg, x_aug, y_aug).compile().as_text()


def _predict_hlo(rng, n, nq):
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    xl, yl, xg, yg = _committee(rng, nc=8, n=n)
    x_aug, y_aug = grbcm.augment(xl, yl, xg, yg)
    p = jnp.ones((cov.n_params(2),), xg.dtype)
    pl = jnp.broadcast_to(p, (8,) + p.shape)
    xs = jnp.asarray(
        np.random.default_rng(1).uniform(0, 4, (nq, 2)).astype(np.float64)
    )
    mesh = make_mesh(n_expert=8)
    f = jax.jit(
        lambda pl, xg, yg, xa, ya, xs: grbcm_predict_sharded(
            cov, p, pl, xg, yg, xa, ya, xs, mesh
        )
    )
    return f.lower(pl, xg, yg, x_aug, y_aug, xs).compile().as_text()


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device mesh"
)
def test_shared_fit_comm_volume_independent_of_n(rng):
    """Joint-fit collectives move O(nhp) bytes per occurrence, the same
    at n=16 and n=32 local points — compute grows n³, wire stays flat."""
    b16 = _collective_bytes(_fit_hlo(rng, 16))
    b32 = _collective_bytes(_fit_hlo(rng, 32))
    assert b16 > 0, "shared fit must actually communicate (psum)"
    assert b16 == b32, (b16, b32)
    # The whole fit program's static collective footprint is tiny:
    # scalar value + nhp gradient psums (plus L-BFGS bookkeeping),
    # nowhere near the O(n²) a naive gram-gather design would show.
    assert b16 < 64 * 1024, b16


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device mesh"
)
def test_predict_comm_volume_scales_with_queries_not_n(rng):
    """Prediction psums move O(n_query) bytes — independent of the
    expert training size, linear in the query batch."""
    b_n16 = _collective_bytes(_predict_hlo(rng, 16, nq=64))
    b_n32 = _collective_bytes(_predict_hlo(rng, 32, nq=64))
    assert b_n16 == b_n32, (b_n16, b_n32)
    b_q128 = _collective_bytes(_predict_hlo(rng, 16, nq=128))
    # linear in n_query (three β/precision/mean psums + the pinned
    # communication-expert bookkeeping)
    assert b_q128 > b_n16
    ratio = b_q128 / b_n16
    assert 1.5 < ratio <= 2.5, (b_n16, b_q128)
