"""Data-parallel SKI statistics over a device mesh.

The SKI direct path (``models/ski.py``) reduces the whole dataset to
three hyperparameter-independent statistics — ``Z = WᵀW [G, G]``,
``Wᵀy [G]``, ``yᵀy`` — after which every NLML value+gradient is O(G³),
independent of n.  Those statistics are plain sums over data points,
so the multi-chip recipe is one ``shard_map``: each device scatters
its n/D-point shard into a local [G, G] accumulator, one ``psum``
(O(G²) wire bytes, independent of n) replicates the total, and the
O(G³) solve runs replicated on every chip.  n = 10⁹ costs the same
per-chip as n = 10⁹/D.

Padding convention: shards are zero-padded to equal length with
``wts = 0`` rows — a zero-weight tap contributes exactly nothing to
every statistic, so the padded result is bit-identical math (no
masking needed anywhere downstream).

The invariant *sharded == single-device* is tested on the 8-device
virtual CPU mesh (``tests/test_ski_dp.py``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pygpr_tpu.models import ski
from pygpr_tpu.models.ski import Grid, SKIStats, _flat_taps
from pygpr_tpu.parallel.mesh import EXPERT_AXIS

Array = jax.Array

__all__ = ["compute_stats_dp"]


def compute_stats_dp(
    x,
    y,
    grid: Grid,
    mesh: Mesh,
    *,
    axis: str = EXPERT_AXIS,
) -> SKIStats:
    """Sharded version of :func:`pygpr_tpu.models.ski.compute_stats`.

    Host-side stencil build (NumPy, house rule), zero-weight padding
    to ``D·ceil(n/D)``, tap-pair scatter per device, ``psum`` over
    ``axis``.  Returns replicated :class:`SKIStats` equal to the
    single-device statistics (up to f32 reduction order).
    """
    x = np.asarray(x)
    y_np = np.asarray(y)
    n = x.shape[0]
    d = mesh.shape[axis]
    per = -(-n // d)
    pad = per * d - n

    idx_np, wts_np = ski.interp_weights(x, grid)
    if pad:
        idx_np = np.concatenate(
            [idx_np, np.zeros((pad,) + idx_np.shape[1:], idx_np.dtype)]
        )
        wts_np = np.concatenate(
            [wts_np, np.zeros((pad,) + wts_np.shape[1:], wts_np.dtype)]
        )
        y_np = np.concatenate([y_np, np.zeros(pad, y_np.dtype)])

    yj = jnp.asarray(y_np)
    idx = jnp.asarray(idx_np)
    wts = jnp.asarray(wts_np, yj.dtype)
    sizes, total = grid.sizes, grid.total

    def local(idx_s, wts_s, y_s):
        taps = list(_flat_taps(idx_s, wts_s, sizes))
        z = jnp.zeros((total, total), y_s.dtype)
        wty = jnp.zeros((total,), y_s.dtype)
        for fa, wa in taps:
            wty = wty.at[fa].add(wa * y_s)
            for fb, wb in taps:
                z = z.at[fa, fb].add(wa * wb)
        yty = jnp.dot(y_s, y_s, precision=jax.lax.Precision.HIGHEST)
        return (
            jax.lax.psum(z, axis),
            jax.lax.psum(wty, axis),
            jax.lax.psum(yty, axis),
        )

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
    )
    z, wty, yty = jax.jit(sharded)(idx, wts, yj)
    return SKIStats(z=z, wty=wty, yty=yty, n=n)
