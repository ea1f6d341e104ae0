"""Mesh-sharded matvec for the iterative exact GP — row-parallel Krylov.

The single-device Krylov path (``models/iterative.py``) streams
``[block, n]`` gram tiles through one chip.  Past a few hundred
thousand points even ONE tile outgrows HBM (n = 10⁶ at block 4096 is
16 GB), and the O(n²) matvec wants more FLOPs than one chip has — so
the natural mesh layout is **row-parallel**: device ``i`` owns rows
``[i·n/D, (i+1)·n/D)`` of the implicit gram operator and produces that
shard of ``K·v``.

What moves on the wire per CG/Lanczos iteration: ``v`` itself —
``all_gather`` of O(n·k) bytes (k = 1+probes ≈ 10) — because every
device needs the full vector as GEMM columns.  That is **D× less than
the rows each device reads from its own HBM** (n/D · n tile floats),
so the matvec stays compute-bound as long as n/D ≫ D·k — the
weak-scaling regime.  ``x`` (n·d floats, d small) is replicated.

Everything downstream is UNCHANGED: ``models.iterative`` takes this
module's :func:`gram_matvec_dp` through its ``matvec=`` injection
point, and CG's vector algebra / dot products run on the row-sharded
arrays under GSPMD, which turns the ``jnp.sum`` reductions into
all-reduces automatically.  The invariant sharded == single-device is
tested on the 8-virtual-device CPU mesh (``tests/test_iterative_dp.py``).

Reference counterpart: none — PyGPR's exact path is a dense LAPACK
factorization (``/root/reference/PyGPR/loss.py:96-97``); this is the
model/TP-analogue axis (SURVEY.md §2.10) for the Krylov engine, next to
``parallel/dist_cholesky.py`` for the dense one.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.models import iterative
from pygpr_tpu.ops.kernels import Kernel
from pygpr_tpu.parallel.mesh import EXPERT_AXIS

Array = jax.Array


def _pad_rows(x: Array, mult: int) -> Tuple[Array, int]:
    n = x.shape[0]
    n_pad = -(-n // mult) * mult
    return jnp.pad(x, ((0, n_pad - n),) + ((0, 0),) * (x.ndim - 1)), n


def make_matvec_dp(
    kern: Kernel,
    x: Array,
    mesh: Mesh,
    *,
    axis: str = EXPERT_AXIS,
    block: int = 2048,
    config: Config = DEFAULT,
) -> Callable[[Array, Array], Array]:
    """Build ``mv(params, v) = (K + σₙ²I)·v`` with rows sharded over
    ``axis``; plug into ``models.iterative`` via ``matvec=``.

    ``x`` is replicated (n·d floats are tiny next to the implicit n²
    operator); each device computes its row shard with the same blocked
    tile stream as the single-device path, so per-device peak memory is
    one ``[block, n]`` tile.  Differentiable in ``params`` (shard_map
    transposes to the row-sharded VJP).
    """
    d_ax = mesh.shape[axis]
    x_pad, n = _pad_rows(x, d_ax)

    def local_rows(rows, x_full, theta, v):
        # rows: [n_pad/D, d] this device's row block (padded rows are
        # sliced away after the stack)
        return iterative._blocked_rows(
            kern, theta, rows, x_full,
            v, min(block, rows.shape[0]), config,
        )

    sharded = shard_map(
        local_rows,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )

    def mv(params: Array, v: Array) -> Array:
        theta, sn = params[..., :-1], params[..., -1]
        sn2 = sn * sn + jnp.asarray(config.jitter, x.dtype)
        vec = v.ndim == 1
        v2 = v[:, None] if vec else v
        out = sharded(x_pad, x, theta, v2)[:n] + sn2 * v2
        return out[:, 0] if vec else out

    return mv


def nlml_value_and_grad_dp(
    kern: Kernel,
    params: Array,
    x: Array,
    y: Array,
    probes: Array,
    mesh: Mesh,
    *,
    axis: str = EXPERT_AXIS,
    rank: int = 64,
    num_lanczos: int = 20,
    cg_tol: float = 1e-5,
    max_cg: int = 512,
    block: int = 2048,
    config: Config = DEFAULT,
) -> Tuple[Array, Array]:
    """Row-parallel NLML value+gradient == the single-device estimator.

    Only the matvec is distributed; CG, SLQ, the preconditioner and the
    Hutchinson surrogate are the single-device code operating on
    row-sharded intermediates under GSPMD.
    """
    mv = make_matvec_dp(
        kern, x, mesh, axis=axis, block=block, config=config
    )
    return iterative.nlml_value_and_grad(
        kern, params, x, y, probes,
        rank=rank, num_lanczos=num_lanczos,
        cg_tol=cg_tol, max_cg=max_cg, block=block, config=config,
        matvec=mv,
    )


def fit_dp(
    kern: Kernel,
    params0: Array,
    x: Array,
    y: Array,
    probes: Array,
    mesh: Mesh,
    *,
    axis: str = EXPERT_AXIS,
    block: int = 2048,
    config: Config = DEFAULT,
    **kw,
):
    """Row-parallel Adam fit (see ``models.iterative.fit``)."""
    mv = make_matvec_dp(
        kern, x, mesh, axis=axis, block=block, config=config
    )
    return iterative.fit(
        kern, params0, x, y, probes,
        block=block, config=config, matvec=mv, **kw,
    )
