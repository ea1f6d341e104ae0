"""Pallas blocked Cholesky for TPU (batched, VMEM-resident).

The reference's entire hot path funnels through LAPACK ``potrf``
(``PyGPR/gpr.py:69``, ``loss.py:97``, ``gr_bcm.py:101``); on TPU the
XLA lowering of ``lax.linalg.cholesky`` runs far off compute
speed-of-light at GP sizes.  This kernel targets the **committee
regime** — many expert-sized matrices (n ≤ ~1024, the grBCM augmented
blocks) — where the whole matrix fits in VMEM and the batch axis maps
onto the (sequential) TPU grid:

    grid = (batch,) — one matrix per grid step, factorized in place:
      for each 128-wide panel p (static unroll):
        1. micro-Cholesky of the diagonal block   (fori, masked VPU)
        2. triangular inverse of that block       (fori, masked row recurrence)
        3. TRSM of the sub-column via one MXU matmul with the inverse
        4. SYRK rank-128 update of the trailing matrix on the MXU

Panel offsets are static (the python loop runs over panels), so all
block slices are static; only the intra-panel index is traced.  n is
padded to a multiple of 128 with an identity block by the wrapper.

Numerics match ``lax.linalg.cholesky`` to f32 round-off; an indefinite
input produces NaNs (sqrt of a negative pivot) that propagate — exactly
the failure signal the jitter ladder in ``ops.linalg`` keys on.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

B = 128  # panel width (MXU-aligned)
CW = 512  # left-looking stream chunk width (contraction depth per GEMM)

# largest single matrix the fused chol+inverse kernel accepts.  The
# VMEM working set (~(4·B + 2·CW)·n·4 bytes + Mosaic stack) fits the
# raised 100 MiB scoped budget well past this, but the 64-panel
# statically-unrolled pipeline at n=8192 took Mosaic >25 min to
# compile (vs ~2 min at 4096) — n>5632 routes to the XLA
# chol + block-doubling-inverse path instead.
MAX_FUSED_N = 5632


def _micro_cholesky_masked(tile: Array) -> Array:
    """Cholesky of one [B, B] block (lower), masked column loop.

    The original formulation: every pivot step runs ~6 full-tile
    [B, B] VPU ops (16 passes each) plus two cross-lane reductions —
    measured ~34 µs per block on v5e (``bench/mfu_probe.py``), which
    made the pivot chain ~45% of the whole fused kernel.  Kept as the
    interpret-mode/correctness oracle; the hot path is
    :func:`_micro_cholesky` below.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    r1 = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)

    def body(j, D):
        col = jnp.sum(
            jnp.where(cols == j, D, 0.0), axis=1, keepdims=True
        )                                                    # [B, 1]
        piv = jnp.sum(jnp.where((rows == j) & (cols == j), D, 0.0))
        d = jnp.sqrt(piv)
        newcol = jnp.where(r1 == j, d, jnp.where(r1 > j, col / d, col))
        D = jnp.where(cols == j, newcol, D)
        mask = (rows > j) & (cols > j)
        return D - jnp.where(mask, newcol * newcol.reshape(1, B), 0.0)

    D = jax.lax.fori_loop(0, B, body, tile)
    return jnp.where(rows >= cols, D, 0.0)


_MINI = 8  # mini-panel width (one f32 sublane group)


def _micro_cholesky(tile: Array) -> Array:
    """Cholesky of one SYMMETRIC [B, B] block (returns lower L) via
    static 8-wide mini-panels on the *transposed* factor.

    The input block is symmetric (every call site passes a
    trailing-updated diagonal block of an SPD matrix), so the
    algorithm can factor ``U = Lᵀ`` row-wise without ever transposing
    the input: row j of U is column j of L, an [1, B] lane vector —
    every pivot step touches only [1, B]/[8, B] strips (single-VPU-pass
    ops + static slices) instead of full-tile masked ops, and the
    trailing update beyond the mini-panel collapses into ONE rank-8
    MXU matmul (UᵀU restricted) per 8 pivots.  ~6× less VPU work than
    :func:`_micro_cholesky_masked`; bitwise-comparable numerics
    (same operation order per pivot, FD-tested in tests/test_pallas).

    Indefinite pivots produce NaNs that propagate — the jitter-ladder
    failure signal — exactly as before.
    """
    dtype = tile.dtype
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (_MINI, B), 0)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (_MINI, B), 1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    rowsB = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)

    U = tile  # symmetric: tileᵀ == tile
    for g in range(B // _MINI):
        c0 = g * _MINI
        S = U[c0 : c0 + _MINI, :]                        # [8, B] strip
        # one-hot selector: P[a, i] = (i == c0 + a) — turns "extract
        # 8 named lanes of a row into sublanes" into one MXU matvec
        Psel = (lane8 == (sub8 + c0)).astype(dtype)

        for jj in range(_MINI):
            j = c0 + jj
            row = S[jj : jj + 1, :]                      # [1, B]
            d = jnp.sqrt(row[:, j : j + 1])              # [1, 1] static
            newrow = jnp.where(
                lane1 == j,
                d,
                jnp.where(lane1 > j, row / d, jnp.zeros_like(row)),
            )
            S = jnp.where(sub8 == jj, newrow, S)
            if jj + 1 < _MINI:
                # strip-internal rank-1 update: rows jj+1.. of the
                # strip lose coef[a]·newrow, coef[a] = newrow[c0+a]
                coef = jax.lax.dot_general(
                    Psel, newrow,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )                                        # [8, 1]
                S = S - jnp.where(
                    sub8 > jj, coef * newrow, jnp.zeros_like(S)
                )

        U = jnp.where(
            (rowsB >= c0) & (rowsB < c0 + _MINI),
            jnp.pad(S, ((c0, B - c0 - _MINI), (0, 0))),
            U,
        )
        if c0 + _MINI < B:
            # rank-8 trailing update of the remaining rows of U:
            # U[a, i] -= Σⱼ L[i, c0+j]·L[a, c0+j] = (SᵀS)[a, i]
            M = jax.lax.dot_general(
                S, S,
                dimension_numbers=(((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )                                            # [B, B]
            U = U - jnp.where(
                rowsB >= c0 + _MINI, M, jnp.zeros_like(U)
            )

    # U holds Lᵀ (strictly-lower lanes already zeroed row-by-row)
    return U.T


def _micro_cholesky_scratch(mblk):
    """Ref-backed mini-panel micro-Cholesky (same math as
    :func:`_micro_cholesky`) for use INSIDE kernels: factors the
    symmetric [B, B] block the caller has ALREADY STORED in the
    dedicated VMEM scratch ``mblk``, leaving ``U = Lᵀ`` there (the
    caller transposes the value when copying back out).

    Two reasons this is a scratch ref and not a value or an in-place
    window of the data buffer:

      * Carrying the factor through ref stores instead of one SSA
        value matters — Mosaic allocates scoped-vmem stack for every
        live temporary of the 16-way unrolled value version (~7 MB),
        which pushed the fused n=4096 kernel past the 16 MB scoped
        limit.
      * A DEDICATED scratch keeps every store/load pair here on
        disjoint row ranges.  Updating a window of the caller's data
        buffer in place (including a final self-overlapping transpose
        store) hit a store/load reordering bug in Pallas interpret
        mode under an outer jit — silently wrong factors, data- and
        context-dependent.
    """
    dtype = jnp.float32
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (_MINI, B), 0)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (_MINI, B), 1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)

    for g in range(B // _MINI):
        c0 = g * _MINI
        S = mblk[c0 : c0 + _MINI, :]
        Psel = (lane8 == (sub8 + c0)).astype(dtype)
        for jj in range(_MINI):
            j = c0 + jj
            row = S[jj : jj + 1, :]
            d = jnp.sqrt(row[:, j : j + 1])
            newrow = jnp.where(
                lane1 == j,
                d,
                jnp.where(lane1 > j, row / d, jnp.zeros_like(row)),
            )
            S = jnp.where(sub8 == jj, newrow, S)
            if jj + 1 < _MINI:
                coef = jax.lax.dot_general(
                    Psel, newrow,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
                S = S - jnp.where(
                    sub8 > jj, coef * newrow, jnp.zeros_like(S)
                )
        mblk[c0 : c0 + _MINI, :] = S
        if c0 + _MINI < B:
            M = jax.lax.dot_general(
                S, S,
                dimension_numbers=(((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            T = mblk[c0 + _MINI : B, :]
            mblk[c0 + _MINI : B, :] = T - M[c0 + _MINI : B, :]


def _tri_inverse(L: Array) -> Array:
    """Inverse of a lower-triangular [B, B] factor by block doubling.

    All 16 diagonal 8×8 blocks invert **in parallel** (8 statically
    unrolled masked steps — a full-matrix matmul of block-diagonal
    operands computes every block-local product at once), then 4
    doubling levels stitch them:
      inv([[A,0],[B,C]]) = [[A⁻¹, 0], [−C⁻¹ B A⁻¹, C⁻¹]],
    two [B,B] MXU matmuls per level.  ~16 matrix ops total instead of a
    B-step sequential substitution — this is what keeps the TRSM stage
    off the kernel's critical path.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    same8 = (rows // 8) == (cols // 8)
    diag = rows == cols

    # ~20 serial [B,B] matmuls sit on the kernel's critical path; at
    # HIGHEST each costs 6 MXU passes.  Run the recursion in DEFAULT
    # (1 pass) and recover f32 accuracy with ONE Newton step at
    # HIGHEST at the end (2 matmuls): T ← 2T − T·L·T.  Measured
    # residual ‖TL−I‖∞: 1.1e-7 (all-HIGHEST) / 1.5e-6 (this) /
    # 1.4e-3 (no refinement).
    def mm(a, b):
        return jax.lax.dot_general(
            a, b,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    def mm_hi(a, b):
        return jax.lax.dot_general(
            a, b,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    # base: forward substitution on all 8×8 diagonal blocks at once
    pivots = jnp.sum(jnp.where(diag, L, 0.0), axis=1, keepdims=True)
    pivots = jnp.where(pivots == 0.0, 1.0, pivots)           # pad rows
    T = jnp.zeros_like(L)
    for i in range(8):                                       # static
        row_i = (rows % 8) == i
        Rm = jnp.where(row_i & same8 & ((cols % 8) < i), L, 0.0)
        acc = mm(Rm, T)
        E = jnp.where(diag & row_i, 1.0, 0.0)
        newrows = (E - acc) / pivots
        T = jnp.where(row_i, newrows, T)

    # doubling: 8 → 16 → 32 → 64 → 128
    s = 8
    while s < B:
        pairm = ((rows // s - cols // s) == 1) & (
            (rows // (2 * s)) == (cols // (2 * s))
        )
        Bm = jnp.where(pairm, L, 0.0)
        X = mm(mm(T, Bm), T)
        T = T - jnp.where(pairm, X, 0.0)
        s *= 2
    # Newton refinement at full precision (see mm docstring above)
    return 2.0 * T - mm_hi(T, mm_hi(L, T))


def _chol_kernel(n: int, a_ref, out_ref, mblk):
    out_ref[0] = a_ref[0]
    P = n // B
    for p in range(P):
        lo = p * B
        hi = lo + B
        mblk[...] = out_ref[0, lo:hi, lo:hi]
        _micro_cholesky_scratch(mblk)
        D = mblk[...].T
        out_ref[0, lo:hi, lo:hi] = D
        if hi < n:
            Tinv = _tri_inverse(D)
            C = out_ref[0, hi:n, lo:hi]                      # [m, B]
            X = jax.lax.dot_general(
                C, Tinv,
                dimension_numbers=(((1,), (1,)), ((), ())),  # C · Tinvᵀ
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            out_ref[0, hi:n, lo:hi] = X
            A22 = out_ref[0, hi:n, hi:n]
            out_ref[0, hi:n, hi:n] = A22 - jax.lax.dot_general(
                X, X,
                dimension_numbers=(((1,), (1,)), ((), ())),  # X Xᵀ
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            # zero the upper strip right of this diagonal block
            out_ref[0, lo:hi, hi:n] = jnp.zeros(
                (B, n - hi), jnp.float32
            )


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# Batched HBM-streaming variant: the pivot chain is the sequential cost,
# so batch it — all nb matrices advance their panel-k micro-steps
# together.  Matrices stay in HBM (aliased in/out); the VMEM working set
# is one column panel of every matrix at a time, DMA'd per step.
# ---------------------------------------------------------------------------


def _micro_cholesky_batched(tile: Array) -> Array:
    """[nb, B, B] diagonal blocks factorized together — each masked VPU
    step now does nb pivots' worth of work instead of one."""
    nb = tile.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, B, B), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, B, B), 2)
    r1 = jax.lax.broadcasted_iota(jnp.int32, (nb, B, 1), 1)

    def body(j, D):
        col = jnp.sum(
            jnp.where(cols == j, D, 0.0), axis=2, keepdims=True
        )                                                    # [nb, B, 1]
        # two single-axis reductions: Mosaic's layout inference crashes
        # on multi-axis keepdims sums over 3-D operands
        piv = jnp.sum(
            jnp.sum(
                jnp.where((rows == j) & (cols == j), D, 0.0),
                axis=2,
                keepdims=True,
            ),
            axis=1,
            keepdims=True,
        )                                                    # [nb, 1, 1]
        d = jnp.sqrt(piv)
        newcol = jnp.where(r1 == j, d, jnp.where(r1 > j, col / d, col))
        D = jnp.where(cols == j, newcol, D)
        mask = (rows > j) & (cols > j)
        upd = newcol * jnp.swapaxes(newcol, 1, 2)
        return D - jnp.where(mask, upd, 0.0)

    D = jax.lax.fori_loop(0, B, body, tile)
    return jnp.where(rows >= cols, D, 0.0)


def _tri_inverse_batched(L: Array) -> Array:
    """Batched block-doubling inverse of [nb, B, B] lower factors."""
    nb = L.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, B, B), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, B, B), 2)
    same8 = (rows // 8) == (cols // 8)
    diag = rows == cols

    # DEFAULT-precision recursion + one HIGHEST Newton step at the end
    # (see _tri_inverse): the serial matmul chain is the critical path
    def bmm(a, b):
        return jax.lax.dot_general(
            a, b,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    def bmm_hi(a, b):
        return jax.lax.dot_general(
            a, b,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    pivots = jnp.sum(jnp.where(diag, L, 0.0), axis=2, keepdims=True)
    pivots = jnp.where(pivots == 0.0, 1.0, pivots)
    T = jnp.zeros_like(L)
    for i in range(8):
        row_i = (rows % 8) == i
        Rm = jnp.where(row_i & same8 & ((cols % 8) < i), L, 0.0)
        acc = bmm(Rm, T)
        E = jnp.where(diag & row_i, 1.0, 0.0)
        newrows = (E - acc) / pivots
        T = jnp.where(row_i, newrows, T)

    s = 8
    while s < B:
        pairm = ((rows // s - cols // s) == 1) & (
            (rows // (2 * s)) == (cols // (2 * s))
        )
        Bm = jnp.where(pairm, L, 0.0)
        X = bmm(bmm(T, Bm), T)
        T = T - jnp.where(pairm, X, 0.0)
        s *= 2
    return 2.0 * T - bmm_hi(T, bmm_hi(L, T))


def _chol_batched_kernel(nb: int, n: int, hbm_ref, out_ref, panel, colbuf, sems):
    """Grid-less kernel: K [nb, n, n] lives in HBM (in/out aliased);
    per static panel k, DMA the column panel of all matrices to VMEM,
    run the batched factorization steps, DMA back, then stream the
    trailing column panels through ``colbuf`` for the SYRK updates."""
    P = n // B

    def dma_in(dst, col_lo, row_lo, row_hi, sem):
        cp = pltpu.make_async_copy(
            out_ref.at[:, pl.ds(row_lo, row_hi - row_lo),
                       pl.ds(col_lo, B)],
            dst.at[:, pl.ds(0, row_hi - row_lo), :],
            sem,
        )
        cp.start()
        cp.wait()

    def dma_out(src, col_lo, row_lo, row_hi, sem):
        cp = pltpu.make_async_copy(
            src.at[:, pl.ds(0, row_hi - row_lo), :],
            out_ref.at[:, pl.ds(row_lo, row_hi - row_lo),
                       pl.ds(col_lo, B)],
            sem,
        )
        cp.start()
        cp.wait()

    for p in range(P):
        lo = p * B
        hi = lo + B
        # fetch this panel: rows lo..n of column block p (rows above lo
        # are upper-triangle; write zeros there at the end instead)
        dma_in(panel, lo, lo, n, sems.at[0])
        D = _micro_cholesky_batched(panel[:, 0:B, :])
        panel[:, 0:B, :] = D
        m = n - hi
        if m > 0:
            Tinv = _tri_inverse_batched(D)
            C = panel[:, B : B + m, :]
            X = jax.lax.dot_general(
                C, Tinv,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            panel[:, B : B + m, :] = X
        dma_out(panel, lo, lo, n, sems.at[0])
        if m > 0:
            # trailing SYRK: stream column panels j > p
            for j in range(p + 1, P):
                jlo = j * B
                rows_lo = hi               # update all rows below panel p
                mm = n - rows_lo
                dma_in(colbuf, jlo, rows_lo, n, sems.at[1])
                Xj = panel[:, B + (jlo - hi) : B + (jlo - hi) + B, :]
                upd = jax.lax.dot_general(
                    panel[:, B : B + mm, :], Xj,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
                colbuf[:, 0:mm, :] = colbuf[:, 0:mm, :] - upd
                dma_out(colbuf, jlo, rows_lo, n, sems.at[1])
    # zero the upper-triangle strips (rows < panel) in one pass
    for p in range(1, P):
        lo = p * B
        panel[:, 0:lo, :] = jnp.zeros((nb, lo, B), jnp.float32)
        dma_out(panel, lo, 0, lo, sems.at[0])


def cholesky_pallas_batched(K: Array, interpret: bool = False) -> Array:
    """Batched blocked Cholesky with the pivot chain amortized across
    the batch (HBM-resident, DMA-streamed panels).  ``K: [nb, n, n]``,
    n a multiple of 128.  The committee-regime fast path.

    The batch is processed in VMEM-sized chunks: the working set is
    ~3 chunk·n·B floats (two panel buffers + the TRSM/SYRK temporary),
    budgeted at ~10 MB of the 16 MB VMEM.
    """
    nb, n, _ = K.shape
    assert n % B == 0 and n >= 2 * B
    chunk = max(1, min(nb, (10 * 2**20) // (3 * n * B * 4)))

    def call(Kc):
        nc = Kc.shape[0]
        kernel = functools.partial(_chol_batched_kernel, nc, n)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nc, n, n), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((nc, n, B), jnp.float32),   # panel
                pltpu.VMEM((nc, n, B), jnp.float32),   # colbuf
                pltpu.SemaphoreType.DMA((2,)),
            ],
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(Kc)

    K = K.astype(jnp.float32)
    if chunk >= nb:
        return call(K)
    n_full = (nb // chunk) * chunk
    parts = [
        call(K[i : i + chunk]) for i in range(0, n_full, chunk)
    ]
    if n_full < nb:
        parts.append(call(K[n_full:]))
    return jnp.concatenate(parts, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cholesky_pallas(K: Array, interpret: bool = False) -> Array:
    """Blocked Cholesky of SPD ``K`` — ``[n, n]`` or batched
    ``[nb, n, n]``; n padded to a multiple of 128 internally.
    f32, VMEM-resident: n ≤ ~1024 (the grBCM expert regime)."""
    batched = K.ndim == 3
    if not batched:
        K = K[None]
    K = K.astype(jnp.float32)
    nb, n, _ = K.shape
    n_pad = max(_cdiv(n, B) * B, B)
    if n_pad != n:
        # Pad with an identity block: chol([[K,0],[0,I]]) = [[L,0],[0,I]].
        K = jnp.pad(K, ((0, 0), (0, n_pad - n), (0, n_pad - n)))
        eye_tail = (jnp.arange(n_pad) >= n).astype(K.dtype)
        K = K + jnp.diag(eye_tail)[None]

    kernel = functools.partial(_chol_kernel, n_pad)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, n_pad, n_pad), jnp.float32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(
                (1, n_pad, n_pad), lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, n_pad, n_pad), lambda b: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=nb * n_pad**3 // 3,
            bytes_accessed=2 * nb * n_pad * n_pad * 4,
            transcendentals=nb * n_pad,
        ),
        scratch_shapes=[pltpu.VMEM((B, B), jnp.float32)],  # mblk
        interpret=interpret,
    )(K)
    out = out[:, :n, :n]
    return out if batched else out[0]


# ---------------------------------------------------------------------------
# Fused Cholesky + triangular inverse (potrf ∘ trtri), single matrix,
# HBM-streaming.  The NLML fast-gradient path needs BOTH L (log-det,
# value) and T = L⁻¹ (K⁻¹ = TᵀT, solve-free gradient); building T
# forward alongside the factorization costs one extra MXU GEMM per
# panel:  T[p, :pb] = −D⁻¹ · (L[p, :pb] @ T[:pb, :pb]),  T[p, p] = D⁻¹,
# where D = L[p, p] — total n³/3 extra flops, all matmul-shaped, and
# the L row is still VMEM-resident when it's needed.
# ---------------------------------------------------------------------------


def _chol_inv_kernel(
    n: int, a_ref, l_ref, t_ref, panel, colbuf, rowbuf, tband, mblk,
    sems,
):
    """K [n, n] in HBM → L, T=L⁻¹ [n, n] in HBM, **left-looking**.

    Per static panel p (lo = p·B):
      1. DMA the *original* K column panel (rows lo..n — left-looking
         never writes the trailing matrix, so the aliased buffer still
         holds K there) and the finished L row band L[lo:hi, 0:lo]
      2. update: panel −= Σⱼ L[lo:n, jB:(j+1)B] · L[lo:hi, jB:(j+1)B]ᵀ,
         streaming the j panels through a two-slot colbuf (the next
         panel's DMA in flight while the MXU consumes the current one —
         the streams are read-only, so no write-ordering hazards)
      3. micro-Cholesky of the diagonal block + block-doubling inverse,
         TRSM of the sub-column via one MXU matmul
      4. T row band: Tpⱼ = −D⁻¹·(Lrow[:, jB:pB] @ T[jB:pB, jB:(j+1)B]),
         accumulated in a [B, n] VMEM band and written with ONE DMA
         (the right-of-diagonal zeros ride along from the band's
         never-written tail, zeroed once at start)

    vs the previous right-looking version: the trailing matrix is never
    re-written (≈3× less HBM traffic), every stream is double-buffered,
    and the per-block zero/band writes collapse into one wide DMA per
    panel — the kernel had been latency-bound on ~P² blocking DMAs.
    """
    P = n // B

    def start(src, dst, sem):
        cp = pltpu.make_async_copy(src, dst, sem)
        cp.start()
        return cp

    # zero the band's tail once: each panel writes band data only into
    # cols [0, hi) and zeros only ever to the right of that
    tband[...] = jnp.zeros_like(tband)

    for p in range(P):
        lo = p * B
        hi = lo + B
        m = n - hi
        rows = n - lo
        # 1. original-K panel + finished L row band, fetched together
        cp_panel = start(
            l_ref.at[pl.ds(lo, rows), pl.ds(lo, B)],
            panel.at[pl.ds(0, rows), :],
            sems.at[0],
        )
        if p > 0:
            cp_row = start(
                l_ref.at[pl.ds(lo, B), pl.ds(0, lo)],
                rowbuf.at[0:B, pl.ds(0, lo)],
                sems.at[3],
            )
            cp_row.wait()
        cp_panel.wait()

        # 2. left-looking update, two-slot double-buffered stream of
        # CW-wide chunks.  At B=128-wide streaming the update GEMMs
        # are contraction-starved ([rows,128]×[128,128] ran the whole
        # kernel at ~12 TFLOP/s while XLA's fat GEMMs hit ~59 on this
        # chip — mfu_probe, n=4096); CW=512 quadruples the contraction
        # depth per MXU pass at the cost of a wider colbuf.
        if p > 0:
            nch = -(-lo // CW)
            cps = [None, None]

            def ch_dma(j):
                w = min(CW, lo - j * CW)
                return start(
                    l_ref.at[pl.ds(lo, rows), pl.ds(j * CW, w)],
                    colbuf.at[j % 2, pl.ds(0, rows), pl.ds(0, w)],
                    sems.at[1 + (j % 2)],
                )

            cps[0] = ch_dma(0)
            for j in range(nch):
                w = min(CW, lo - j * CW)
                if j + 1 < nch:
                    cps[(j + 1) % 2] = ch_dma(j + 1)
                cps[j % 2].wait()
                upd = jax.lax.dot_general(
                    colbuf[j % 2, pl.ds(0, rows), pl.ds(0, w)],
                    rowbuf[0:B, pl.ds(j * CW, w)],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
                panel[pl.ds(0, rows), :] = panel[pl.ds(0, rows), :] - upd

        # 3. factorize the panel's diagonal block in the dedicated
        # scratch (see _micro_cholesky_scratch on why: Mosaic
        # scoped-vmem stack + interpret-mode store ordering)
        mblk[...] = panel[0:B, :]
        _micro_cholesky_scratch(mblk)
        D = mblk[...].T
        panel[0:B, :] = D
        Dinv = _tri_inverse(D)
        if m > 0:
            X = jax.lax.dot_general(
                panel[B : B + m, :], Dinv,
                dimension_numbers=(((1,), (1,)), ((), ())),   # C · Dinvᵀ
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            panel[B : B + m, :] = X
        cp_lpanel = start(
            panel.at[pl.ds(0, rows), :],
            l_ref.at[pl.ds(lo, rows), pl.ds(lo, B)],
            sems.at[0],
        )

        # 4. T row band, streamed through the (now idle) colbuf slots
        if p > 0:
            cps = [None, None]

            def tcol_dma(j):
                return start(
                    t_ref.at[pl.ds(j * B, lo - j * B), pl.ds(j * B, B)],
                    colbuf.at[j % 2, pl.ds(0, lo - j * B), pl.ds(0, B)],
                    sems.at[1 + (j % 2)],
                )

            cps[0] = tcol_dma(0)
            for j in range(p):
                jlo = j * B
                span = lo - jlo
                if j + 1 < p:
                    cps[(j + 1) % 2] = tcol_dma(j + 1)
                cps[j % 2].wait()
                acc = jax.lax.dot_general(
                    rowbuf[0:B, pl.ds(jlo, span)],
                    colbuf[j % 2, pl.ds(0, span), pl.ds(0, B)],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
                tband[0:B, pl.ds(jlo, B)] = -jax.lax.dot_general(
                    Dinv, acc,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
        tband[0:B, pl.ds(lo, B)] = Dinv
        # the band write carries the zeros right of the diagonal too
        cp_tband = start(
            tband.at[0:B, :], t_ref.at[pl.ds(lo, B), :], sems.at[4]
        )
        if m > 0:
            # L's right-of-diagonal strip: one wide zero DMA from the
            # band's untouched tail
            cp_lzero = start(
                tband.at[0:B, pl.ds(hi, m)],
                l_ref.at[pl.ds(lo, B), pl.ds(hi, m)],
                sems.at[5],
            )
            cp_lzero.wait()
        cp_tband.wait()
        cp_lpanel.wait()


# ---------------------------------------------------------------------------
# Rolled-loop fused Cholesky + inverse: the SAME left-looking algorithm
# as _chol_inv_kernel, but the panel loop is a traced lax.fori_loop so
# Mosaic compiles the body ONCE — compile time flat in n instead of the
# statically-unrolled pipeline's ∝ P growth (>25 min at the 64-panel
# n=8192 unroll, the reason MAX_FUSED_N stops at 5632; docs/mfu.md).
#
# What changes to make every slice static-SIZE (Pallas requirement)
# while offsets are traced:
#   * the K/L panel is fetched/written FULL HEIGHT [n, B] (the junk
#     rows above the diagonal are masked to zero at write-back — they
#     never re-enter the factorization);
#   * the L row band rides a full-width [B, n] DMA and is masked
#     (cols ≥ lo → 0) once per panel, which simultaneously kills the
#     junk contraction lanes of BOTH streamed stages;
#   * the left-looking update streams fixed [CHR, CW] blocks on an
#     ABSOLUTE row grid (first chunk may cover junk rows — harmless,
#     see above), double-buffered exactly as the fused kernel's column
#     stream;
#   * the T-band contraction streams fixed [CW, CW] blocks of T
#     (valid including their zero upper triangles because every T row
#     band is written full-width), double-buffered, jc ≤ c blocks only.
# ---------------------------------------------------------------------------

CHR = 512  # rolled-kernel minimum stream chunk (n alignment unit)
MAX_ROLLED_N = 16384  # VMEM: panel+rowbuf+tband ≈ 3·n·B·4 ≤ ~25 MB


def _chol_inv_kernel_rolled(
    n: int, ck: int, a_ref, l_ref, t_ref, panel, rowbuf, tband, acc, sbuf,
    tbuf, mblk, dblk, sems,
):
    P = n // B
    NRK = n // ck

    def start(src, dst, sem):
        cp = pltpu.make_async_copy(src, dst, sem)
        cp.start()
        return cp

    rowid_nb = jax.lax.broadcasted_iota(jnp.int32, (n, B), 0)
    colid_bn = jax.lax.broadcasted_iota(jnp.int32, (B, n), 1)

    # panel/rowbuf are PING-PONGED [2, ...] buffers: panel p+1's K
    # column prefetches during panel p's compute (the source column is
    # untouched until p+1's own write-back), and rowbuf p+1 prefetches
    # the moment p's L write-back lands — the two ~n·B DMAs that
    # otherwise sit serially at the top of every panel.
    #
    # Start and wait are SEPARATE helpers on purpose.  The first cut
    # waited cross-iteration copies via `dma(p).wait()` on a helper
    # that also STARTED — each wait launched a second, redundant copy
    # of data that hadn't changed, so interpret mode stayed correct
    # while on hardware every panel leaked one armed-but-unawaited
    # semaphore increment per helper and the device faulted
    # ("INTERNAL: TPU backend error") on the first real run.  A wait
    # must be a bare make_async_copy(...).wait() descriptor, exactly
    # like the unrolled kernel's kept-object `cp.wait()`s.
    def panel_cp(p):
        return pltpu.make_async_copy(
            l_ref.at[:, pl.ds(p * B, B)],
            panel.at[p % 2],
            sems.at[p % 2],
        )

    def rowbuf_cp(p):
        return pltpu.make_async_copy(
            l_ref.at[pl.ds(p * B, B), :],
            rowbuf.at[p % 2],
            sems.at[2 + p % 2],
        )

    def panel_dma(p):
        panel_cp(p).start()

    def rowbuf_dma(p):
        rowbuf_cp(p).start()

    panel_dma(0)

    def panel_body(p, _):
        sp = p % 2
        lo = pl.multiple_of(p * B, B)
        hi = lo + B
        nch = pl.cdiv(lo, ck)          # column chunks left of diagonal

        # prefetch the NEXT panel's K column before anything blocks
        @pl.when(p + 1 < P)
        def _():
            panel_dma(p + 1)

        @pl.when(p > 0)
        def _():
            rowbuf_cp(p).wait()        # started at the end of p−1
            # one mask kills the junk lanes of BOTH streamed stages
            rowbuf[sp] = jnp.where(
                colid_bn < lo, rowbuf[sp], 0.0
            )

        panel_cp(p).wait()

        # ---- left-looking update: panel −= L[chunk,:lo]·Lrowᵀ ----
        def stream_cp(slot, k, j):
            return pltpu.make_async_copy(
                l_ref.at[pl.ds(k * ck, ck), pl.ds(j * ck, ck)],
                sbuf.at[slot],
                sems.at[6 + slot],
            )

        def stream_dma(slot, k, j):
            stream_cp(slot, k, j).start()

        @pl.when(nch > 0)
        def _():
            kf = lo // ck             # absolute row-chunk grid

            def kbody(k, _):
                stream_dma(0, k, 0)
                acc[...] = jnp.zeros_like(acc)

                def jbody(j, _):
                    slot = j % 2

                    @pl.when(j + 1 < nch)
                    def _():
                        stream_dma((j + 1) % 2, k, j + 1)

                    stream_cp(slot, k, j).wait()
                    acc[...] = acc[...] + jax.lax.dot_general(
                        sbuf[slot],
                        rowbuf[sp, :, pl.ds(j * ck, ck)],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    )

                jax.lax.fori_loop(0, nch, jbody, None)
                base = pl.multiple_of(k * ck, ck)
                panel[sp, pl.ds(base, ck), :] = (
                    panel[sp, pl.ds(base, ck), :] - acc[...]
                )

            jax.lax.fori_loop(kf, NRK, kbody, None)

        # ---- diagonal block: micro-Cholesky + triangular inverse ----
        mblk[...] = panel[sp, pl.ds(lo, B), :]
        _micro_cholesky_scratch(mblk)
        D = mblk[...].T
        panel[sp, pl.ds(lo, B), :] = D
        dblk[...] = _tri_inverse(D)

        # ---- TRSM of the sub-column via the inverse ----
        khi = hi // ck

        def tbody(k, _):
            base = pl.multiple_of(k * ck, ck)
            C = panel[sp, pl.ds(base, ck), :]
            X = jax.lax.dot_general(
                C, dblk[...],
                dimension_numbers=(((1,), (1,)), ((), ())),  # C·Dinvᵀ
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            rows = base + jax.lax.broadcasted_iota(
                jnp.int32, (ck, B), 0
            )
            panel[sp, pl.ds(base, ck), :] = jnp.where(rows >= hi, X, C)

        jax.lax.fori_loop(khi, NRK, tbody, None)

        # ---- write L panel back (junk rows above diagonal → 0) ----
        panel[sp] = jnp.where(rowid_nb >= lo, panel[sp], 0.0)
        cp_lout = start(
            panel.at[sp], l_ref.at[:, pl.ds(lo, B)], sems.at[4]
        )

        # ---- T row band: Tp· = −Dinv·(Lrow[:, :lo] @ T[:lo, :lo]) --
        tband[...] = jnp.zeros_like(tband)

        def tb_cp(slot, c, jc):
            return pltpu.make_async_copy(
                t_ref.at[pl.ds(c * ck, ck), pl.ds(jc * ck, ck)],
                tbuf.at[slot],
                sems.at[8 + slot],
            )

        def tb_dma(slot, c, jc):
            tb_cp(slot, c, jc).start()

        @pl.when(nch > 0)
        def _():
            def cbody(c, _):
                njc = c + 1            # T[c-chunk, jc] ≡ 0 for jc > c
                tb_dma(0, c, 0)

                def jcbody(jc, _):
                    slot = jc % 2

                    @pl.when(jc + 1 < njc)
                    def _():
                        tb_dma((jc + 1) % 2, c, jc + 1)

                    tb_cp(slot, c, jc).wait()
                    # rows ≥ lo of t_ref are UNWRITTEN memory — the
                    # zeroed rowbuf lanes cannot kill them (0·NaN =
                    # NaN), so mask the loaded block itself
                    trows = c * ck + jax.lax.broadcasted_iota(
                        jnp.int32, (ck, ck), 0
                    )
                    tblk = jnp.where(trows < lo, tbuf[slot], 0.0)
                    contrib = jax.lax.dot_general(
                        rowbuf[sp, :, pl.ds(c * ck, ck)],
                        tblk,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    )
                    tband[:, pl.ds(jc * ck, ck)] = (
                        tband[:, pl.ds(jc * ck, ck)] + contrib
                    )

                jax.lax.fori_loop(0, njc, jcbody, None)

            jax.lax.fori_loop(0, nch, cbody, None)

            def pmul(jc, _):
                blk = tband[:, pl.ds(jc * ck, ck)]
                tband[:, pl.ds(jc * ck, ck)] = -jax.lax.dot_general(
                    dblk[...], blk,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )

            jax.lax.fori_loop(0, nch, pmul, None)

        tband[:, pl.ds(lo, B)] = dblk[...]
        cp_tout = start(
            tband, t_ref.at[pl.ds(lo, B), :], sems.at[5]
        )
        cp_lout.wait()
        # L column p is now globally visible: prefetch p+1's row band
        # so it overlaps the T-band write and loop turnaround
        @pl.when(p + 1 < P)
        def _():
            rowbuf_dma(p + 1)

        cp_tout.wait()

    jax.lax.fori_loop(0, P, panel_body, None)


def _rolled_supported(n: int) -> bool:
    """Shape contract of the rolled kernel (dispatch-boundary test)."""
    return (
        MAX_FUSED_N < n <= MAX_ROLLED_N
        and n % CHR == 0
        and n % CW == 0
    )


# First hardware contact (r05, real v5e over the tunnel): the rolled
# kernel passed interpret-mode parity but faulted the DEVICE
# ("INTERNAL: TPU backend error") at every n — the cross-iteration
# DMA waits went through a helper that also STARTED, so each wait
# launched a redundant copy and leaked an armed semaphore (see the
# start/wait comment in the kernel body).  A crashed worker takes the
# whole backend down for ~2 min and killed five later bench stages
# before bench.py learned to respawn.  Fixed (wait-only descriptors)
# and re-verified on the chip at n ∈ {1024, 6144, 8192}, both chunk
# settings: errors at f32/f64-mix round-off (≤2.4e-7), clean
# triangles.  PYGPR_ROLLED_HW=0 is the kill-switch if a future
# runtime regresses.
def _rolled_on_hw() -> bool:
    import os

    return os.environ.get("PYGPR_ROLLED_HW", "1") == "1"


def cholesky_inverse_pallas_rolled(
    K: Array, interpret: bool = False, chunk: int = None
):
    """Rolled-loop fused ``(L, T=L⁻¹)`` — any n that is a multiple of
    ``CHR`` (production dispatch uses it above ``MAX_FUSED_N``; tests
    exercise it at small n in interpret mode).

    ``chunk`` sets both the stream row-chunk height and contraction
    width: fatter chunks mean fewer, deeper GEMMs and fewer DMA waits
    for the same total bytes.  Default: 1024 when n allows, else the
    ``CHR`` minimum (512)."""
    n = K.shape[-1]
    if chunk is None:
        chunk = 1024 if n % 1024 == 0 else CHR
    ck = chunk
    assert K.ndim == 2 and n % ck == 0 and n >= 2 * B and n >= ck
    kernel = functools.partial(_chol_inv_kernel_rolled, n, ck)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, n), jnp.float32),
            jax.ShapeDtypeStruct((n, n), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, n, B), jnp.float32),   # panel (ping-pong)
            pltpu.VMEM((2, B, n), jnp.float32),   # rowbuf (ping-pong)
            pltpu.VMEM((B, n), jnp.float32),      # tband
            pltpu.VMEM((ck, B), jnp.float32),     # acc
            pltpu.VMEM((2, ck, ck), jnp.float32),  # sbuf
            pltpu.VMEM((2, ck, ck), jnp.float32),  # tbuf
            pltpu.VMEM((B, B), jnp.float32),      # mblk
            pltpu.VMEM((B, B), jnp.float32),      # dblk
            pltpu.SemaphoreType.DMA((10,)),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(K.astype(jnp.float32))


def cholesky_inverse_pallas(K: Array, interpret: bool = False):
    """Fused ``(L, T=L⁻¹)`` of SPD ``K [n, n]``, n a multiple of 128.

    HBM-resident with a ~2·n·128-float VMEM working set; the fast NLML
    gradient consumes both outputs (K⁻¹ = TᵀT).  Indefinite inputs
    produce NaNs that propagate — the jitter-ladder failure signal.

    n ≤ ``MAX_FUSED_N`` runs the statically-unrolled pipeline; larger
    n (multiple of 512, ≤ ``MAX_ROLLED_N``) the rolled-loop variant
    whose Mosaic compile is flat in n.
    """
    n = K.shape[-1]
    assert K.ndim == 2 and n % B == 0 and n >= 2 * B
    if n > MAX_FUSED_N:
        assert _rolled_supported(n) and (interpret or _rolled_on_hw()), n
        return cholesky_inverse_pallas_rolled(K, interpret=interpret)
    # VMEM working set: 5 panels of n·B f32 (panel + 2-slot colbuf +
    # rowbuf + tband) ≈ 2.5·n KB — callers cap n (ops.linalg dispatch)
    # so this stays under the ~16 MB/core budget
    kernel = functools.partial(_chol_inv_kernel, n)
    L, T = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, n), jnp.float32),
            jax.ShapeDtypeStruct((n, n), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, B), jnp.float32),       # panel
            pltpu.VMEM((2, n, CW), jnp.float32),   # colbuf (2-slot stream)
            pltpu.VMEM((B, n), jnp.float32),       # rowbuf (L row band)
            pltpu.VMEM((B, n), jnp.float32),       # tband (T row band)
            pltpu.VMEM((B, B), jnp.float32),       # mblk (diag factor)
            pltpu.SemaphoreType.DMA((6,)),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # the Mosaic scoped-vmem default is 16 MiB; the statically
            # unrolled panel pipeline's stack plus the 5 n·B panels
            # exceed that from n=4096 up.  v5e VMEM is 128 MiB — raise
            # the cap so the compiler can use the hardware it has.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(K.astype(jnp.float32))
    return L, T
