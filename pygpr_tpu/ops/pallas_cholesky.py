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


def _micro_cholesky(tile: Array) -> Array:
    """Cholesky of one [B, B] block (lower), masked column loop.

    Mosaic has no value-level dynamic_slice, so column extraction and
    write-back are masked whole-tile VPU ops — the B-step pivot chain
    is the irreducible sequential core of the factorization.
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

    def mm(a, b):
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
    return T


def _chol_kernel(n: int, a_ref, out_ref):
    out_ref[0] = a_ref[0]
    P = n // B
    for p in range(P):
        lo = p * B
        hi = lo + B
        D = _micro_cholesky(out_ref[0, lo:hi, lo:hi])
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
        grid_spec=pl.GridSpec(
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
        ),
        cost_estimate=pl.CostEstimate(
            flops=nb * n_pad**3 // 3,
            bytes_accessed=2 * nb * n_pad * n_pad * 4,
            transcendentals=nb * n_pad,
        ),
        interpret=interpret,
    )(K)
    out = out[:, :n, :n]
    return out if batched else out[0]
