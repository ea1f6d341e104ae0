"""Dense linear algebra for GP inference: safe Cholesky + solves.

The reference delegates to LAPACK via torch (``tc.cholesky`` /
``tc.cholesky_solve``, e.g. ``PyGPR/gpr.py:69-72``, ``loss.py:97-116``)
with one fixed jitter of 1e-7 and no failure handling — a failed
factorization raises.  On TPU (f32) near-singular kernel matrices are the
primary runtime failure mode, so this build wraps XLA's Cholesky in an
**escalating jitter ladder** (SURVEY.md §5.3): retry with jitter·10^k
until the factor is finite.  Everything is jit-able and vmap-able (the
ladder loop is a ``lax.while_loop``; under vmap it batches cleanly).

XLA's ``lax.linalg.cholesky`` returns NaNs (not an exception) on an
indefinite input, which is exactly the signal the ladder needs.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from pygpr_tpu.config import DEFAULT, Config

Array = jax.Array


class CholResult(NamedTuple):
    """Result of a jitter-laddered Cholesky factorization."""

    chol: Array      #: lower-triangular factor L, K + jitter·I = L Lᵀ
    jitter: Array    #: jitter actually used — PER MATRIX (batch-shaped)
    ok: Array        #: 1.0/0.0 per matrix — whether any rung succeeded


def add_diag(K: Array, eps) -> Array:
    """K + eps·I without materializing an identity matrix."""
    n = K.shape[-1]
    idx = jnp.arange(n)
    return K.at[..., idx, idx].add(eps)


@partial(jax.custom_jvp, nondiff_argnums=(1,))
def _chol_ladder(K: Array, config: Config):
    """Jitter-laddered Cholesky with a custom differentiation rule.

    The primal escalates jitter·10^k until the factor is finite (a
    ``lax.while_loop`` — not reverse-differentiable on its own).  The
    custom JVP applies the standard Cholesky tangent formula
    (Murray 2016, "Differentiation of the Cholesky decomposition")
    **reusing the already-computed factor L**, so robustness costs the
    gradient path nothing.  The chosen jitter rung is treated as
    locally constant — exact away from rung-switching points.
    """
    dtype = K.dtype
    base = jnp.asarray(config.jitter, dtype)
    rungs = config.jitter_rungs

    def chol_impl(A):
        n = A.shape[-1]
        if config.use_pallas and dtype == jnp.float32:
            from pygpr_tpu.ops import pallas_kernels as pk

            if pk.on_tpu():
                if (
                    A.ndim == 3
                    and A.shape[0] >= 2  # amortization needs a real batch
                    and n % 128 == 0
                    and n >= 256
                ):
                    # batched committee path: pivot chains amortized
                    # across the batch (beats XLA's batched cholesky)
                    from pygpr_tpu.ops.pallas_cholesky import (
                        cholesky_pallas_batched,
                    )

                    return cholesky_pallas_batched(A)
                if A.ndim == 2 and n <= 1024:
                    from pygpr_tpu.ops.pallas_cholesky import (
                        cholesky_pallas,
                    )

                    return cholesky_pallas(A)
        return lax.linalg.cholesky(A)

    # Ladder state is PER MATRIX: an explicitly batched call ([nb, n, n]
    # — the batch-visible Pallas path) escalates each matrix on its own
    # rung, exactly like the vmapped path, so one sick expert cannot
    # inflate every expert's jitter.
    bshape = K.shape[:-2]

    def attempt(k):
        # k: [*bshape] per-matrix rung indices (float, same dtype as K)
        jit_k = base * (10.0**k)
        L = chol_impl(add_diag(K, jit_k[..., None]))
        ok = jnp.all(jnp.isfinite(L), axis=(-2, -1))
        return L, jit_k, ok

    k0 = jnp.zeros(bshape, dtype)
    L0, j0, ok0 = attempt(k0)

    def cond(state):
        k, _, _, ok = state
        return jnp.any(jnp.logical_and(~ok, k < rungs - 1))

    def body(state):
        k, L, j, ok = state
        # Runs while ANY matrix is unconverged; converged matrices keep
        # their rung and factor untouched instead of re-escalating.
        k2 = jnp.where(ok, k, k + 1.0)
        L2, j2, ok2 = attempt(k2)
        keep = ok[..., None, None]
        return (
            k2,
            jnp.where(keep, L, L2),
            jnp.where(ok, j, j2),
            jnp.logical_or(ok, ok2),
        )

    _, L, j, ok = lax.while_loop(cond, body, (k0, L0, j0, ok0))
    return L, j, ok.astype(dtype)


@_chol_ladder.defjvp
def _chol_ladder_jvp(config, primals, tangents):
    (K,) = primals
    (dK,) = tangents
    L, j, ok = _chol_ladder(K, config)
    # dL = L φ(L⁻¹ dK L⁻ᵀ), φ = tril with halved diagonal.
    A = lax.linalg.triangular_solve(
        L, dK, left_side=True, lower=True, transpose_a=False
    )
    W = lax.linalg.triangular_solve(
        L, A.mT, left_side=True, lower=True, transpose_a=False
    ).mT
    Phi = jnp.tril(W) - 0.5 * jnp.diagonal(W, axis1=-2, axis2=-1)[
        ..., None
    ] * jnp.eye(W.shape[-1], dtype=W.dtype)
    dL = jnp.matmul(L, Phi, precision=lax.Precision.HIGHEST)
    zero = jnp.zeros_like(j)
    return (L, j, ok), (dL, zero, jnp.zeros_like(ok))


def safe_cholesky(K: Array, config: Config = DEFAULT) -> CholResult:
    """Cholesky of ``K + jitter·I`` with an escalating jitter ladder.

    Starts at ``config.jitter`` (reference parity: 1e-7 at
    ``PyGPR/gpr.py:68``) and multiplies by 10 on failure, up to
    ``config.jitter_rungs`` rungs.  Cost in the common case is a single
    factorization plus a finite-ness check.  Differentiable (reverse and
    forward) through the factor via the custom rule above — this is what
    keeps the NLML gradient finite on f32/TPU where the base jitter is
    often too small (SURVEY.md §7 "f64→f32").
    """
    return CholResult(*_chol_ladder(K, config))


def cholesky_solve(L: Array, b: Array) -> Array:
    """Solve ``K x = b`` given ``K = L Lᵀ`` (reference
    ``tc.cholesky_solve``, ``PyGPR/gpr.py:70``).

    ``b`` may be a vector ``[n]`` or matrix ``[n, m]``.
    """
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    z = lax.linalg.triangular_solve(
        L, b, left_side=True, lower=True, transpose_a=False
    )
    x = lax.linalg.triangular_solve(
        L, z, left_side=True, lower=True, transpose_a=True
    )
    return x[..., 0] if vec else x


def solve_lower(L: Array, b: Array) -> Array:
    """Solve ``L z = b`` (forward substitution)."""
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    z = lax.linalg.triangular_solve(
        L, b, left_side=True, lower=True, transpose_a=False
    )
    return z[..., 0] if vec else z


def solve_lower_t(L: Array, b: Array) -> Array:
    """Solve ``Lᵀ x = b`` (backward substitution on the lower factor)."""
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    z = lax.linalg.triangular_solve(
        L, b, left_side=True, lower=True, transpose_a=True
    )
    return z[..., 0] if vec else z


def logdet_from_chol(L: Array) -> Array:
    """log|K| = 2 Σ log diag(L)."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)


def half_logdet_from_chol(L: Array) -> Array:
    """Σ log diag(L) — the term the reference uses directly
    (``PyGPR/loss.py:49-51``)."""
    return jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)


def tri_inverse_doubling(L: Array, base: int = 128) -> Array:
    """Lower-triangular inverse by **block doubling** — the TPU-first
    replacement for sequential substitution.

    The MXU runs batched GEMMs at ~30 TFLOP/s (f32 HIGHEST) while XLA's
    triangular solve with n right-hand sides crawls at a fraction of
    that, so instead of solving ``L T = I`` we *build* ``T = L⁻¹``:

      1. invert all n/base diagonal ``base×base`` blocks at once
         (one batched triangular solve — the only non-GEMM step);
      2. log₂(n/base) doubling levels: at block size s every pair
         stitches via ``T₂₁ = −T₂₂ L₂₁ T₁₁`` — two batched [Q, s, s]
         GEMMs per level (Q = n/2s pairs).

    Total ≈ ⅔·n³ flops, all MXU-shaped.  n is padded to base·2ᵏ with an
    identity tail (inverse of ``diag(L, I)`` is ``diag(L⁻¹, I)``).
    Used by the fast NLML gradient (K⁻¹ = TᵀT) and anywhere the
    reference calls ``cholesky_inverse`` on large factors.
    """
    n0 = L.shape[-1]
    P0 = -(-n0 // base)
    P = 1
    while P < P0:
        P *= 2
    n = P * base
    if n != n0:
        pad = n - n0
        L = jnp.pad(L, ((0, pad), (0, pad)))
        tail = (jnp.arange(n) >= n0).astype(L.dtype)
        L = L + jnp.diag(tail)

    hi = jax.lax.Precision.HIGHEST
    idx = jnp.arange(P)
    Lb = L.reshape(P, base, P, base)
    diag_blocks = Lb[idx, :, idx, :]                      # [P, b, b]
    eye = jnp.broadcast_to(
        jnp.eye(base, dtype=L.dtype), (P, base, base)
    )
    Tdiag = lax.linalg.triangular_solve(
        diag_blocks, eye, left_side=True, lower=True
    )
    T = (
        jnp.zeros_like(L)
        .reshape(P, base, P, base)
        .at[idx, :, idx, :]
        .set(Tdiag)
        .reshape(n, n)
    )

    s = base
    while s < n:
        Q = n // (2 * s)
        even = jnp.arange(Q) * 2
        odd = even + 1
        Ls = L.reshape(2 * Q, s, 2 * Q, s)
        Ts = T.reshape(2 * Q, s, 2 * Q, s)
        B21 = Ls[odd, :, even, :]                         # [Q, s, s]
        T11 = Ts[even, :, even, :]
        T22 = Ts[odd, :, odd, :]
        X = -jnp.matmul(
            T22, jnp.matmul(B21, T11, precision=hi), precision=hi
        )
        T = Ts.at[odd, :, even, :].set(X).reshape(n, n)
        s *= 2
    return T[:n0, :n0] if n != n0 else T


def syrk_from_tril(T: Array, base: int = 512) -> Array:
    """``C = Tᵀ T`` for **lower-triangular** ``T`` — the LAPACK
    ``lauum`` analogue, as a static recursion of large contiguous
    GEMMs.

    A dense GEMM pays 2n³ flops; the triangular structure admits the
    recursion (for ``T = [[T11, 0], [T21, T22]]``)::

        TᵀT = [[T11ᵀT11 + T21ᵀT21,  (T22ᵀT21)ᵀ],
               [ T22ᵀT21,            T22ᵀT22  ]]

    Each level replaces one m-GEMM (2m³) with two (m/2)-GEMMs + two
    recursive halves: cost(m) = m³/2 + 2·cost(m/2) → ≈ ⅔·n³ at depth
    log(n/base).  All slices are static and contiguous (an earlier
    block-*doubling* variant used strided gathers/scatters and lost
    its flop advantage to data movement on the MXU pipeline).  Works
    for any n (uneven halves recurse fine; tiles ≤ ``base`` go dense).

    Used by the fast NLML gradient (``K⁻¹ = TᵀT`` with ``T = L⁻¹``),
    where the dense product was the single largest term of the eval.
    """
    hi = jax.lax.Precision.HIGHEST

    def rec(Ts):
        m = Ts.shape[-1]
        if m <= base:
            return jnp.matmul(Ts.T, Ts, precision=hi)
        h = m // 2
        T11, T21, T22 = Ts[:h, :h], Ts[h:, :h], Ts[h:, h:]
        C11 = rec(T11) + jnp.matmul(T21.T, T21, precision=hi)
        C21 = jnp.matmul(T22.T, T21, precision=hi)
        C22 = rec(T22)
        top = jnp.concatenate([C11, C21.T], axis=-1)
        bot = jnp.concatenate([C21, C22], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    return rec(T)


def chol_and_tri_inverse(K: Array, config: Config = DEFAULT):
    """``(L, T=L⁻¹)`` of ``K + jitter·I`` under the escalating ladder.

    On TPU with ``config.use_pallas`` and an aligned single matrix this
    runs the fused HBM-streaming Pallas kernel
    (``pallas_cholesky.cholesky_inverse_pallas``) — one sweep computes
    the factor AND its inverse, the row of L still in VMEM when the T
    GEMM needs it.  Otherwise: laddered XLA Cholesky + the MXU
    block-doubling inverse.  Value-only consumers should keep calling
    :func:`safe_cholesky`; this is the fast-gradient path's primitive.
    """
    n = K.shape[-1]
    if (
        config.use_pallas
        and K.ndim == 2
        and K.dtype == jnp.float32
        and n % 128 == 0
        and n >= 256
    ):
        from pygpr_tpu.ops import pallas_kernels as pk

        if pk.on_tpu():
            from pygpr_tpu.ops.pallas_cholesky import (
                MAX_FUSED_N,
                _rolled_on_hw,
                _rolled_supported,
                cholesky_inverse_pallas,
            )

            if n > MAX_FUSED_N and not (
                _rolled_supported(n) and _rolled_on_hw()
            ):
                # neither the unrolled nor the (hardware-gated, see
                # pallas_cholesky._rolled_on_hw) rolled fused kernel
                # covers this n → XLA path
                L = safe_cholesky(K, config).chol
                return L, tri_inverse_doubling(L)

            base = jnp.asarray(config.jitter, K.dtype)
            rungs = config.jitter_rungs

            def attempt(k):
                L, T = cholesky_inverse_pallas(
                    add_diag(K, base * (10.0**k))
                )
                return L, T, jnp.all(jnp.isfinite(L))

            L0, T0, ok0 = attempt(jnp.asarray(0.0, K.dtype))

            def cond(st):
                k, _, _, ok = st
                return jnp.logical_and(~ok, k < rungs - 1)

            def body(st):
                k, L, T, ok = st
                L2, T2, ok2 = attempt(k + 1.0)
                return (
                    k + 1.0,
                    jnp.where(ok, L, L2),
                    jnp.where(ok, T, T2),
                    ok | ok2,
                )

            _, L, T, _ = lax.while_loop(
                cond, body, (jnp.asarray(0.0, K.dtype), L0, T0, ok0)
            )
            return L, T
    L = safe_cholesky(K, config).chol
    return L, tri_inverse_doubling(L)


def inv_from_chol(L: Array) -> Array:
    """K⁻¹ from its Cholesky factor (reference ``tc.cholesky_inverse``,
    ``PyGPR/gr_bcm.py:112``)."""
    n = L.shape[-1]
    eye = jnp.eye(n, dtype=L.dtype)
    eye = jnp.broadcast_to(eye, L.shape[:-2] + (n, n))
    return cholesky_solve(L, eye)


def spd_solve(
    K: Array, b: Array, config: Config = DEFAULT
) -> Array:
    """One-shot SPD solve with the jitter ladder."""
    res = safe_cholesky(K, config)
    return cholesky_solve(res.chol, b)
