"""MFU stage-breakdown probe for the flagship NLML fast path.

``python -m pygpr_tpu.bench.mfu_probe [n ...]`` times, on the real
chip, each stage of the fast-gradient pipeline separately so the
roofline gap (BENCH: ~25% @2048 / ~45% @4096 of the measured dense
ceiling) can be attributed instead of guessed:

  * full fast-path value+grad — Pallas fused kernel and XLA paths
  * the fused Cholesky+inverse kernel alone
  * XLA ``lax.linalg.cholesky`` alone (the stock alternative)
  * the pivot chain alone (a probe kernel running ONLY the per-panel
    [128,128] masked micro-Cholesky loops — the irreducible n
    sequential steps)
  * the block-doubling triangular inverses alone
  * the triangular SYRK (K⁻¹ = TᵀT) alone
  * the gram build + dK VJP GEMMs alone

Each line is chained-execution timed (see bench.py's methodology) and
printed as JSON; results are summarized in docs/mfu.md.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


_LATENCY = None


def _fetch_latency():
    """One warm scalar fetch over the tunnel (~25 ms) — subtracted
    once per measurement round, same as bench.py."""
    global _LATENCY
    if _LATENCY is None:
        import jax
        import jax.numpy as jnp

        f = jax.jit(lambda s: s + 1.0)
        s = jnp.float32(0.0)
        float(f(s))
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            float(f(s))
            ts.append(time.perf_counter() - t0)
        _LATENCY = min(ts)
    return _LATENCY


def _chained_seconds(stepf, init, reps, rounds=6):
    import jax.numpy as jnp

    lat = _fetch_latency()
    jnp.sum(stepf(init)).item()
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        s = init
        for _ in range(reps):
            s = stepf(s)
        jnp.sum(s).item()
        best = min(best, (time.perf_counter() - t0 - lat) / reps)
    return best


def _emit(**rec):
    print(json.dumps(rec), flush=True)


def probe(n: int = 2048, reps: int = 20):
    # sub-ms stages need high rep counts: the tunnel's scalar-fetch
    # latency varies by ~±10 ms between rounds, so a 20-rep chain of a
    # 0.3 ms stage measures noise (even negative after subtraction)
    reps_cheap = max(reps, 120)
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import pygpr_tpu as gp
    from pygpr_tpu.config import Config
    from pygpr_tpu.ops import linalg
    from pygpr_tpu.ops.pallas_cholesky import (
        B,
        _micro_cholesky,
        _tri_inverse,
        cholesky_inverse_pallas,
    )

    rng = np.random.default_rng(0)
    dim = 3
    x = jnp.asarray(rng.uniform(0, 2, (n, dim)).astype(np.float32))
    y = jnp.sin(2.0 * x.sum(-1))
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    p0 = jnp.asarray(np.r_[np.ones(dim + 1), 0.1].astype(np.float32))

    A = rng.standard_normal((n, n)).astype(np.float32)
    K = jnp.asarray(A @ A.T / n + np.eye(n, dtype=np.float32) * 4.0)

    # --- full fast-path value+grad, Pallas and XLA ------------------
    for use_pallas in (True, False):
        cfg = Config(grad_mode="fast", use_pallas=use_pallas)

        def step(p):
            v, g = gp.nlml_value_and_grad(cov, p, x, y, cfg)
            return p + 0.0 * g + 0.0 * v

        t = _chained_seconds(
            jax.jit(step), p0, reps_cheap if n <= 2048 else reps
        )
        fl = (4.0 / 3.0) * n**3
        _emit(
            probe=f"full_fast_vg_{'pallas' if use_pallas else 'xla'}",
            n=n, ms=round(1e3 * t, 3),
            tflops_at_4o3_n3=round(fl / t / 1e12, 2),
        )

    # --- fused Cholesky+inverse kernel alone ------------------------
    def chol_inv_step(M):
        L, T = cholesky_inverse_pallas(M)
        return M + 0.0 * L[0, 0] + 0.0 * T[0, 0]

    t_ci = _chained_seconds(jax.jit(chol_inv_step), K, reps_cheap if n <= 2048 else reps)
    _emit(
        probe="fused_chol_inverse_pallas", n=n,
        ms=round(1e3 * t_ci, 3),
        tflops_at_2o3_n3=round((2.0 / 3.0) * n**3 / t_ci / 1e12, 2),
    )

    # --- XLA cholesky alone -----------------------------------------
    def xla_chol_step(M):
        L = jax.lax.linalg.cholesky(M)
        return M + 0.0 * L[0, 0]

    t_xc = _chained_seconds(jax.jit(xla_chol_step), K, reps_cheap if n <= 2048 else reps)
    _emit(
        probe="xla_cholesky", n=n, ms=round(1e3 * t_xc, 3),
        tflops_at_n3_over_3=round(n**3 / 3.0 / t_xc / 1e12, 2),
    )

    # --- pivot chain alone (per-panel micro-Cholesky only) ----------
    P = n // B

    def _pivots_kernel(a_ref, o_ref):
        for p in range(P):
            lo = p * B
            o_ref[lo : lo + B, :] = _micro_cholesky(
                a_ref[lo : lo + B, :]
            )

    pivots_call = pl.pallas_call(
        _pivots_kernel,
        out_shape=jax.ShapeDtypeStruct((n, B), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    diag_strip = jnp.concatenate(
        [K[i * B : (i + 1) * B, i * B : (i + 1) * B] for i in range(P)],
        axis=0,
    )

    def pivots_step(S):
        out = pivots_call(S)
        return S + 0.0 * out[0, 0]

    t_pv = _chained_seconds(jax.jit(pivots_step), diag_strip, reps_cheap)
    _emit(
        probe="pivot_chain_only", n=n, panels=P,
        ms=round(1e3 * t_pv, 3),
        note="n sequential masked VPU steps; irreducible per matrix",
    )

    # --- triangular inverses alone ----------------------------------
    def _tinv_kernel(a_ref, o_ref):
        for p in range(P):
            lo = p * B
            o_ref[lo : lo + B, :] = _tri_inverse(
                a_ref[lo : lo + B, :]
            )

    tinv_call = pl.pallas_call(
        _tinv_kernel,
        out_shape=jax.ShapeDtypeStruct((n, B), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    tril_strip = jnp.concatenate(
        [
            jnp.tril(K[i * B : (i + 1) * B, i * B : (i + 1) * B])
            + 2.0 * jnp.eye(B)
            for i in range(P)
        ],
        axis=0,
    )

    def tinv_step(S):
        out = tinv_call(S)
        return S + 0.0 * out[0, 0]

    t_ti = _chained_seconds(jax.jit(tinv_step), tril_strip, reps_cheap)
    _emit(
        probe="block_tri_inverse_only", n=n, panels=P,
        ms=round(1e3 * t_ti, 3),
    )

    # --- triangular SYRK (K⁻¹ = TᵀT) alone --------------------------
    T0 = jnp.tril(K) / float(n)

    def syrk_step(Tm):
        S = linalg.syrk_from_tril(Tm)
        return Tm + 0.0 * S[0, 0]

    t_sy = _chained_seconds(jax.jit(syrk_step), T0, reps_cheap)
    _emit(
        probe="syrk_from_tril", n=n, ms=round(1e3 * t_sy, 3),
        tflops_at_2o3_n3=round((2.0 / 3.0) * n**3 / t_sy / 1e12, 2),
    )

    # --- gram build + grad contraction GEMMs alone ------------------
    cfg_p = Config(grad_mode="fast", use_pallas=True)

    def gram_step(p):
        G = cov.matrix(p, x, config=cfg_p)
        return p + 0.0 * G[0, 0]

    t_gr = _chained_seconds(jax.jit(gram_step), p0, reps_cheap)
    _emit(probe="gram_build", n=n, ms=round(1e3 * t_gr, 3))

    # --- residual attribution ---------------------------------------
    _emit(
        probe="attribution", n=n,
        note=(
            "full_pallas ≈ fused_chol_inverse + syrk + gram + "
            "grad-contraction; fused ≈ pivots + tri_inv + "
            "panel GEMMs/DMA"
        ),
    )


if __name__ == "__main__":
    ns = [int(a) for a in sys.argv[1:]] or [2048]
    for n in ns:
        probe(n)
