"""Global configuration for the TPU-native GP engine.

The reference (PyGPR) hard-codes its numerical policy as module-level
globals: float64 everywhere (``PyGPR/gpr.py:10`` et al.), a fixed Cholesky
jitter of 1e-7 (``PyGPR/gpr.py:68``, ``PyGPR/loss.py:38``), and a
White-noise init of 1e-4 (``PyGPR/covar.py:224``).  TPUs have no f64
hardware, so this build replaces the hidden globals with one frozen,
hashable config object that can be passed through jit boundaries as a
static argument.

Policy:
  * On CPU (tests, parity harness) enable x64 and run the reference math
    bit-for-bit in f64.
  * On TPU run f32 with ``precision=HIGHEST`` matmuls (6-pass bf16
    emulation on the MXU, near-f32 accuracy) and an escalating jitter
    ladder to absorb the conditioning loss.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Config:
    """Frozen numerical policy. Hashable => usable as a jit static arg."""

    #: Base jitter added to kernel diagonals before Cholesky.
    #: Parity with the reference's 1e-7 (PyGPR/gpr.py:68).
    jitter: float = 1e-7

    #: Number of rungs in the escalating jitter ladder: on a failed
    #: factorization retry with jitter * 10**k, k = 0..rungs-1.
    #: (The reference has no ladder; failed Cholesky just raises.)
    #: 7 rungs reach 1e-1: heavy-tailed kernels (RationalQuadratic at
    #: its all-ones init) build f32 grams with min-eig ≈ −2e-4 where
    #: the 1e-3 rung is not enough margin for the TPU Cholesky.  Rungs
    #: beyond the first engage only after a failed factorization, so
    #: the depth costs nothing in the common case.
    jitter_rungs: int = 7

    #: Matmul precision for kernel builds and solves on TPU.
    #: "highest" => full f32-equivalent accuracy on the MXU.
    matmul_precision: str = "highest"

    #: White-noise kernel parameter init (PyGPR/covar.py:224).
    noise_init: float = 1e-4

    #: Use the fused Pallas gram kernel (ops/pallas_kernels.py) for the
    #: canonical RBF+WhiteNoise kernel on TPU.  Exact to the XLA path
    #: and faster steady-state (single HBM pass), but Mosaic compilation
    #: over a remote-TPU tunnel costs minutes per process, so default
    #: off; flip on for long-running production fits on real TPU hosts.
    use_pallas: bool = False

    #: Hyperparameter-gradient strategy for the NLML:
    #:   "fast" (default) — closed-form gradient with ZERO triangular
    #:     solves: L⁻¹ is built by MXU block doubling
    #:     (ops/linalg.py::tri_inverse_doubling), K⁻¹ = TᵀT is one GEMM
    #:     and each ∂/∂θₖ is an O(n²) elementwise contraction.  On TPU
    #:     the whole gradient runs at batched-GEMM throughput instead of
    #:     the crawling XLA Cholesky-VJP triangular solves.
    #:   "ad" — reverse-mode AD through the laddered Cholesky
    #:     (O(n³) regardless of nhp; the conservative fallback).
    grad_mode: str = "fast"

    @property
    def precision(self) -> jax.lax.Precision:
        return {
            "default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST,
        }[self.matmul_precision]

    def jitter_ladder(self, dtype) -> Tuple[float, ...]:
        base = self.jitter
        if jnp.dtype(dtype) == jnp.float32:
            # f32 needs a larger floor to survive round-off in the
            # kernel build; keep the first rung at parity value anyway.
            pass
        return tuple(base * (10.0**k) for k in range(self.jitter_rungs))


#: Default global config (parity values).
DEFAULT = Config()


def default_dtype() -> jnp.dtype:
    """f64 when x64 is enabled (CPU parity mode), else f32 (TPU)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
