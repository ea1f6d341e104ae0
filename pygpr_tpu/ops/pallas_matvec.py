"""Pallas TPU kernel: fused RBF gram **matvec** — K is never stored.

The Krylov engine (``models/iterative.py``) is bandwidth-bound: its
XLA path materializes each ``[block, n]`` gram tile to HBM (the exp is
a separate fusion from the GEMM that consumes it), so every matvec
costs two full HBM passes over block·n floats.  This kernel keeps the
tile in VMEM — distance (MXU) → exp (VPU) → tile@V (MXU) — and writes
only the ``[n, k]`` result:

    HBM read:  xl (n·d), V (n·k per column tile)      ≈ n·(d+k) floats
    HBM write: out (n·k)                              ≈ n·k floats

vs ``n²`` floats for the materialized tile stream — an O(n/(d+k))
traffic reduction, which is the whole game for a matvec.

The custom VJP is exact and itself matvec-only: all parameter/input
cotangents reduce to one extra fused matvec with batched columns
``[W̄, x_m∘V, x²_m∘V, x_m∘W̄]`` (see ``_bwd``), so the Hutchinson
gradient surrogate can run on the fused path too.

Signal kernel only (RBF, reference parameterization ``covar.py:84-206``)
— the caller adds the σₙ²+jitter diagonal term as ``+ sn2·v``, matching
``models/iterative.py::gram_matvec``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TILE = 512
LANES = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _matvec_kernel(xr_ref, xc_ref, r2_ref, c2_ref, sig2_ref, v_ref, out_ref):
    """out[i-tile] (+)= σ² exp(−‖xrᵢ − xcⱼ‖²) @ v[j-tile].

    Grid = (row tiles, col tiles) with the column axis innermost; the
    output tile is revisited across j and accumulated in place (VMEM),
    written back to HBM once per row tile.
    """
    j = pl.program_id(1)
    g = jax.lax.dot_general(
        xr_ref[:],
        xc_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    sqd = jnp.maximum(r2_ref[:] + c2_ref[:] - 2.0 * g, 0.0)
    tile = sig2_ref[0, 0] * jnp.exp(-sqd)               # [TILE, TILE]
    contrib = jax.lax.dot_general(
        tile,
        v_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _():
        out_ref[:] = contrib

    @pl.when(j != 0)
    def _():
        out_ref[:] = out_ref[:] + contrib


def _matvec_pallas(xl: Array, sig2: Array, v: Array) -> Array:
    """Raw fused K(xl)·v: xl [n, d] ℓ-scaled, v [n, k] → [n, k]."""
    n, d = xl.shape
    k = v.shape[1]
    n_pad = _cdiv(n, TILE) * TILE
    k_pad = _cdiv(k, LANES) * LANES
    if n_pad != n:
        xl = jnp.pad(xl, ((0, n_pad - n), (0, 0)))
    # zero-padded v rows/cols contribute exactly zero to real rows
    v = jnp.pad(v, ((0, n_pad - n), (0, k_pad - k)))
    x2 = jnp.sum(xl * xl, axis=1)
    r2 = x2[:, None]
    c2 = x2[None, :]
    grid = (n_pad // TILE, n_pad // TILE)
    out = pl.pallas_call(
        _matvec_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, k_pad), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (TILE, d), lambda i, j: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (TILE, d), lambda i, j: (j, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (TILE, 1), lambda i, j: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, TILE), lambda i, j: (0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1), lambda i, j: (0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (TILE, k_pad), lambda i, j: (j, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (TILE, k_pad), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * n_pad * (d + k_pad),
            bytes_accessed=(
                2 * n_pad * d * 4
                + grid[0] * n_pad * k_pad * 4
                + n_pad * k_pad * 4
            ),
            transcendentals=n_pad * n_pad,
        ),
    )(xl, xl, r2, c2, sig2.reshape(1, 1), v)
    return out[:n, :k]


@jax.custom_vjp
def rbf_gram_matvec(theta: Array, x: Array, v: Array) -> Array:
    """Fused ``K_RBF(x, x) @ v`` on TPU — the gram never exists.

    ``theta = [σ, ℓ₁..ℓ_d]`` (signal kernel only; add the noise term
    outside).  ``v: [n, k]``.  Differentiable in all three arguments —
    the VJP below is exact and costs one extra fused matvec.
    """
    sig, ls = theta[0], theta[1:]
    return _matvec_pallas(x * ls, jnp.square(sig), v)


def _fwd(theta, x, v):
    out = rbf_gram_matvec(theta, x, v)
    return out, (theta, x, v, out)


def _bwd(res, wbar):
    theta, x, v, out = res
    sig, ls = theta[0], theta[1:]
    n, d = x.shape
    k = v.shape[1]
    hp = jax.lax.Precision.HIGHEST

    # One fused matvec with batched columns gives every cotangent:
    #   K W̄ (→ v̄), K(x_m∘V), K(x²_m∘V) (→ ℓ̄), K(x_m∘W̄) (→ x̄)
    xm = x[:, :, None]                                   # [n, d, 1]
    cols = jnp.concatenate(
        [
            wbar,
            (xm * v[:, None, :]).reshape(n, d * k),
            (jnp.square(xm) * v[:, None, :]).reshape(n, d * k),
            (xm * wbar[:, None, :]).reshape(n, d * k),
        ],
        axis=1,
    )
    big = _matvec_pallas(x * ls, jnp.square(sig), cols)
    vbar = big[:, :k]
    kxv = big[:, k : k + d * k].reshape(n, d, k)
    kx2v = big[:, k + d * k : k + 2 * d * k].reshape(n, d, k)
    kxw = big[:, k + 2 * d * k :].reshape(n, d, k)

    # ∂K/∂σ = 2K/σ  ⇒  σ̄ = (2/σ)·Σ W̄∘out            (covar.py:189)
    sig_bar = (2.0 / sig) * jnp.sum(wbar * out)

    # ∂K/∂ℓ_m = −2ℓ_m (x_m−x'_m)² K                    (covar.py:191-199)
    # (x−x')² = x² − 2xx' + x'², each term one contraction:
    t1 = jnp.einsum("nk,nk,nd->d", wbar, out, jnp.square(x), precision=hp)
    t2 = jnp.einsum("nk,nd,ndk->d", wbar, x, kxv, precision=hp)
    t3 = jnp.einsum("nk,ndk->d", wbar, kx2v, precision=hp)
    ls_bar = -2.0 * ls * (t1 - 2.0 * t2 + t3)

    # x̄ from both the row and column occurrences of x in K:
    r = jnp.sum(wbar * out, axis=1)                     # Σ_k W̄∘(KV)
    c = jnp.sum(v * vbar, axis=1)                       # Σ_k V∘(KW̄)
    term_r = jnp.einsum("nk,ndk->nd", wbar, kxv, precision=hp)
    term_c = jnp.einsum("nk,ndk->nd", v, kxw, precision=hp)
    x_bar = (
        -2.0
        * jnp.square(ls)[None, :]
        * (x * (r + c)[:, None] - term_r - term_c)
    )

    theta_bar = jnp.concatenate([sig_bar[None], ls_bar])
    return theta_bar, x_bar, vbar


rbf_gram_matvec.defvjp(_fwd, _bwd)


def supported(kern, x: Array) -> bool:
    """True iff the fused path implements ``kern`` exactly: a bare
    :class:`~pygpr_tpu.ops.kernels.RBF` signal kernel in f32."""
    from pygpr_tpu.ops.kernels import RBF

    return type(kern) is RBF and x.dtype == jnp.float32
