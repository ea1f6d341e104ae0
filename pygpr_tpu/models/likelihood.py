"""Negative log-marginal-likelihood (NLML) and hyperparameter gradients.

Re-design of the reference loss layer (``PyGPR/loss.py``) for JAX/TPU.

The value follows ``loss.py:49-51`` exactly (a **minimization** target):

    nlml(θ) = ½ yᵀ K⁻¹ y + Σ log diag L + ½ n log 2π,   K = k_θ(x,x) + λI

Two gradient paths are provided:

  * :func:`nlml_value_and_grad` — ``jax.value_and_grad`` through the
    Cholesky.  This is the TPU-first default: reverse-mode AD through
    ``potrf`` costs **O(n³) independent of nhp**, strictly better than
    the reference's analytic path which batch-solves all nhp kernel
    derivatives (O(nhp·n³), ``loss.py:116`` — its hottest op, see
    SURVEY.md §3.2).
  * :func:`nlml_and_grad_analytic` — the reference's closed form
    (``loss.py:92-128``):
    ``∂nlml/∂θ = −½ (wᵀ(∂K/∂θ)w − tr(K⁻¹ ∂K/∂θ))`` with ``w = K⁻¹y``,
    kept for cross-validation of the AD path and for parity tests.

Everything jits; the whole optimizer inner loop stays on-device.  The
numpy seam of the reference (``loss.py:37``, ``:125-128``) survives only
in the :class:`MLE` wrapper used by the SciPy-driver parity mode.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.ops import linalg
from pygpr_tpu.ops.kernels import Kernel

Array = jax.Array


def _nlml_one(kern: Kernel, params, x, y, config: Config) -> Array:
    from pygpr_tpu.ops.kernels import train_gram

    krn = train_gram(kern, params, x, config)
    # Laddered Cholesky: differentiable via the custom rule in
    # ops.linalg, and finite on f32/TPU where fixed 1e-7 jitter fails.
    L = linalg.safe_cholesky(krn, config).chol
    # yᵀK⁻¹y = ‖L⁻¹y‖²: ONE triangular solve instead of the
    # cholesky_solve pair — vector solves are latency-bound on TPU, so
    # this halves the solve cost of the optimizer inner loop.
    z = linalg.solve_lower(L, y)
    n = y.shape[-1]
    return (
        0.5 * jnp.dot(z, z)
        + linalg.half_logdet_from_chol(L)
        + 0.5 * n * math.log(2.0 * math.pi)
    )


def nlml(
    kern: Kernel, params, x, y, config: Config = DEFAULT
) -> Array:
    """NLML, auto-vmapped over a leading committee axis → ``[nc]``.

    The batched form is the corrected version of the reference's
    ``log_likelihood_batched`` (``gr_bcm.py:158-176``), whose
    log-det and constant terms are dangling no-op statements
    (``gr_bcm.py:170-172``) — the intended formula is ``loss.py:49-51``,
    which is what this computes.
    """
    if x.ndim == 3:
        p_ax = 0 if params.ndim == 2 else None
        return jax.vmap(
            lambda p, xx, yy: _nlml_one(kern, p, xx, yy, config),
            in_axes=(p_ax, 0, 0),
        )(params, x, y)
    return _nlml_one(kern, params, x, y, config)


def _nlml_batched_vals(kern, params, x, y, config: Config) -> Array:
    """Batch-visible committee NLML: grams built under vmap but the
    Cholesky sees the full ``[nb, n, n]`` stack, so the jitter ladder
    can route through the batched Pallas kernel (``use_pallas``)."""
    from pygpr_tpu.ops.kernels import train_gram

    grams = jax.vmap(lambda p, xx: train_gram(kern, p, xx, config))(
        params, x
    )
    L = linalg.safe_cholesky(grams, config).chol
    z = linalg.solve_lower(L, y)
    n = y.shape[-1]
    return (
        0.5 * jnp.sum(z * z, axis=-1)
        + linalg.half_logdet_from_chol(L)
        + 0.5 * n * math.log(2.0 * math.pi)
    )


def nlml_value_and_grad(
    kern: Kernel, params, x, y, config: Config = DEFAULT
) -> Tuple[Array, Array]:
    """(nlml, ∂nlml/∂θ), strategy chosen by ``config.grad_mode``:

    ``"fast"`` (default) — the solve-free closed form
    (:func:`_nlml_vg_fast_one`): Cholesky + MXU block-doubling inverse
    + one gram-build VJP.  ``"ad"`` — reverse-mode AD through the
    laddered Cholesky.  Both are O(n³) independent of nhp — the
    TPU-first replacement for the reference's O(nhp·n³) batched-solve
    path (``loss.py:116``).
    """
    if config.grad_mode == "fast" and not (
        config.use_pallas and x.ndim == 3
    ):
        if x.ndim == 3:
            p_ax = 0 if params.ndim == 2 else None
            return jax.vmap(
                lambda p, xx, yy: _nlml_vg_fast_one(
                    kern, p, xx, yy, config
                ),
                in_axes=(p_ax, 0, 0),
            )(params, x, y)
        return _nlml_vg_fast_one(kern, params, x, y, config)
    if x.ndim == 3:
        if config.use_pallas:
            # Batch-visible path: per-expert grads = grad of the sum
            # (experts are independent), one AD pass over the stack.
            nc = x.shape[0]
            p_all = (
                params
                if params.ndim == 2
                else jnp.broadcast_to(params, (nc,) + params.shape)
            )

            def total(p):
                vals = _nlml_batched_vals(kern, p, x, y, config)
                return jnp.sum(vals), vals

            (_, vals), g = jax.value_and_grad(total, has_aux=True)(p_all)
            return vals, g
        p_ax = 0 if params.ndim == 2 else None
        return jax.vmap(
            lambda p, xx, yy: jax.value_and_grad(
                lambda q: _nlml_one(kern, q, xx, yy, config)
            )(p),
            in_axes=(p_ax, 0, 0),
        )(params, x, y)
    return jax.value_and_grad(
        lambda q: _nlml_one(kern, q, x, y, config)
    )(params)


def _nlml_vg_fast_one(kern, params, x, y, config):
    """Closed-form value+gradient with ZERO triangular solves.

    The adjoint of the NLML w.r.t. the gram matrix is
    ``∂nlml/∂K = ½ (K⁻¹ − w wᵀ)``, ``w = K⁻¹ y`` — the reference's two
    trace terms (``loss.py:77-84``) in one matrix.  The gradient is then
    a single VJP through the **gram build only** (O(n²·d), kernel-
    agnostic), never through the factorization.  K⁻¹ comes from the
    MXU block-doubling inverse ``T = L⁻¹`` (ops/linalg.py), so the
    whole O(n³) part is Cholesky + batched GEMMs:

        z = T y   (matvec, replaces the value path's trisolve)
        w = Tᵀ z
        K⁻¹ = Tᵀ T  (one GEMM)

    On TPU this runs at ~batched-matmul throughput, vs the AD path
    whose Cholesky-VJP triangular solves run far off roofline.
    """
    from pygpr_tpu.ops.kernels import train_gram

    krn, gram_vjp = jax.vjp(lambda p: train_gram(kern, p, x, config), params)
    L, T = linalg.chol_and_tri_inverse(krn, config)
    hi = jax.lax.Precision.HIGHEST
    z = jnp.matmul(T, y, precision=hi)
    w = jnp.matmul(T.T, z, precision=hi)
    n = y.shape[-1]
    val = (
        0.5 * jnp.dot(z, z)
        + linalg.half_logdet_from_chol(L)
        + 0.5 * n * math.log(2.0 * math.pi)
    )
    # TᵀT via the triangular block-doubling syrk (~2/3 n³) — the dense
    # GEMM (2n³) was the single largest term of the whole eval
    Kinv = linalg.syrk_from_tril(T)
    Abar = 0.5 * (Kinv - w[:, None] * w[None, :])
    # kernel-provided analytic contraction (matvec-shaped, HBM passes
    # independent of d) when available; AD through the gram build
    # otherwise.  An unsupported kernel returns None at TRACE time, so
    # the probe costs nothing at run time (XLA DCEs the dead branch).
    grad = kern.gram_adjoint(params, x, Abar, config=config)
    if grad is None:
        (grad,) = gram_vjp(Abar)
    return val, grad


def nlml_fast(
    kern: Kernel, params, x, y, config: Config = DEFAULT
) -> Array:
    """NLML whose reverse-mode derivative routes through the
    solve-free closed form (:func:`_nlml_vg_fast_one`) instead of AD
    through the Cholesky — the production objective for on-device
    L-BFGS (optax's line search differentiates the objective itself,
    so the fast path must live in a custom VJP, not a wrapper)."""

    # x/y are PRIMAL arguments (zero cotangent), not closure captures:
    # a custom_vjp that closes over tracers leaks them when the call
    # sits inside another trace (e.g. ``lax.map`` expert streaming).
    @jax.custom_vjp
    def f(p, xx, yy):
        return _nlml_one(kern, p, xx, yy, config)

    def f_fwd(p, xx, yy):
        v, g = _nlml_vg_fast_one(kern, p, xx, yy, config)
        return v, (g, xx, yy)

    def f_bwd(res, ct):
        g, xx, yy = res
        return ct * g, jnp.zeros_like(xx), jnp.zeros_like(yy)

    f.defvjp(f_fwd, f_bwd)

    def one(xx, yy):
        return lambda p: f(p, xx, yy)

    if x.ndim == 3:
        if config.use_pallas:
            # the grid-less fused Pallas kernel must not be vmapped —
            # per-expert matrices use the XLA fast path instead
            import dataclasses

            config = dataclasses.replace(config, use_pallas=False)
        p_ax = 0 if params.ndim == 2 else None
        return jax.vmap(
            lambda p, xx, yy: one(xx, yy)(p), in_axes=(p_ax, 0, 0)
        )(params, x, y)
    return one(x, y)(params)


def _analytic_one(kern, params, x, y, config):
    krn, dkrn = kern.matrix_and_grad(params, x, config=config)
    L = linalg.safe_cholesky(krn, config).chol
    w = linalg.cholesky_solve(L, y)
    n = y.shape[-1]
    val = (
        0.5 * jnp.dot(w, y)
        + linalg.half_logdet_from_chol(L)
        + 0.5 * n * math.log(2.0 * math.pi)
    )
    # tr1ₖ = wᵀ (∂K/∂θₖ) w   (loss.py:79-81, outer-product form)
    tr1 = jnp.einsum("i,kij,j->k", w, dkrn, w)
    # tr2ₖ = tr(K⁻¹ ∂K/∂θₖ)  (loss.py:77, :116 — batched cho-solve)
    kk = jax.vmap(lambda d: linalg.cholesky_solve(L, d))(dkrn)
    tr2 = jnp.trace(kk, axis1=-2, axis2=-1)
    grad = -0.5 * (tr1 - tr2)
    return val, grad


def nlml_and_grad_analytic(
    kern: Kernel, params, x, y, config: Config = DEFAULT
) -> Tuple[Array, Array]:
    """Reference closed-form value+gradient (``loss.py:92-128``)."""
    if x.ndim == 3:
        p_ax = 0 if params.ndim == 2 else None
        return jax.vmap(
            lambda p, xx, yy: _analytic_one(kern, p, xx, yy, config),
            in_axes=(p_ax, 0, 0),
        )(params, x, y)
    return _analytic_one(kern, params, x, y, config)


class MLE:
    """numpy-in / numpy-out loss wrapper, API parity with the reference
    ``MLE`` (``loss.py:31-128``) for SciPy-driver validation runs.

    Caches ``loss_value`` / ``grad_value`` for optimizer callbacks
    (``loss.py:17-18``, ``:55``, ``:125-126``).  The jitted
    value-and-grad closure keeps the heavy math on-device; only the
    1-D hyperparameter vector crosses the host boundary.
    """

    def __init__(self, model, config: Config = DEFAULT, analytic: bool = False):
        self.model = model
        self.config = config
        self.loss_value = None
        self.grad_value = None
        kern = model.cov
        x, y = model.x, model.y
        if analytic:
            self._vg = jax.jit(
                lambda p: nlml_and_grad_analytic(kern, p, x, y, config)
            )
        else:
            self._vg = jax.jit(
                lambda p: nlml_value_and_grad(kern, p, x, y, config)
            )
        self._v = jax.jit(lambda p: nlml(kern, p, x, y, config))

    def _asdev(self, params: np.ndarray):
        return jnp.asarray(params, dtype=self.model.x.dtype)

    def loss(self, params: np.ndarray) -> float:
        val = self._v(self._asdev(params))
        self.loss_value = np.asarray(val)
        return float(val)

    def grad(self, params: np.ndarray) -> np.ndarray:
        _, g = self._vg(self._asdev(params))
        self.grad_value = np.asarray(g)
        return self.grad_value

    def loss_and_grad(self, params: np.ndarray):
        v, g = self._vg(self._asdev(params))
        self.loss_value = np.asarray(v)
        self.grad_value = np.asarray(g)
        return float(v), self.grad_value


def log_likelihood_batched(kern, params, x, y, config: Config = DEFAULT):
    """Parity API for the reference free function
    (``gr_bcm.py:158-176``) — with its bug fixed: the reference's
    log-det and constant terms are dangling no-op statements
    (``gr_bcm.py:170-172``), so it silently returns only the quadratic
    term.  This returns the full batched NLML (``loss.py:49-51``)."""
    return nlml(kern, params, x, y, config)


class Loss:
    """Abstract loss interface (reference ``Loss``, ``loss.py:10-28``)."""

    def __init__(self, model):
        self.model = model
        self.loss_value = None
        self.grad_value = None

    def loss(self, params):
        raise NotImplementedError

    def grad(self, params):
        raise NotImplementedError

    def loss_and_grad(self, params):
        raise NotImplementedError
