"""Exact GP on Cartesian-product grids via Kronecker algebra
(Saatçi 2011, "Scalable inference for structured GP models", ch. 5).

When training inputs form a grid ``X = x⁽¹⁾ × … × x⁽ᴰ⁾`` and the
kernel is a tensor product over dimensions (``ops/kernels.Separable``:
``K = σ²·Π_d φ(ℓ_d|Δx_d|)``), the N×N gram is a Kronecker product of
tiny per-axis factors, ``K = σ²·K₁ ⊗ … ⊗ K_D``, and EXACT inference
costs O(Σ_d G_d³ + N·Σ_d G_d) instead of O(N³):

    K + σₙ²I = (⊗_d Q_d)(σ²·⊗_d Λ_d + σₙ²I)(⊗_d Q_d)ᵀ

from one small symmetric eigendecomposition per axis.  A 256×256 image
grid (N = 65k, dense gram = 34 GB, Cholesky ≈ 10¹⁴ FLOPs) reduces to
two 256³ eigensolves and a handful of [N]-sized elementwise ops.

This is the *exact* complement to SKI (``models/ski.py``): SKI
interpolates scattered data onto an auxiliary grid (approximate,
any data layout); this module is exact but requires the data on the
grid.  The reference has no structured-kernel path of any kind — its
only large-N answer is the grBCM committee (SURVEY.md §5.7).

TPU notes: per-axis eigensolves are small host-of-device ops; the
N-sized work is reshape + ``tensordot`` chains (MXU GEMMs over the
matricized tensor).  Everything jits; hyperparameter gradients flow by
AD through ``eigh`` (distinct grid points ⇒ simple eigenvalues).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.ops.kernels import Separable

Array = jax.Array


def _axis_gram(profile_fn, ls_d: Array, ax: Array) -> Array:
    """1-D correlation matrix φ(ℓ|xᵢ − xⱼ|) for one grid axis [G, G]."""
    r = jnp.abs(ax[:, None] - ax[None, :]) * jnp.abs(ls_d)
    return profile_fn(r)


def _cross_axis(profile_fn, ls_d: Array, xq_d: Array, ax: Array) -> Array:
    """1-D cross-correlation φ(ℓ|x*_d − axis|) → [nq, G]."""
    r = jnp.abs(xq_d[:, None] - ax[None, :]) * jnp.abs(ls_d)
    return profile_fn(r)


def _tucker_apply(mats: Sequence[Array], t: Array, precision) -> Array:
    """(⊗_d M_d)·vec(t) as mode-d products: t ← M_d ×_d t for all d.

    ``mats[d]`` is [G_d', G_d]; ``t`` is [G_1..G_D].  Each step is one
    tensordot (an MXU GEMM on the matricized tensor; HIGHEST precision
    — the default bf16 passes visibly corrupt f32 grid posteriors)."""
    for d, m in enumerate(mats):
        t = jnp.moveaxis(
            jnp.tensordot(m, t, axes=(1, d), precision=precision), 0, d
        )
    return t


def _contract_queries(vecs: Sequence[Array], t: Array, precision) -> Array:
    """Σ_grid t[g₁..g_D]·Π_d vecs[d][q, g_d] → [nq] (per-query full
    contraction; the Kronecker cross-kernel row never materializes)."""
    out = jnp.tensordot(vecs[0], t, axes=(1, 0), precision=precision)
    for v in vecs[1:]:
        out = jnp.einsum("qg,qg...->q...", v, out, precision=precision)
    return out


class KronState(NamedTuple):
    """Factorized grid posterior (immutable pytree)."""

    axes: Tuple[Array, ...]   #: per-dim grid coordinates [G_d]
    params: Array             #: [σ, ℓ₁..ℓ_D, σₙ]
    eigvecs: Tuple[Array, ...]  #: per-dim Q_d [G_d, G_d]
    denom: Array              #: σ²·⊗λ + σₙ² as a [G₁..G_D] tensor
    alpha: Array              #: (K + σₙ²I)⁻¹y as a [G₁..G_D] tensor
    nlml: Array               #: exact negative log marginal likelihood
    ok: Array


def _decompose(kern: Separable, params: Array, axes, y_t: Array,
               config: Config):
    """Shared eigen-machinery: returns (Qs, denom, y_rot, nlml)."""
    sig, sn = params[0], params[-1]
    ls = params[1:-1]
    phi = kern.profile_fn
    qs, lams = [], []
    for d, ax in enumerate(axes):
        lam_d, q_d = jnp.linalg.eigh(_axis_gram(phi, ls[d], ax))
        qs.append(q_d)
        lams.append(jnp.maximum(lam_d, 0.0))   # PSD up to roundoff

    # σ²·⊗λ + σₙ² as a dense [G1..GD] tensor (size N — same as y)
    lam = lams[0]
    for l_d in lams[1:]:
        lam = lam[..., None] * l_d
    denom = jnp.square(sig) * lam + jnp.square(sn)

    y_rot = _tucker_apply([q.T for q in qs], y_t, config.precision)
    n = y_t.size
    nlml = 0.5 * (
        jnp.sum(jnp.square(y_rot) / denom)
        + jnp.sum(jnp.log(denom))
        + n * math.log(2.0 * math.pi)
    )
    return qs, denom, y_rot, nlml


def nlml_kron(
    kern: Separable,
    params: Array,
    axes: Sequence[Array],
    y: Array,
    config: Config = DEFAULT,
) -> Array:
    """Exact NLML of the grid GP — identical value to the dense
    ``likelihood.nlml`` with ``Sum((Separable, WhiteNoise))`` on the
    meshgrid (tested), at O(ΣG³) instead of O(N³).

    ``params = [σ, ℓ₁..ℓ_D, σₙ]``; ``y`` is the [G₁..G_D] grid tensor
    (or flat [N] in C order of ``meshgrid(indexing="ij")``).
    """
    shape = tuple(int(a.shape[0]) for a in axes)
    _, _, _, val = _decompose(
        kern, params, axes, y.reshape(shape), config
    )
    return val


def factorize_kron(
    kern: Separable,
    params: Array,
    axes: Sequence[Array],
    y: Array,
    config: Config = DEFAULT,
) -> KronState:
    """Build the posterior state: α = (⊗Q)(ỹ/denom) in tensor form."""
    shape = tuple(int(a.shape[0]) for a in axes)
    y_t = y.reshape(shape)
    qs, denom, y_rot, val = _decompose(kern, params, axes, y_t, config)
    alpha = _tucker_apply(qs, y_rot / denom, config.precision)
    return KronState(
        axes=tuple(axes), params=params, eigvecs=tuple(qs),
        denom=denom, alpha=alpha, nlml=val,
        ok=jnp.isfinite(val),
    )


def predict_kron(
    kern: Separable,
    state: KronState,
    xq: Array,
    var: str = "diag",
    config: Config = DEFAULT,
):
    """Exact posterior moments at arbitrary (off-grid) queries.

    The cross row k(x*, grid) = σ²·⊗_d φ_d(x*_d) factorizes, so the
    mean is a per-dim contraction of α and the variance a contraction
    of 1/denom with the squared rotated factors — O(N) per query
    batch, never an [nq, N] matrix.
    """
    sig, sn = state.params[0], state.params[-1]
    ls = state.params[1:-1]
    phi = kern.profile_fn
    cross = [
        _cross_axis(phi, ls[d], xq[:, d], ax)
        for d, ax in enumerate(state.axes)
    ]                                                  # [nq, G_d] each
    sig2 = jnp.square(sig)
    mean = sig2 * _contract_queries(cross, state.alpha, config.precision)
    if var == "none":
        return mean, None
    # u = (⊗Qᵀ)k* = σ²·⊗(Q_dᵀφ_d*);  var = k** − Σ u²/denom
    w2 = [
        jnp.square(
            jnp.dot(c, q, precision=config.precision)
        )                                              # [nq, G_d]
        for c, q in zip(cross, state.eigvecs)
    ]
    quad = _contract_queries(w2, 1.0 / state.denom, config.precision)
    v = sig2 - jnp.square(sig2) * quad
    return mean, jnp.maximum(v, jnp.asarray(config.jitter, v.dtype))


class FitKronResult(NamedTuple):
    state: KronState
    params: Array
    nlml: Array
    converged: Array


def fit_kron(
    kern: Separable,
    axes: Sequence[Array],
    y: Array,
    params0: Optional[Array] = None,
    *,
    max_iter: int = 150,
    tol: float = 1e-4,
    config: Config = DEFAULT,
) -> FitKronResult:
    """L-BFGS on the exact grid NLML, log-space (``fit_mle`` policy)."""
    from pygpr_tpu.optimize.lbfgs import minimize_lbfgs

    d = len(axes)
    if params0 is None:
        params0 = jnp.concatenate([
            jnp.ones((d + 1,), y.dtype),
            jnp.full((1,), 0.3, y.dtype),
        ])
    u0 = jnp.log(jnp.abs(params0))

    def objective(u):
        return nlml_kron(kern, jnp.exp(u), axes, y, config)

    res = minimize_lbfgs(objective, u0, max_iter=max_iter, tol=tol)
    p_fit = jnp.exp(res.params)
    state = factorize_kron(kern, p_fit, axes, y, config)
    return FitKronResult(
        state=state, params=p_fit, nlml=state.nlml,
        converged=res.converged,
    )


class KroneckerGP:
    """OO wrapper for grid data.

    >>> gp = KroneckerGP([ax1, ax2], y_grid, profile="rbf")
    >>> gp.train()
    >>> mean, var = gp.predict(xq)
    """

    def __init__(self, axes, y, profile: str = "rbf",
                 params=None, config: Config = DEFAULT):
        self.axes = [jnp.asarray(a) for a in axes]
        self.y = jnp.asarray(y)
        self.cov = Separable(profile)
        self.config = config
        d = len(self.axes)
        self.params = (
            jnp.concatenate([
                jnp.ones((d + 1,), self.y.dtype),
                jnp.full((1,), 0.3, self.y.dtype),
            ]) if params is None else jnp.asarray(params)
        )
        self._state: Optional[KronState] = None

    def train(self, max_iter: int = 150, **kwargs) -> FitKronResult:
        res = fit_kron(
            self.cov, self.axes, self.y, self.params,
            max_iter=max_iter, config=self.config, **kwargs,
        )
        self.params = res.params
        self._state = res.state
        return res

    def update(self) -> KronState:
        if self._state is None:
            self._state = factorize_kron(
                self.cov, self.params, self.axes, self.y, self.config
            )
        return self._state

    def predict(self, xq, var: str = "diag"):
        return predict_kron(
            self.cov, self.update(), jnp.asarray(xq), var, self.config
        )
