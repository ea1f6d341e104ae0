"""Warped Gaussian processes (Snelson, Rasmussen & Ghahramani,
NeurIPS 2003): learn a monotone observation warp jointly with the GP.

The reference models observations as directly Gaussian
(``/root/reference/PyGPR/loss.py:49-51``); real targets are often
skewed/heavy-tailed/bounded-below.  A warped GP puts the Gaussian
process on a latent ``z = g(y)`` with a *learned* monotone map g and
maximizes the exact marginal likelihood of the observed y, which is
the Gaussian NLML of the warped targets **plus the change-of-variables
Jacobian**:

    −log p(y|X,θ,ψ) = nlml(g_ψ(y); K_θ) − Σᵢ log g′_ψ(yᵢ)

Everything downstream of the warp reuses the existing exact-GP stack
unchanged (``models/likelihood.nlml``, ``models/exact_gp``): the warp
is a pure, cheap, elementwise bijection, so the hot path is still one
gram + Cholesky and the joint fit is the same log-space L-BFGS.

Warp families:

  * :class:`TanhWarp` — the paper's neural-net-style sum
    ``g(y) = y + Σₐ αₐ tanh(βₐ(y + cₐ))`` with α, β ≥ 0 (softplus
    parameterized), strictly increasing with g′ ≥ 1 — which makes the
    Newton inversion in :func:`predict_warped` globally convergent
    with a static iteration count (jit-friendly; no bisection).
  * :class:`LogWarp` — fixed ``g(y) = log y`` for positive targets
    (the zero-parameter log-normal special case).

Observation-space prediction pushes the latent Gaussian back through
g⁻¹: the **median** is exactly ``g⁻¹(μ)`` (monotone maps commute with
quantiles), and mean/variance come from 32-node Gauss-Hermite over the
latent marginal.  NLPD in y-space is closed form:
``−log p(y*) = −log N(g(y*); μ, σ²) − log g′(y*)``.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.models import exact_gp
from pygpr_tpu.models.likelihood import nlml as gaussian_nlml
from pygpr_tpu.ops.kernels import Kernel

Array = jax.Array

_GH_X, _GH_W = np.polynomial.hermite.hermgauss(32)


class TanhWarp:
    """``g(y) = y + Σₐ softplus(a)·tanh(softplus(b)·(y + c))`` — the
    Snelson et al. warp with unconstrained parameters ``[a, b, c]``
    per term, ``n_terms`` terms (flat layout ``[3·n_terms]``)."""

    def __init__(self, n_terms: int = 3):
        self.n_terms = n_terms

    @property
    def n_params(self) -> int:
        return 3 * self.n_terms

    def init_params(self, y: Array) -> Array:
        """Small near-identity start, centers spread over the data
        range (host NumPy — init is data prep, not traced)."""
        y_h = np.asarray(y)
        c = -np.quantile(y_h, np.linspace(0.2, 0.8, self.n_terms))
        a = np.full(self.n_terms, -2.0)   # softplus ≈ 0.13: gentle
        b = np.full(self.n_terms, 0.0)    # softplus(0) ≈ 0.69
        return jnp.asarray(
            np.stack([a, b, c], -1).ravel(), dtype=y.dtype
        )

    def _abc(self, wp: Array):
        w = wp.reshape(self.n_terms, 3)
        return jax.nn.softplus(w[:, 0]), jax.nn.softplus(w[:, 1]), w[:, 2]

    def forward(self, wp: Array, y: Array) -> Array:
        a, b, c = self._abc(wp)
        return y + jnp.sum(
            a * jnp.tanh(b * (y[..., None] + c)), axis=-1
        )

    def deriv(self, wp: Array, y: Array) -> Array:
        """g′(y) = 1 + Σ a·b·sech²(b(y+c)) ≥ 1."""
        a, b, c = self._abc(wp)
        s = 1.0 / jnp.cosh(b * (y[..., None] + c))
        return 1.0 + jnp.sum(a * b * s * s, axis=-1)

    def inverse(self, wp: Array, z: Array, n_bisect: int = 60) -> Array:
        """g⁻¹ by guarded bisection + Newton polish.

        |g(y) − y| ≤ A = Σₐ αₐ gives the certain bracket
        ``y* ∈ [z − A, z + A]``, so ``n_bisect`` halvings shrink it to
        2A·2^{-60} ≈ machine epsilon deterministically — pure Newton
        from y₀ = z can oscillate when the fitted warp is sharp (g′
        varies over orders of magnitude across the bracket).  Two
        final Newton steps square the remaining error.  Fully
        vectorized and branchless (jit/vmap-safe)."""
        a, _, _ = self._abc(wp)
        amp = jnp.sum(a)
        lo, hi = z - amp, z + amp

        def body(carry, _):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            too_big = self.forward(wp, mid) > z
            return (
                jnp.where(too_big, lo, mid),
                jnp.where(too_big, mid, hi),
            ), None

        (lo, hi), _ = jax.lax.scan(body, (lo, hi), None,
                                   length=n_bisect)
        y = 0.5 * (lo + hi)
        for _ in range(2):
            y = y - (self.forward(wp, y) - z) / self.deriv(wp, y)
        return y


class LogWarp:
    """Fixed ``g(y) = log y`` (log-normal observations, y > 0)."""

    n_params = 0

    def init_params(self, y: Array) -> Array:
        return jnp.zeros((0,), y.dtype)

    def forward(self, wp: Array, y: Array) -> Array:
        return jnp.log(y)

    def deriv(self, wp: Array, y: Array) -> Array:
        return 1.0 / y

    def inverse(self, wp: Array, z: Array, n_newton: int = 0) -> Array:
        return jnp.exp(z)


class IdentityWarp:
    """``g(y) = y`` — reduces the warped GP to the plain exact GP
    exactly (the parity anchor the tests pin)."""

    n_params = 0

    def init_params(self, y: Array) -> Array:
        return jnp.zeros((0,), y.dtype)

    def forward(self, wp: Array, y: Array) -> Array:
        return y

    def deriv(self, wp: Array, y: Array) -> Array:
        return jnp.ones_like(y)

    def inverse(self, wp: Array, z: Array, n_newton: int = 0) -> Array:
        return z


def nlml_warped(
    kern: Kernel,
    params: Array,
    warp,
    wp: Array,
    x: Array,
    y: Array,
    config: Config = DEFAULT,
) -> Array:
    """Exact warped-GP negative log marginal likelihood."""
    z = warp.forward(wp, y)
    jac = jnp.sum(jnp.log(warp.deriv(wp, y)))
    return gaussian_nlml(kern, params, x, z, config) - jac


def factorize_warped(
    kern: Kernel,
    params: Array,
    warp,
    wp: Array,
    x: Array,
    y: Array,
    config: Config = DEFAULT,
) -> exact_gp.GPState:
    """Exact-GP state on the warped targets z = g(y) — everything in
    ``models/exact_gp`` (serving, online extension, …) applies."""
    return exact_gp.factorize(kern, params, x, warp.forward(wp, y),
                              config)


def predict_warped(
    kern: Kernel,
    state: exact_gp.GPState,
    warp,
    wp: Array,
    xp: Array,
    config: Config = DEFAULT,
) -> Tuple[Array, Array, Array]:
    """Observation-space prediction: ``(mean, var, median)``.

    Latent moments come from the standard exact-GP predict; the
    median maps through g⁻¹ exactly, mean/variance by Gauss-Hermite
    over the latent Gaussian (closed forms do not exist for the tanh
    warp)."""
    mu, var = exact_gp.predict(kern, state, xp, "diag", config)
    median = warp.inverse(wp, mu)
    xg = jnp.asarray(_GH_X, mu.dtype)
    wg = jnp.asarray(_GH_W / math.sqrt(math.pi), mu.dtype)
    zs = mu[..., None] + jnp.sqrt(2.0 * var)[..., None] * xg  # [q, H]
    ys = warp.inverse(wp, zs)
    mean = jnp.sum(wg * ys, axis=-1)
    e2 = jnp.sum(wg * ys * ys, axis=-1)
    return mean, jnp.maximum(e2 - mean**2, 0.0), median


def nlpd_warped(
    kern: Kernel,
    state: exact_gp.GPState,
    warp,
    wp: Array,
    xp: Array,
    yp: Array,
    config: Config = DEFAULT,
) -> Array:
    """Mean observation-space negative log predictive density —
    exact via change of variables (no quadrature)."""
    mu, var = exact_gp.predict(kern, state, xp, "diag", config)
    z = warp.forward(wp, yp)
    lp = (
        -0.5 * jnp.log(2.0 * jnp.asarray(math.pi, mu.dtype) * var)
        - (z - mu) ** 2 / (2.0 * var)
        + jnp.log(warp.deriv(wp, yp))
    )
    return -jnp.mean(lp)


class FitWarpedResult(NamedTuple):
    state: exact_gp.GPState
    params: Array        #: fitted kernel hyperparameters
    warp_params: Array   #: fitted warp parameters
    nlml: Array
    converged: Array


def fit_warped(
    kern: Kernel,
    warp,
    x: Array,
    y: Array,
    params0: Optional[Array] = None,
    wp0: Optional[Array] = None,
    *,
    max_iter: int = 150,
    tol: float = 1e-4,
    config: Config = DEFAULT,
) -> FitWarpedResult:
    """Joint L-BFGS over log-kernel-parameters and raw warp parameters
    (warp parameters are already unconstrained via softplus)."""
    from pygpr_tpu.optimize.lbfgs import minimize_lbfgs

    if params0 is None:
        params0 = kern.init_params(x, config)
    if wp0 is None:
        wp0 = warp.init_params(y)
    nk = params0.shape[0]
    u0 = jnp.concatenate([jnp.log(jnp.abs(params0)), wp0])

    def objective(u):
        return nlml_warped(
            kern, jnp.exp(u[:nk]), warp, u[nk:], x, y, config
        )

    res = minimize_lbfgs(objective, u0, max_iter=max_iter, tol=tol)
    p_fit = jnp.exp(res.params[:nk])
    wp_fit = res.params[nk:]
    state = factorize_warped(kern, p_fit, warp, wp_fit, x, y, config)
    return FitWarpedResult(
        state=state, params=p_fit, warp_params=wp_fit,
        nlml=res.value, converged=res.converged,
    )


class WarpedGP:
    """OO wrapper in the house style.

    >>> gp = WarpedGP(x, y, Sum((RBF(), WhiteNoise())), TanhWarp(3))
    >>> gp.train()
    >>> mean, var, median = gp.predict(xs)
    """

    def __init__(self, x, y, cov: Kernel, warp=None,
                 config: Config = DEFAULT):
        self.x = jnp.asarray(x)
        self.y = jnp.asarray(y)
        self.cov = cov
        self.warp = TanhWarp(3) if warp is None else warp
        self.config = config
        self.params = cov.init_params(self.x, config)
        self.warp_params = self.warp.init_params(self.y)
        self._state: Optional[exact_gp.GPState] = None

    def train(self, max_iter: int = 150, **kwargs) -> FitWarpedResult:
        res = fit_warped(
            self.cov, self.warp, self.x, self.y,
            self.params, self.warp_params,
            max_iter=max_iter, config=self.config, **kwargs,
        )
        self.params, self.warp_params = res.params, res.warp_params
        self._state = res.state
        return res

    def update(self) -> exact_gp.GPState:
        if self._state is None:
            self._state = factorize_warped(
                self.cov, self.params, self.warp, self.warp_params,
                self.x, self.y, self.config,
            )
        return self._state

    def predict(self, xp):
        return predict_warped(
            self.cov, self.update(), self.warp, self.warp_params,
            jnp.asarray(xp), self.config,
        )
