"""Hyperparameter priors — MAP estimation and informed MCMC.

Beyond the reference (pure MLE through SciPy drivers,
``/root/reference/PyGPR/opt.py:50-57``): independent priors over the
positive hyperparameters θ = [σ, ℓ…, σₙ], usable two ways:

  * **MAP fit** (:func:`pygpr_tpu.optimize.lbfgs.fit_map`): minimize
    ``nlml(θ) − Σᵢ log pᵢ(θᵢ)`` with the same on-device L-BFGS as
    ``fit_mle`` — regularized model selection that keeps small-n fits
    out of degenerate modes (noise→0 interpolation, lengthscale→∞
    constant).  The MAP point is defined in θ-space; the optimizer may
    still search in u = log θ (a re-parameterized search finds the same
    θ-space stationary point — no Jacobian enters an *optimum*).
  * **MCMC posteriors** (``sample_posterior(..., priors=…)``): the
    samplers draw u = log θ, so the θ-space prior picks up the
    change-of-variables Jacobian ``|dθ/du| = e^u``:
    ``log p(u) = log p_θ(e^u) + Σ u`` — handled by
    :func:`log_prior_u`.

All densities are pure jittable functions of θ (dtype follows the
input); parameters are Python floats baked into the trace.  ``None``
entries mean improper-flat (no contribution) so a prior can target a
single hyperparameter (e.g. just the noise floor).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = [
    "Prior",
    "LogNormal",
    "Gamma",
    "HalfNormal",
    "Uniform",
    "log_prior",
    "log_prior_u",
]


class Prior:
    """Scalar prior over one positive hyperparameter θᵢ > 0."""

    def log_prob(self, theta: Array) -> Array:  # pragma: no cover
        raise NotImplementedError


class LogNormal(Prior):
    """``log θ ~ N(mu, sigma²)`` — the workhorse for scales: strictly
    positive, log-symmetric, mode at ``exp(mu − sigma²)``."""

    def __init__(self, mu: float = 0.0, sigma: float = 1.0):
        if sigma <= 0:
            raise ValueError("sigma must be positive")
        self.mu = float(mu)
        self.sigma = float(sigma)

    def log_prob(self, theta: Array) -> Array:
        lt = jnp.log(theta)
        z = (lt - self.mu) / self.sigma
        return (
            -0.5 * z * z
            - lt
            - math.log(self.sigma)
            - 0.5 * math.log(2.0 * math.pi)
        )


class Gamma(Prior):
    """``θ ~ Gamma(concentration a, rate b)``; mode ``(a−1)/b`` for
    a > 1.  GPyTorch's default kernel-scale prior family."""

    def __init__(self, concentration: float = 2.0, rate: float = 1.0):
        if concentration <= 0 or rate <= 0:
            raise ValueError("concentration and rate must be positive")
        self.a = float(concentration)
        self.b = float(rate)

    def log_prob(self, theta: Array) -> Array:
        return (
            self.a * math.log(self.b)
            - math.lgamma(self.a)
            + (self.a - 1.0) * jnp.log(theta)
            - self.b * theta
        )


class HalfNormal(Prior):
    """``θ ~ |N(0, scale²)|`` — shrinks toward 0 without forbidding it;
    the usual weakly-informative noise prior."""

    def __init__(self, scale: float = 1.0):
        if scale <= 0:
            raise ValueError("scale must be positive")
        self.scale = float(scale)

    def log_prob(self, theta: Array) -> Array:
        z = theta / self.scale
        return (
            -0.5 * z * z
            + 0.5 * math.log(2.0 / math.pi)
            - math.log(self.scale)
        )


class Uniform(Prior):
    """``θ ~ U(lo, hi)`` — hard box. Outside the box the density is
    −∞; for gradient-based MAP prefer the smooth families (the box
    gradient is zero inside and undefined at the walls)."""

    def __init__(self, lo: float, hi: float):
        if not (0 <= lo < hi):
            raise ValueError("need 0 <= lo < hi")
        self.lo = float(lo)
        self.hi = float(hi)

    def log_prob(self, theta: Array) -> Array:
        inside = (theta >= self.lo) & (theta <= self.hi)
        return jnp.where(
            inside,
            -math.log(self.hi - self.lo),
            -jnp.inf,
        )


def log_prior(
    priors: Sequence[Optional[Prior]], theta: Array
) -> Array:
    """``Σᵢ log pᵢ(θᵢ)`` over the independent per-parameter priors.

    ``priors`` aligns with the packed parameter vector; ``None``
    entries contribute nothing (improper flat).  Length must match
    ``theta.shape[-1]``.
    """
    if len(priors) != theta.shape[-1]:
        raise ValueError(
            f"{len(priors)} priors for {theta.shape[-1]} parameters"
        )
    total = jnp.zeros(theta.shape[:-1], theta.dtype)
    for i, p in enumerate(priors):
        if p is not None:
            total = total + p.log_prob(theta[..., i])
    return total


def log_prior_u(
    priors: Sequence[Optional[Prior]], u: Array
) -> Array:
    """θ-space prior evaluated at u = log θ, with the
    change-of-variables Jacobian ``Σ log|dθᵢ/duᵢ| = Σ uᵢ`` — what an
    MCMC chain over u must add so its draws are samples from the
    θ-space posterior.  The Jacobian term only covers coordinates that
    actually carry a prior (flat-in-θ coordinates stay flat-in-θ)."""
    theta = jnp.exp(u)
    jac = jnp.zeros(u.shape[:-1], u.dtype)
    for i, p in enumerate(priors):
        if p is not None:
            jac = jac + u[..., i]
    return log_prior(priors, theta) + jac
