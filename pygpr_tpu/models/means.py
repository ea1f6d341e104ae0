"""Explicit prior mean functions for exact GP regression.

The reference is zero-mean everywhere (``PyGPR/gpr.py:70-74`` solves
``w = K⁻¹y`` on the raw targets; no mean term appears in any model or
in the LML ``loss.py:49-51``).  Zero-mean GPs revert to 0 away from
data, which is wrong for offset or trending targets; the standard fix
(R&W §2.7) is an explicit parametric prior mean m(x):

    f ~ GP(m(x), k),   nlml(θ) = ½ rᵀK⁻¹r + Σ log diag L + ½n log 2π,
    r = y − m(x);      posterior mean at x* = m(x*) + K* K⁻¹ r.

This module composes with the existing functional core instead of
forking it: a :class:`Mean` is a stateless parametric function (same
design as :class:`~pygpr_tpu.ops.kernels.Kernel` — static under jit,
parameters travel as arrays), and the GP-with-mean pipeline is
"subtract m(x), run the zero-mean engine on the residuals, add m(x*)
back".  The joint parameter vector is ``θ = [θ_kernel, θ_mean]``;
kernel parameters are optimized in log-space (they are scales), mean
parameters in raw space (they are signed coefficients).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.models import exact_gp
from pygpr_tpu.models.exact_gp import GPState
from pygpr_tpu.models.likelihood import nlml
from pygpr_tpu.ops.kernels import Kernel

Array = jax.Array


class Mean:
    """Stateless parametric prior mean. Instances are static under jit."""

    def n_params(self, dim: int) -> int:
        raise NotImplementedError

    def init_params(
        self, x: Array, y: Optional[Array] = None,
        config: Config = DEFAULT,
    ) -> Array:
        """Data-informed initial parameters (flat, ``[n_params]``)."""
        raise NotImplementedError

    def __call__(
        self, params: Array, x: Array, *, config: Config = DEFAULT
    ) -> Array:
        """Evaluate m(x): ``[n, d] -> [n]``."""
        raise NotImplementedError


class ZeroMean(Mean):
    """m(x) = 0 — the reference's implicit mean (``gpr.py:70-74``)."""

    def n_params(self, dim: int) -> int:
        return 0

    def init_params(self, x, y=None, config: Config = DEFAULT):
        return jnp.zeros((0,), x.dtype)

    def __call__(self, params, x, *, config: Config = DEFAULT):
        return jnp.zeros(x.shape[:-1], x.dtype)


class ConstantMean(Mean):
    """m(x) = c.  One signed parameter; init = mean(y) when given."""

    def n_params(self, dim: int) -> int:
        return 1

    def init_params(self, x, y=None, config: Config = DEFAULT):
        if y is None:
            return jnp.zeros((1,), x.dtype)
        return jnp.mean(y, axis=-1, keepdims=True).astype(x.dtype)

    def __call__(self, params, x, *, config: Config = DEFAULT):
        return jnp.broadcast_to(params[0], x.shape[:-1])


class LinearMean(Mean):
    """m(x) = b + x·w — affine trend.  Params ``[b, w₁..w_d]``; init
    from the least-squares fit of y on [1, x] (the optimizer then
    refines it jointly with the kernel)."""

    def n_params(self, dim: int) -> int:
        return dim + 1

    def init_params(self, x, y=None, config: Config = DEFAULT):
        d = x.shape[-1]
        if y is None:
            return jnp.zeros((d + 1,), x.dtype)
        ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
        a = jnp.concatenate([ones, x], axis=-1)
        coef, *_ = jnp.linalg.lstsq(a, y)
        return coef.astype(x.dtype)

    def __call__(self, params, x, *, config: Config = DEFAULT):
        return params[0] + jnp.einsum(
            "...d,d->...", x, params[1:],
        )


# --------------------------------------------------------------------
# joint-parameter plumbing: θ = [θ_kernel, θ_mean]
# --------------------------------------------------------------------

def n_params_joint(kern: Kernel, mean: Mean, dim: int) -> int:
    return kern.n_params(dim) + mean.n_params(dim)


def init_params_joint(
    kern: Kernel, mean: Mean, x: Array, y: Array,
    config: Config = DEFAULT,
) -> Array:
    return jnp.concatenate(
        [kern.init_params(x, config), mean.init_params(x, y, config)]
    )


def split_params(
    kern: Kernel, mean: Mean, theta: Array, dim: int
) -> Tuple[Array, Array]:
    nk = kern.n_params(dim)
    return theta[..., :nk], theta[..., nk:]


def nlml_mean(
    kern: Kernel,
    mean: Mean,
    theta: Array,
    x: Array,
    y: Array,
    config: Config = DEFAULT,
) -> Array:
    """NLML of the GP with prior mean: zero-mean NLML on the residuals
    r = y − m(x) (R&W eq. 2.30 generalized; value reduces exactly to
    ``likelihood.nlml`` under :class:`ZeroMean`)."""
    pk, pm = split_params(kern, mean, theta, x.shape[-1])
    r = y - mean(pm, x, config=config)
    return nlml(kern, pk, x, r, config)


def factorize_mean(
    kern: Kernel,
    mean: Mean,
    theta: Array,
    x: Array,
    y: Array,
    config: Config = DEFAULT,
) -> GPState:
    """Posterior state on the residuals r = y − m(x).

    The returned state's ``y`` field holds the residuals (that is what
    ``weights = K⁻¹r`` corresponds to); pass the same ``theta`` to
    :func:`predict_mean` to add m(x*) back.
    """
    pk, pm = split_params(kern, mean, theta, x.shape[-1])
    r = y - mean(pm, x, config=config)
    return exact_gp.factorize(kern, pk, x, r, config)


def predict_mean(
    kern: Kernel,
    mean: Mean,
    theta: Array,
    state: GPState,
    xp: Array,
    var: str = "full",
    config: Config = DEFAULT,
):
    """Posterior mean/uncertainty with the prior mean added back:
    μ(x*) = m(x*) + K* K⁻¹ (y − m(x)).  The covariance is unchanged by
    a deterministic mean shift."""
    _, pm = split_params(kern, mean, theta, state.x.shape[-1])
    mu, cov = exact_gp.predict(kern, state, xp, var, config)
    return mu + mean(pm, xp, config=config), cov


def fit_gp_mean(
    kern: Kernel,
    mean: Mean,
    x: Array,
    y: Array,
    theta0: Optional[Array] = None,
    *,
    config: Config = DEFAULT,
    max_iter: int = 200,
    tol: float = 1e-4,
    memory_size: int = 15,
):
    """Joint MLE of kernel + mean parameters, fully on-device.

    Mixed transform: kernel parameters are scales and optimize in
    log-space (same rationale as ``fit_mle``'s default — the raw
    landscape from tiny noise inits is catastrophically scaled), mean
    parameters are signed coefficients and optimize raw.  Returns a
    :class:`~pygpr_tpu.optimize.lbfgs.FitResult` whose ``params`` is
    the joint ``[θ_kernel, θ_mean]`` vector.
    """
    from pygpr_tpu.optimize.lbfgs import minimize_lbfgs

    nk = kern.n_params(x.shape[-1])
    if theta0 is None:
        theta0 = init_params_joint(kern, mean, x, y, config)

    def pack(theta):
        return jnp.concatenate(
            [jnp.log(theta[..., :nk]), theta[..., nk:]]
        )

    def unpack(u):
        return jnp.concatenate([jnp.exp(u[..., :nk]), u[..., nk:]])

    def objective(u):
        return nlml_mean(kern, mean, unpack(u), x, y, config)

    res = minimize_lbfgs(
        objective, pack(theta0),
        max_iter=max_iter, tol=tol, memory_size=memory_size,
    )
    return res._replace(params=unpack(res.params))
