"""Multi-fidelity GP regression — AR(1) co-kriging
(Kennedy & O'Hagan, Biometrika 2000) in Le Gratiet's recursive
formulation (Le Gratiet & Garnier, IJUQ 2014).

The setting the reference cannot express: a few expensive high-fidelity
observations plus many cheap low-fidelity ones (coarse simulation,
lower mesh, surrogate sensor).  The autoregressive model

    f_hi(x) = ρ · f_lo(x) + δ(x),     δ ⊥ f_lo,  δ ~ GP(0, k_δ)

lets the high-fidelity posterior borrow all of the low-fidelity data's
structure through ρ while a small discrepancy GP corrects the bias.

Recursive (two-stage) inference — each stage is a STANDARD exact GP on
this engine, so the jitter ladder, serving states, committees, and
MCMC all apply unchanged:

  1. fit GP_lo on (X_lo, y_lo) by the usual log-space L-BFGS MLE;
  2. fit (ρ, θ_δ) by maximizing the exact marginal likelihood of the
     residuals ``y_hi − ρ·μ_lo(X_hi)`` under k_δ — Le Gratiet's
     posterior-mean substitution, which decouples the levels and keeps
     every gram at its own level's size.

Prediction composes the levels:  μ_hi(x) = ρ·μ_lo(x) + μ_δ(x),
σ²_hi(x) = ρ²·σ²_lo(x) + σ²_δ(x) (independence of δ).

Tests pin: exact ρ recovery on-model, the ρ = 0 reduction to an
independent high-fidelity GP, FD gradients of the stage-2 objective in
(ρ, θ_δ), and the headline property — with scarce high-fidelity data
the co-kriging posterior beats the hi-only GP out of sample.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.models import exact_gp
from pygpr_tpu.models.likelihood import nlml as gaussian_nlml
from pygpr_tpu.ops.kernels import Kernel

Array = jax.Array


class MFState(NamedTuple):
    """Fitted two-level posterior (immutable pytree)."""

    state_lo: exact_gp.GPState   #: exact-GP state of the low level
    state_d: exact_gp.GPState    #: exact-GP state of the discrepancy
    rho: Array                   #: fitted autoregressive scale
    params_lo: Array
    params_d: Array
    nlml_lo: Array
    nlml_d: Array


def nlml_stage2(
    kern_d: Kernel,
    params_d: Array,
    rho: Array,
    kern_lo: Kernel,
    state_lo: exact_gp.GPState,
    x_hi: Array,
    y_hi: Array,
    config: Config = DEFAULT,
) -> Array:
    """Exact NLML of the high-fidelity residuals
    ``y_hi − ρ·μ_lo(x_hi)`` under the discrepancy kernel — the
    stage-2 objective, differentiable in (ρ, θ_δ)."""
    mu_lo, _ = exact_gp.predict(kern_lo, state_lo, x_hi, "none",
                                config)
    resid = y_hi - rho * mu_lo
    return gaussian_nlml(kern_d, params_d, x_hi, resid, config)


def fit_mf(
    kern_lo: Kernel,
    kern_d: Kernel,
    x_lo: Array,
    y_lo: Array,
    x_hi: Array,
    y_hi: Array,
    *,
    params_lo0: Optional[Array] = None,
    params_d0: Optional[Array] = None,
    rho0: float = 1.0,
    max_iter: int = 150,
    tol: float = 1e-4,
    config: Config = DEFAULT,
) -> MFState:
    """Two-stage recursive co-kriging fit (both stages on-device
    L-BFGS; stage 2 is joint over raw ρ and log θ_δ)."""
    from pygpr_tpu.optimize.lbfgs import fit_mle, minimize_lbfgs

    if params_lo0 is None:
        params_lo0 = kern_lo.init_params(x_lo, config)
    res_lo = fit_mle(kern_lo, params_lo0, x_lo, y_lo,
                     max_iter=max_iter, tol=tol, config=config)
    state_lo = exact_gp.factorize(kern_lo, res_lo.params, x_lo, y_lo,
                                  config)

    if params_d0 is None:
        params_d0 = kern_d.init_params(x_hi, config)
    nk = params_d0.shape[0]
    u0 = jnp.concatenate([
        jnp.log(jnp.abs(params_d0)),
        jnp.asarray([rho0], y_hi.dtype),
    ])

    def objective(u):
        return nlml_stage2(
            kern_d, jnp.exp(u[:nk]), u[nk], kern_lo, state_lo,
            x_hi, y_hi, config,
        )

    res_d = minimize_lbfgs(objective, u0, max_iter=max_iter, tol=tol)
    params_d = jnp.exp(res_d.params[:nk])
    rho = res_d.params[nk]
    mu_lo_hi, _ = exact_gp.predict(kern_lo, state_lo, x_hi, "none",
                                   config)
    state_d = exact_gp.factorize(
        kern_d, params_d, x_hi, y_hi - rho * mu_lo_hi, config
    )
    return MFState(
        state_lo=state_lo, state_d=state_d, rho=rho,
        params_lo=res_lo.params, params_d=params_d,
        nlml_lo=res_lo.value, nlml_d=res_d.value,
    )


def predict_mf(
    kern_lo: Kernel,
    kern_d: Kernel,
    state: MFState,
    xq: Array,
    config: Config = DEFAULT,
) -> Tuple[Array, Array]:
    """High-fidelity posterior: mean = ρ·μ_lo + μ_δ,
    var = ρ²·σ²_lo + σ²_δ (levels independent given the fit)."""
    m_lo, v_lo = exact_gp.predict(kern_lo, state.state_lo, xq, "diag",
                                  config)
    m_d, v_d = exact_gp.predict(kern_d, state.state_d, xq, "diag",
                                config)
    mean = state.rho * m_lo + m_d
    var = jnp.square(state.rho) * v_lo + v_d
    return mean, var


class MultiFidelityGP:
    """OO wrapper.

    >>> mf = MultiFidelityGP(x_lo, y_lo, x_hi, y_hi,
    ...                      Sum((RBF(), WhiteNoise())))
    >>> mf.train()
    >>> mean, var = mf.predict(xq)
    """

    def __init__(self, x_lo, y_lo, x_hi, y_hi, cov_lo: Kernel,
                 cov_d: Optional[Kernel] = None,
                 config: Config = DEFAULT):
        self.x_lo = jnp.asarray(x_lo)
        self.y_lo = jnp.asarray(y_lo)
        self.x_hi = jnp.asarray(x_hi)
        self.y_hi = jnp.asarray(y_hi)
        self.cov_lo = cov_lo
        self.cov_d = cov_lo if cov_d is None else cov_d
        self.config = config
        self._state: Optional[MFState] = None

    def train(self, max_iter: int = 150, **kwargs) -> MFState:
        self._state = fit_mf(
            self.cov_lo, self.cov_d,
            self.x_lo, self.y_lo, self.x_hi, self.y_hi,
            max_iter=max_iter, config=self.config, **kwargs,
        )
        return self._state

    def predict(self, xq):
        assert self._state is not None, "call train() first"
        return predict_mf(
            self.cov_lo, self.cov_d, self._state, jnp.asarray(xq),
            self.config,
        )
