"""Student-t process regression (Shah, Wilson & Ghahramani, AISTATS
2014): the closed-form heavy-tailed generalization of the exact GP.

A TP keeps everything that makes GP regression cheap — ONE Cholesky of
the same kernel gram, the same predictive mean K*ᵀK⁻¹y — and replaces
the Gaussian marginal with a multivariate Student-t (dof ν > 2, scale
parameterized so K IS the covariance):

    −log p(y) = −log Γ((ν+n)/2) + log Γ(ν/2) + (n/2)·log((ν−2)π)
                + Σᵢ log Lᵢᵢ + ((ν+n)/2)·log(1 + β/(ν−2)),
    β = yᵀK⁻¹y

As ν → ∞ this converges to the exact Gaussian NLML (tested), and for
finite ν the predictive covariance INFLATES by (ν + β − 2)/(ν + n − 2)
when the data are surprising (β large) — calibrated uncertainty under
outliers, where the GP's posterior variance is famously data-value
independent.  ν is fit jointly with the kernel hyperparameters
(softplus-shifted to ν > 2).

This is the analytic counterpart to the Student-t *likelihood* paths
(``obs.StudentTLik`` via Laplace/SVGP): those model per-point outliers
with non-Gaussian noise and need approximate inference; the TP stays
exactly closed form by making the whole process elliptical.  Noise is
carried in the kernel (``Sum((…, WhiteNoise()))``) exactly as the
reference does for the GP (``/root/reference/PyGPR/loss.py:49-51`` —
the reference has no heavy-tailed path at all).

Every op here reuses ``models/exact_gp``/``ops/linalg`` (jitter
ladder, serving states, committee batching apply unchanged).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.models import exact_gp
from pygpr_tpu.ops import linalg
from pygpr_tpu.ops.kernels import Kernel

Array = jax.Array


def nlml_tp(
    kern: Kernel,
    params: Array,
    nu: Array,
    x: Array,
    y: Array,
    config: Config = DEFAULT,
) -> Array:
    """Negative log marginal likelihood of the TP (Shah et al. eq. 6,
    covariance parameterization).  One gram + one laddered Cholesky —
    identical cost structure to the Gaussian ``likelihood.nlml``."""
    from pygpr_tpu.ops.kernels import train_gram

    n = y.shape[-1]
    krn = train_gram(kern, params, x, config)
    res = linalg.safe_cholesky(krn, config)   # ladder adds the jitter
    z = linalg.solve_lower(res.chol, y)
    beta = jnp.dot(z, z, precision=config.precision)
    half_logdet = linalg.half_logdet_from_chol(res.chol)
    nuf = jnp.asarray(nu, y.dtype)
    return (
        -jax.scipy.special.gammaln(0.5 * (nuf + n))
        + jax.scipy.special.gammaln(0.5 * nuf)
        + 0.5 * n * jnp.log((nuf - 2.0) * jnp.asarray(math.pi, y.dtype))
        + half_logdet
        + 0.5 * (nuf + n) * jnp.log1p(beta / (nuf - 2.0))
    )


def predict_tp(
    kern: Kernel,
    state: exact_gp.GPState,
    nu: Array,
    xp: Array,
    var: str = "diag",
    config: Config = DEFAULT,
):
    """TP posterior predictive (Shah et al. lemma 3): a Student-t with

      mean  = K*ᵀK⁻¹y                      (identical to the GP)
      dof   = ν + n
      cov   = (ν + β − 2)/(ν + n − 2) · [GP posterior covariance]

    Returns ``(mean, cov, dof)`` — ``cov`` is the predictive
    covariance in the covariance parameterization (already the
    second moment for dof > 2).  ``state`` is a standard
    ``exact_gp.factorize`` result on the same kernel.
    """
    mean, cov = exact_gp.predict(kern, state, xp, var, config)
    n = state.y.shape[-1]
    z = linalg.solve_lower(state.chol, state.y)
    beta = jnp.dot(z, z, precision=config.precision)
    nuf = jnp.asarray(nu, mean.dtype)
    scale = (nuf + beta - 2.0) / (nuf + n - 2.0)
    if cov is None:
        return mean, None, nuf + n
    return mean, scale * cov, nuf + n


def nlpd_tp(mean: Array, cov_diag: Array, dof: Array, yt: Array) -> Array:
    """Mean negative log predictive density under the Student-t
    marginals (covariance parameterization: scale² = cov·(dof−2)/dof)."""
    scale2 = cov_diag * (dof - 2.0) / dof
    zq = jnp.square(yt - mean) / scale2
    lp = (
        jax.scipy.special.gammaln(0.5 * (dof + 1.0))
        - jax.scipy.special.gammaln(0.5 * dof)
        - 0.5 * jnp.log(dof * jnp.asarray(math.pi, mean.dtype) * scale2)
        - 0.5 * (dof + 1.0) * jnp.log1p(zq / dof)
    )
    return -jnp.mean(lp)


class FitTPResult(NamedTuple):
    state: exact_gp.GPState
    params: Array
    nu: Array
    nlml: Array
    converged: Array


def fit_tp(
    kern: Kernel,
    x: Array,
    y: Array,
    params0: Optional[Array] = None,
    nu0: float = 5.0,
    *,
    max_iter: int = 150,
    tol: float = 1e-4,
    config: Config = DEFAULT,
) -> FitTPResult:
    """Joint L-BFGS over log-kernel-parameters and the dof — ν is
    parameterized ν = 2 + softplus(u_ν) (the marginal exists only for
    ν > 2 in this covariance convention)."""
    from pygpr_tpu.optimize.lbfgs import minimize_lbfgs

    if params0 is None:
        params0 = kern.init_params(x, config)
    nk = params0.shape[0]
    # softplus⁻¹(ν₀ − 2)
    u_nu0 = jnp.log(jnp.expm1(jnp.asarray(nu0 - 2.0, y.dtype)))
    u0 = jnp.concatenate([jnp.log(jnp.abs(params0)), u_nu0[None]])

    def objective(u):
        nu = 2.0 + jax.nn.softplus(u[nk])
        return nlml_tp(kern, jnp.exp(u[:nk]), nu, x, y, config)

    res = minimize_lbfgs(objective, u0, max_iter=max_iter, tol=tol)
    p_fit = jnp.exp(res.params[:nk])
    nu_fit = 2.0 + jax.nn.softplus(res.params[nk])
    state = exact_gp.factorize(kern, p_fit, x, y, config)
    return FitTPResult(
        state=state, params=p_fit, nu=nu_fit, nlml=res.value,
        converged=res.converged,
    )


class TProcess:
    """OO wrapper in the house style.

    >>> tp = TProcess(x, y, Sum((RBF(), WhiteNoise())))
    >>> tp.train()
    >>> mean, cov, dof = tp.predict(xs)
    """

    def __init__(self, x, y, cov: Kernel, nu: float = 5.0,
                 params=None, config: Config = DEFAULT):
        self.x = jnp.asarray(x)
        self.y = jnp.asarray(y)
        self.cov = cov
        self.nu = nu
        self.config = config
        self.params = (
            cov.init_params(self.x, config) if params is None
            else jnp.asarray(params)
        )
        self._state: Optional[exact_gp.GPState] = None

    def train(self, max_iter: int = 150, **kwargs) -> FitTPResult:
        res = fit_tp(
            self.cov, self.x, self.y, self.params, self.nu,
            max_iter=max_iter, config=self.config, **kwargs,
        )
        self.params, self.nu = res.params, float(res.nu)
        self._state = res.state
        return res

    def update(self) -> exact_gp.GPState:
        if self._state is None:
            self._state = exact_gp.factorize(
                self.cov, self.params, self.x, self.y, self.config
            )
        return self._state

    def predict(self, xp, var: str = "diag"):
        return predict_tp(
            self.cov, self.update(), self.nu, jnp.asarray(xp), var,
            self.config,
        )
