"""Expectation Propagation for non-Gaussian GP inference (R&W §3.6).

The third classical treatment of non-Gaussian observations, next to the
Laplace approximation (``models/laplace.py``) and the variational bound
(``models/svgp.py``).  For binary classification EP is the accuracy
gold standard among the deterministic approximations (Kuss & Rasmussen
2005, JMLR 6; Nickisch & Rasmussen 2008, JMLR 9): its Gaussian site
approximations match *moments* of the non-Gaussian factors instead of
curvature at the mode, so both the predictive probabilities and the
evidence are markedly better calibrated than Laplace's.  The reference
repo is Gaussian-regression only (its marginal likelihood IS the
Gaussian LML, ``/root/reference/PyGPR/loss.py:49-51``).

TPU-first shape — **parallel EP** rather than the textbook sequential
site loop (R&W Algorithm 3.5 updates one site at a time with a rank-1
posterior refresh, a latency-bound scalar loop that XLA cannot tile):

  * One sweep updates ALL sites simultaneously from the current global
    posterior marginals: one n×n Cholesky of the always-well-conditioned
    ``B = I + S̃^{1/2} K S̃^{1/2}`` + two triangular GEMM solves +
    vectorized tilted-moment updates.  Parallel (a.k.a. "distributed")
    EP with damping is the standard accelerator formulation (van
    Gerven et al. 2009; Jylänki et al. 2011 use the same damped
    simultaneous updates) and converges to the same fixed point — EP
    fixed points are defined by the moment-matching conditions, not by
    the update schedule.
  * Sweeps run as one differentiable ``lax.scan`` (each sweep wrapped
    in ``jax.checkpoint``), so hyperparameter gradients of the EP
    evidence come from reverse-mode AD through the converged iteration
    — the same AD-through-fixed-point policy as the Laplace module, no
    hand-derived R&W §3.6.3 gradient chain.
  * Tilted (cavity × likelihood) moments use the likelihood's closed
    form when it has one (``BernoulliProbit.tilted_moments``, the R&W
    §3.9 exact integrals) and 32-node Gauss-Hermite quadrature in the
    log domain otherwise — any ``models/obs.py`` observation model
    works unchanged.

Exactness anchor: with ``GaussianLik`` the sites can represent the
likelihood exactly, so EP terminates at the *exact* posterior and
``log Z_EP`` equals the exact Gaussian LML — the parity oracle the
tests pin against ``models/likelihood.nlml``.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.ops import linalg
from pygpr_tpu.ops.kernels import Kernel

Array = jax.Array

#: Site-precision floor: keeps 1/τ̃ and ν̃/√τ̃ well-defined for sites
#: that carry (numerically) no information.
TAU_FLOOR = 1e-10
#: Cavity-precision floor: a non-positive cavity precision means the
#: site is (transiently) sharper than the whole posterior — the
#: standard parallel-EP guard clamps it and lets damping repair it.
CAV_FLOOR = 1e-8

_GH_X, _GH_W = np.polynomial.hermite.hermgauss(32)


class EPState(NamedTuple):
    """Converged EP posterior (immutable pytree)."""

    x: Array          #: training inputs [n, d]
    y: Array          #: observations [n]
    params: Array     #: kernel hyperparameters [nhp]
    lik_params: Array  #: likelihood parameters [nlp] (possibly empty)
    tau: Array        #: site precisions τ̃ [n]
    nu: Array         #: site precision-means ν̃ = τ̃μ̃ [n]
    mu: Array         #: posterior marginal means [n]
    sigma2: Array     #: posterior marginal variances [n]
    w_pred: Array     #: (K + S̃⁻¹)⁻¹ μ̃ — the predict-mean weights [n]
    w_sqrt: Array     #: S̃^{1/2} [n]
    chol_b: Array     #: lower Cholesky of B = I + S̃^{1/2} K S̃^{1/2}
    nlml: Array       #: −log Z_EP (R&W eq. 3.65), scalar
    delta: Array      #: max |site change| of the final sweep
    ok: Array         #: finiteness flag


def _tilted_moments(lik, lp, y, mu_cav, var_cav):
    """(log Ẑ, μ̂, σ̂²) of the tilted distribution
    ``∝ N(f; μ₋, σ²₋) p(y|f)`` — closed form if the likelihood has
    one, else log-domain Gauss-Hermite."""
    if hasattr(lik, "tilted_moments"):
        return lik.tilted_moments(lp, y, mu_cav, var_cav)
    xg = jnp.asarray(_GH_X, mu_cav.dtype)
    logw = jnp.asarray(
        np.log(_GH_W) - 0.5 * math.log(math.pi), mu_cav.dtype
    )
    f = mu_cav[..., None] + jnp.sqrt(2.0 * var_cav)[..., None] * xg
    ll = lik.log_lik(lp, y[..., None], f)            # [n, H]
    lse = jax.scipy.special.logsumexp(logw + ll, axis=-1)
    q = jnp.exp(logw + ll - lse[..., None])          # normalized
    mu_hat = jnp.sum(q * f, axis=-1)
    e2 = jnp.sum(q * f * f, axis=-1)
    return lse, mu_hat, e2 - mu_hat**2


def _posterior_from_sites(K, tau, nu, config: Config):
    """Global posterior marginals from natural-parameter sites.

    Σ = (K⁻¹ + S̃)⁻¹ = K − K S̃^{1/2} B⁻¹ S̃^{1/2} K with
    B = I + S̃^{1/2} K S̃^{1/2}; eigenvalues of B are ≥ 1, so no
    jitter ladder is needed (same argument as Laplace's ``_b_cholesky``).
    Returns ``(mu, sigma2, chol_b, ws, V = L⁻¹ S̃^{1/2} K)``.
    """
    n = K.shape[-1]
    ws = jnp.sqrt(jnp.maximum(tau, TAU_FLOOR))
    B = jnp.eye(n, dtype=K.dtype) + ws[:, None] * K * ws[None, :]
    L = jnp.linalg.cholesky(B)
    V = linalg.solve_lower(L, ws[:, None] * K)       # [n, n]
    sigma2 = jnp.diagonal(K) - jnp.sum(V * V, axis=0)
    k_nu = jnp.dot(K, nu, precision=config.precision)
    mu = k_nu - jnp.dot(
        V.T, jnp.dot(V, nu, precision=config.precision),
        precision=config.precision,
    )
    return mu, sigma2, L, ws, V


def _sweep(K, y, lik, lp, tau, nu, damping, config: Config):
    """One damped parallel-EP sweep over all sites."""
    mu, sigma2, _, _, _ = _posterior_from_sites(K, tau, nu, config)
    sigma2 = jnp.maximum(sigma2, TAU_FLOOR)

    tau_cav = jnp.maximum(1.0 / sigma2 - tau, CAV_FLOOR)
    nu_cav = mu / sigma2 - nu
    var_cav = 1.0 / tau_cav
    mu_cav = nu_cav * var_cav

    _, mu_hat, var_hat = _tilted_moments(lik, lp, y, mu_cav, var_cav)
    var_hat = jnp.maximum(var_hat, TAU_FLOOR)

    tau_new = jnp.maximum(1.0 / var_hat - tau_cav, 0.0)
    nu_new = mu_hat / var_hat - nu_cav
    d = jnp.maximum(
        jnp.max(jnp.abs(tau_new - tau)), jnp.max(jnp.abs(nu_new - nu))
    )
    tau = (1.0 - damping) * tau + damping * tau_new
    nu = (1.0 - damping) * nu + damping * nu_new
    return tau, nu, d


def _log_z_ep(K, y, lik, lp, tau, nu, config: Config):
    """EP evidence log Z_EP (R&W eq. 3.65) in B-stable form.

    With sites N(μ̃, 1/τ̃):  log Z_EP = log N(μ̃; 0, K + S̃⁻¹)
    + Σᵢ [log Ẑᵢ − log ∫N(f;μ₋ᵢ,σ²₋ᵢ)N(f;μ̃ᵢ,σ̃²ᵢ)df];  expanding the
    Gaussian-convolution terms against |K + S̃⁻¹| = |B|/|S̃| cancels
    every unbounded σ̃² = 1/τ̃ factor, leaving only log(1 + τ̃σ²₋) and
    the L_B solve of a = ν̃/√τ̃.
    """
    mu, sigma2, L, ws, _ = _posterior_from_sites(K, tau, nu, config)
    sigma2 = jnp.maximum(sigma2, TAU_FLOOR)
    tau_cav = jnp.maximum(1.0 / sigma2 - tau, CAV_FLOOR)
    nu_cav = mu / sigma2 - nu
    var_cav = 1.0 / tau_cav
    mu_cav = nu_cav * var_cav

    lz_hat, _, _ = _tilted_moments(lik, lp, y, mu_cav, var_cav)

    live = tau > 1e-8
    # ½ log(σ²₋ + σ̃²) + ½ log τ̃ = ½ log(1 + τ̃ σ²₋)
    t_logdet_sites = 0.5 * jnp.sum(jnp.log1p(tau * var_cav))
    # (μ₋ − μ̃)² / (2(σ²₋ + σ̃²)) = (μ₋τ̃ − ν̃)² / (2τ̃(1 + τ̃σ²₋))
    quad_sites = jnp.where(
        live,
        (mu_cav * tau - nu) ** 2
        / (2.0 * jnp.maximum(tau, TAU_FLOOR) * (1.0 + tau * var_cav)),
        0.0,
    )
    a = jnp.where(live, nu / ws, 0.0)                # ν̃/√τ̃
    c = linalg.solve_lower(L, a)
    return (
        jnp.sum(lz_hat)
        + t_logdet_sites
        + jnp.sum(quad_sites)
        - jnp.sum(jnp.log(jnp.diagonal(L)))
        - 0.5 * jnp.dot(c, c, precision=config.precision)
    )


def posterior_ep(
    kern: Kernel,
    params: Array,
    lik,
    lik_params: Array,
    x: Array,
    y: Array,
    *,
    n_sweeps: int = 30,
    damping: float = 0.7,
    config: Config = DEFAULT,
) -> EPState:
    """Run damped parallel-EP to (near-)convergence and assemble the
    posterior + evidence.  ``n_sweeps`` is a static scan length —
    parallel EP with damping ~0.7 reaches f64 fixed point in ~15-25
    sweeps on classification problems; ``state.delta`` reports the
    final sweep's largest site move so convergence is observable.
    """
    K = kern.matrix(params, x, config=config)
    dtype = K.dtype
    n = y.shape[0]

    def one(carry, _):
        tau, nu = carry
        tau, nu, d = jax.checkpoint(
            lambda t, v: _sweep(K, y, lik, lik_params, t, v,
                                damping, config)
        )(tau, nu)
        return (tau, nu), d

    tau0 = jnp.zeros((n,), dtype)
    nu0 = jnp.zeros((n,), dtype)
    (tau, nu), deltas = jax.lax.scan(
        one, (tau0, nu0), None, length=n_sweeps
    )

    mu, sigma2, L, ws, _ = _posterior_from_sites(K, tau, nu, config)
    log_z = _log_z_ep(K, y, lik, lik_params, tau, nu, config)
    # predict-mean weights (K + S̃⁻¹)⁻¹μ̃ = S̃^{1/2} B⁻¹ (ν̃/√τ̃)
    a = jnp.where(tau > 1e-8, nu / ws, 0.0)
    w_pred = ws * linalg.solve_lower_t(L, linalg.solve_lower(L, a))
    return EPState(
        x=x, y=y, params=params, lik_params=lik_params,
        tau=tau, nu=nu, mu=mu, sigma2=sigma2,
        w_pred=w_pred, w_sqrt=ws, chol_b=L,
        nlml=-log_z, delta=deltas[-1],
        ok=jnp.isfinite(log_z) & jnp.all(jnp.isfinite(L)),
    )


def nlml(
    kern: Kernel,
    params: Array,
    lik,
    lik_params: Array,
    x: Array,
    y: Array,
    *,
    n_sweeps: int = 30,
    damping: float = 0.7,
    config: Config = DEFAULT,
) -> Array:
    """Negative EP evidence −log Z_EP — the fit criterion."""
    return posterior_ep(
        kern, params, lik, lik_params, x, y,
        n_sweeps=n_sweeps, damping=damping, config=config,
    ).nlml


def predict(
    kern: Kernel,
    state: EPState,
    xp: Array,
    lik=None,
    *,
    space: str = "observation",
    config: Config = DEFAULT,
) -> Tuple[Array, Array]:
    """Predictive moments at ``xp`` (R&W eqs. 3.60-3.61).

    Latent: mean = K*ᵀ (K + S̃⁻¹)⁻¹ μ̃ (precomputed ``w_pred``);
    var = k** − columnwise ‖L_B⁻¹ S̃^{1/2} K*‖².  Observation space
    pushes the latent Gaussian through ``lik.predict`` (probit class
    probability Φ(μ/√(1+σ²)) etc.) — same contract as Laplace/SVGP.
    """
    krns = kern.matrix(state.params, state.x, xp, config=config)  # [m,n]
    mean = jnp.dot(krns, state.w_pred, precision=config.precision)
    v = linalg.solve_lower(
        state.chol_b, state.w_sqrt[:, None] * krns.T
    )
    var = kern.diag(state.params, xp, config=config) - jnp.sum(
        v * v, axis=0
    )
    var = jnp.maximum(var, jnp.asarray(config.jitter, var.dtype))
    if space == "latent":
        return mean, var
    if lik is None:
        raise ValueError('space="observation" needs the likelihood')
    return lik.predict(state.lik_params, mean, var)


class FitEPResult(NamedTuple):
    state: EPState
    params: Array
    lik_params: Array
    nlml: Array
    converged: Array


def fit(
    kern: Kernel,
    lik,
    x: Array,
    y: Array,
    params0: Optional[Array] = None,
    lik_params0: Optional[Array] = None,
    *,
    n_sweeps: int = 30,
    damping: float = 0.7,
    max_iter: int = 100,
    tol: float = 1e-4,
    config: Config = DEFAULT,
) -> FitEPResult:
    """Hyperparameter fit by minimizing −log Z_EP — kernel parameters
    in log-space, likelihood parameters raw, gradients by AD through
    the damped sweeps (same policy as ``models/laplace.fit``)."""
    from pygpr_tpu.optimize.lbfgs import minimize_lbfgs

    if params0 is None:
        params0 = kern.init_params(x, config)
    if lik_params0 is None:
        lik_params0 = lik.init_params(y.dtype)
    nk = params0.shape[0]
    u0 = jnp.concatenate([jnp.log(jnp.abs(params0)), lik_params0])

    def objective(u):
        return nlml(
            kern, jnp.exp(u[:nk]), lik, u[nk:], x, y,
            n_sweeps=n_sweeps, damping=damping, config=config,
        )

    res = minimize_lbfgs(objective, u0, max_iter=max_iter, tol=tol)
    p_fit = jnp.exp(res.params[:nk])
    lp_fit = res.params[nk:]
    state = posterior_ep(
        kern, p_fit, lik, lp_fit, x, y,
        n_sweeps=n_sweeps, damping=damping, config=config,
    )
    return FitEPResult(
        state=state, params=p_fit, lik_params=lp_fit,
        nlml=state.nlml, converged=res.converged,
    )


class EPGP:
    """OO wrapper mirroring :class:`pygpr_tpu.models.laplace.LaplaceGP`.

    >>> gp = EPGP(x, y, RBF(), BernoulliProbit())
    >>> gp.train()
    >>> p, pvar = gp.predict(xs)           # class probabilities
    """

    def __init__(self, x, y, cov: Kernel, lik, params=None,
                 lik_params=None, config: Config = DEFAULT):
        self.x = jnp.asarray(x)
        self.y = jnp.asarray(y)
        self.cov = cov
        self.lik = lik
        self.config = config
        self.params = (
            cov.init_params(self.x, config) if params is None
            else jnp.asarray(params)
        )
        self.lik_params = (
            lik.init_params(self.y.dtype) if lik_params is None
            else jnp.asarray(lik_params)
        )
        self._state: Optional[EPState] = None

    def train(self, max_iter: int = 100, **kwargs) -> FitEPResult:
        res = fit(
            self.cov, self.lik, self.x, self.y,
            self.params, self.lik_params,
            max_iter=max_iter, config=self.config, **kwargs,
        )
        self.params, self.lik_params = res.params, res.lik_params
        self._state = res.state
        return res

    def update(self) -> EPState:
        if self._state is None:
            self._state = posterior_ep(
                self.cov, self.params, self.lik, self.lik_params,
                self.x, self.y, config=self.config,
            )
        return self._state

    def predict(self, xp, space: str = "observation"):
        state = self.update()
        return predict(
            self.cov, state, jnp.asarray(xp), self.lik,
            space=space, config=self.config,
        )
