"""Sparse variational GP regression (SGPR) — Titsias' collapsed bound.

Beyond the reference: PyGPR's only large-N strategy is the grBCM
committee decomposition (``/root/reference/PyGPR/gr_bcm.py``, SURVEY.md
§5.7).  SGPR is the complementary low-rank path — ``m`` inducing points
summarize all ``n`` observations in ONE model:

    q(u) = N(m_u, S),   ELBO = log N(y | 0, Q_ff + σₙ²I)
                               − tr(K_ff − Q_ff) / (2σₙ²),
    Q_ff = K_fu K_uu⁻¹ K_uf              (Titsias 2009, collapsed bound)

Why it earns its place in a TPU engine: the fit is O(n·m²) of **tall
[m, n] GEMMs** (`A·Aᵀ`), predicts are O(m²) per query with no n-sized
state — both map straight onto the MXU with static shapes, no
committee bookkeeping, no β-calibration concerns.  grBCM keeps full
local resolution; SGPR gives a single coherent posterior whose
uncertainty *grows* where data is scarce.  A complete engine wants
both.

Conventions (matching the rest of the package):

  * ``kern`` is the **noise-free signal kernel** (e.g. ``RBF()``).  The
    Gaussian observation noise σₙ is the LAST entry of the packed
    parameter vector ``params = [θ_kernel…, σₙ]`` — it enters the bound
    as the likelihood variance, not as a kernel summand, so do NOT
    include :class:`~pygpr_tpu.ops.kernels.WhiteNoise` in ``kern``.
  * Predictive variance INCLUDES σₙ² (observation variance), matching
    the house exact-GP convention where WhiteNoise contributes to the
    test-block diagonal (``gpr.py:96-120``: K** is built from the full
    kernel including the noise summand).
  * Inducing-point selection is host-side NumPy
    (:func:`init_inducing`) — data prep never traces onto the device.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.ops import linalg
from pygpr_tpu.ops.kernels import Kernel, Sum, WhiteNoise

Array = jax.Array


def _check_noise_free(kern: Kernel) -> None:
    parts = kern.kernels if isinstance(kern, Sum) else (kern,)
    if any(isinstance(k, WhiteNoise) for k in parts):
        raise ValueError(
            "SGPR takes a noise-free signal kernel; the observation "
            "noise is the last packed parameter (params = [θ_kernel…, "
            "σₙ]).  Drop WhiteNoise from the kernel."
        )


def init_params(
    kern: Kernel, x: Array, config: Config = DEFAULT
) -> Array:
    """``[θ_kernel… (all ones), σₙ=1]``.

    σₙ starts at 1 (not the reference's numerically hostile 1e-4 noise
    init, ``covar.py:224``) — the same all-ones policy the grBCM and
    MCMC training paths use (CLAUDE.md numerical policy); ``fit_sgpr``
    optimizes in log-space where this is a well-scaled start.
    """
    p = kern.init_params(x, config)
    return jnp.concatenate([p, jnp.ones(p.shape[:-1] + (1,), p.dtype)], -1)


def init_inducing(x, m: int, seed: int = 0) -> np.ndarray:
    """Pick ``m`` inducing locations on the HOST (NumPy).

    A seeded permutation subset of the training inputs — the standard
    SGPR initialization; pass the result through ``fit_sgpr(...,
    opt_inducing=True)`` to refine the locations variationally.  Kept
    off-device like all design/sampling code in this package (device
    RNG + argsort compiles cost minutes over the remote TPU tunnel).
    """
    x = np.asarray(x)
    n = x.shape[0]
    if m > n:
        raise ValueError(f"m={m} inducing points > n={n} data points")
    idx = np.random.default_rng(seed).permutation(n)[:m]
    return np.ascontiguousarray(x[idx])


def init_inducing_pivoted(
    kern: Kernel,
    x,
    m: int,
    *,
    theta=None,
    config: Config = DEFAULT,
) -> np.ndarray:
    """Pick ``m`` inducing locations by greedy pivoted-Cholesky
    selection (the points that best Nyström-approximate the prior gram
    under ``kern``/``theta`` — each pivot maximizes the residual prior
    variance).  O(m·n·d), no n×n matrix; a much stronger start than the
    random subset when the data is clumpy.  Runs the on-device
    ``iterative.pivoted_cholesky``; call it once, host-side, like
    :func:`init_inducing`."""
    from pygpr_tpu.models.iterative import pivoted_cholesky

    x = jnp.asarray(x)
    if m > x.shape[0]:
        raise ValueError(f"m={m} inducing points > n={x.shape[0]}")
    th = (
        jnp.asarray(theta)
        if theta is not None
        else kern.init_params(x, config)
    )
    _, pivs = pivoted_cholesky(
        kern, th, x, m, config=config, return_pivots=True
    )
    return np.ascontiguousarray(np.asarray(x)[np.asarray(pivs)])


def _common(kern, params, x, y, z, config):
    """Shared factorization of the collapsed bound.

    Returns (T=L⁻¹, TB=LB⁻¹, LB, c, A, σₙ², ok) with L = chol K_uu,
    A = T·K_uf/σₙ [m,n], B = I + AAᵀ [m,m], c = TB·Ay/σₙ [m].

    The n-sized products ``T·K_uf`` / ``TB·w`` are **inverse GEMMs**,
    not triangular solves, for two reasons: (a) GEMMs run the MXU at
    full rate where XLA's TRSM with n right-hand sides crawls (the
    same trade the exact-GP serving mode makes, ``exact_gp.
    precompute_tinv``); (b) under data-parallel sharding of the n axis
    (``parallel/data_parallel.py``) the SPMD partitioner slices a GEMM
    column-wise for free but must all-gather a triangular solve's RHS
    — inverse GEMMs keep the wire traffic at the O(m²) statistics
    all-reduces only.  The m³-sized inversions are noise next to the
    n·m² terms.
    """
    theta, sn = params[..., :-1], params[..., -1]
    sn2 = sn * sn + jnp.asarray(config.jitter, x.dtype)
    kuu = kern.matrix(theta, z, config=config)              # [m, m]
    res_uu = linalg.safe_cholesky(kuu, config)
    T = linalg.tri_inverse_doubling(res_uu.chol)
    kuf = kern.matrix(theta, x, z, config=config)           # [m, n]
    A = jnp.matmul(T, kuf, precision=config.precision) / jnp.sqrt(sn2)
    B = linalg.add_diag(
        jnp.matmul(A, A.T, precision=config.precision), 1.0
    )
    res_b = linalg.safe_cholesky(B, config)
    LB = res_b.chol
    TB = linalg.tri_inverse_doubling(LB)
    c = jnp.dot(
        TB, jnp.dot(A, y, precision=config.precision),
        precision=config.precision,
    ) / jnp.sqrt(sn2)
    ok = res_uu.ok * res_b.ok
    return T, TB, LB, c, A, sn2, ok


def neg_elbo(
    kern: Kernel,
    params: Array,
    x: Array,
    y: Array,
    z: Array,
    config: Config = DEFAULT,
) -> Array:
    """Negative collapsed ELBO (a minimization target, like ``nlml``).

        −ELBO = ½n log 2πσₙ² + Σ log diag LB
                + ½(yᵀy/σₙ² − cᵀc)                     [data fit]
                + Σ k_ff,ii/(2σₙ²) − ½ Σ A²            [trace penalty]

    Upper-bounds the exact NLML of the GP with kernel k + σₙ²I; tight
    (equal) when z = x.  Differentiable in ``params`` AND ``z`` — the
    Cholesky ladder's custom JVP covers both factorizations.
    """
    theta = params[..., :-1]
    _, _, LB, c, A, sn2, _ = _common(kern, params, x, y, z, config)
    n = y.shape[-1]
    kdiag = kern.diag(theta, x, config=config)
    return (
        0.5 * n * (math.log(2.0 * math.pi) + jnp.log(sn2))
        + linalg.half_logdet_from_chol(LB)
        + 0.5 * (jnp.dot(y, y) / sn2 - jnp.dot(c, c))
        + 0.5 * jnp.sum(kdiag) / sn2
        - 0.5 * jnp.sum(jnp.square(A))
    )


class SGPRState(NamedTuple):
    """Immutable posterior state of a fitted SGPR model.

    All predict-time quantities are m-sized — the n training points are
    fully summarized by (``chol_kuu``, ``chol_b``, ``c``); serving needs
    no n-sized arrays at all (contrast :class:`~pygpr_tpu.models.
    exact_gp.GPState`, which carries the n×n factor).
    """

    z: Array         #: inducing locations [m, d]
    params: Array    #: packed hyperparameters [nhp_kernel + 1]
    tinv_kuu: Array  #: T = L⁻¹, L = chol(K_uu + jitter·I)    [m, m]
    tinv_b: Array    #: TB = LB⁻¹, LB = chol(I + AAᵀ)         [m, m]
    c: Array         #: TB A y / σₙ                            [m]
    ok: Array        #: both factorizations finite


def factorize(
    kern: Kernel,
    params: Array,
    x: Array,
    y: Array,
    z: Array,
    config: Config = DEFAULT,
) -> SGPRState:
    """One-time O(n·m²) summarization of (x, y) into m-sized state."""
    T, TB, _, c, _, _, ok = _common(kern, params, x, y, z, config)
    return SGPRState(z, params, T, TB, c, ok)


def predict(
    kern: Kernel,
    state: SGPRState,
    xp: Array,
    var: str = "diag",
    config: Config = DEFAULT,
) -> Tuple[Array, Optional[Array]]:
    """Posterior mean and ("full" | "diag" | "none") uncertainty at xp.

    μ* = tmpᵀc,  Σ* = K** − wᵀw + tmpᵀtmp + σₙ²I, with
    w = T·K_us, tmp = TB·w — GEMM-only (the state stores the
    triangular inverses, see ``_common``): O(m²) per query,
    independent of n, no solves anywhere in the serving path.
    Variance includes observation noise σₙ² (house convention, see
    module docstring).
    """
    theta, sn = state.params[..., :-1], state.params[..., -1]
    sn2 = sn * sn + jnp.asarray(config.jitter, xp.dtype)
    kus = kern.matrix(theta, xp, state.z, config=config)    # [m, nq]
    w = jnp.matmul(state.tinv_kuu, kus, precision=config.precision)
    tmp = jnp.matmul(state.tinv_b, w, precision=config.precision)
    mean = jnp.dot(tmp.T, state.c, precision=config.precision)
    if var == "full":
        kss = kern.matrix(theta, xp, config=config)
        cov = (
            kss
            - jnp.matmul(w.T, w, precision=config.precision)
            + jnp.matmul(tmp.T, tmp, precision=config.precision)
        )
        cov = linalg.add_diag(cov, sn2)
        return mean, cov
    if var == "diag":
        kss_diag = kern.diag(theta, xp, config=config)
        v = (
            kss_diag
            - jnp.sum(jnp.square(w), axis=0)
            + jnp.sum(jnp.square(tmp), axis=0)
            + sn2
        )
        return mean, jnp.maximum(v, jnp.asarray(config.jitter, v.dtype))
    return mean, None


def sample_predictive(
    kern: Kernel,
    state: SGPRState,
    xp: Array,
    key,
    n_samples: int = 1,
    config: Config = DEFAULT,
) -> Array:
    """Joint draws from the SGPR posterior at ``xp``:
    ``f = μ + L_Σ z`` through the jitter ladder (the sparse counterpart
    of ``exact_gp.sample_predictive``).  Returns ``[n_samples, nq]``."""
    import jax.random as jrandom

    mean, cov = predict(kern, state, xp, var="full", config=config)
    chol = linalg.safe_cholesky(cov, config).chol
    z = jrandom.normal(key, (n_samples, xp.shape[0]), mean.dtype)
    return mean[None] + jnp.matmul(
        z, chol.T, precision=config.precision
    )


def fit(
    kern: Kernel,
    params0: Array,
    x: Array,
    y: Array,
    z0: Array,
    *,
    opt_inducing: bool = False,
    config: Config = DEFAULT,
    max_iter: int = 200,
    tol: float = 1e-4,
    memory_size: int = 15,
):
    """Maximize the collapsed ELBO by on-device L-BFGS.

    Hyperparameters are optimized in log-space (the house policy for
    σ/ℓ/σₙ positivity and scaling, see ``optimize/lbfgs.py::fit_mle``);
    with ``opt_inducing=True`` the inducing locations z join the
    optimization vector unconstrained — the variational parameters
    cannot overfit (more/better z only tightens the bound).

    Returns ``(FitResult, z_opt)``; ``FitResult.params`` is the packed
    ``[θ…, σₙ]`` vector.  The whole fit is one XLA program.
    """
    from pygpr_tpu.optimize.lbfgs import minimize_lbfgs

    _check_noise_free(kern)
    nhp = params0.shape[-1]
    u0 = jnp.log(jnp.abs(params0))
    if opt_inducing:
        u0 = jnp.concatenate([u0, z0.ravel()])

        def obj(u):
            p = jnp.exp(u[:nhp])
            z = u[nhp:].reshape(z0.shape)
            return neg_elbo(kern, p, x, y, z, config)

    else:

        def obj(u):
            return neg_elbo(kern, jnp.exp(u), x, y, z0, config)

    res = minimize_lbfgs(
        obj, u0, max_iter=max_iter, tol=tol, memory_size=memory_size
    )
    if opt_inducing:
        z_opt = res.params[nhp:].reshape(z0.shape)
        return res._replace(params=jnp.exp(res.params[:nhp])), z_opt
    return res._replace(params=jnp.exp(res.params)), z0


class SGPR:
    """Stateful wrapper in the house OO style (cf. :class:`ExactGP`).

    >>> model = SGPR(x, y, RBF(), m=256)
    >>> model.train()                       # ELBO L-BFGS, on-device
    >>> mean, var = model.predict(xs, var="diag")
    """

    def __init__(
        self,
        x,
        y,
        cov: Kernel,
        m: int = 128,
        z=None,
        seed: int = 0,
        config: Config = DEFAULT,
    ):
        _check_noise_free(cov)
        self.x = jnp.asarray(x)
        self.y = jnp.asarray(y)
        self.cov = cov
        self.config = config
        self.z = jnp.asarray(
            z if z is not None else init_inducing(x, m, seed),
            dtype=self.x.dtype,
        )
        self.params = init_params(cov, self.x, config)
        self.state: Optional[SGPRState] = None
        self.need_upd = True

    def set_params(self, params) -> None:
        self.params = jnp.asarray(params)
        self.need_upd = True

    def set_data(self, x, y) -> None:
        """Rebind training data and mark dirty (``gpr.py:28-31``
        contract; inducing locations are kept)."""
        self.x = jnp.asarray(x)
        self.y = jnp.asarray(y)
        self.need_upd = True

    def train(
        self, opt_inducing: bool = True, max_iter: int = 200, **kw
    ):
        res, z = fit(
            self.cov,
            self.params,
            self.x,
            self.y,
            self.z,
            opt_inducing=opt_inducing,
            config=self.config,
            max_iter=max_iter,
            **kw,
        )
        self.params, self.z = res.params, z
        self.need_upd = True
        return res

    def update(self) -> None:
        if self.need_upd:
            self.state = factorize(
                self.cov, self.params, self.x, self.y, self.z,
                self.config,
            )
            self.need_upd = False

    def predict(self, xp, var: str = "diag"):
        self.update()
        mean, cov = predict(
            self.cov, self.state, jnp.asarray(xp), var, self.config
        )
        return [mean, cov]

    def neg_elbo(self) -> Array:
        return neg_elbo(
            self.cov, self.params, self.x, self.y, self.z, self.config
        )
