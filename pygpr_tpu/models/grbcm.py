"""Generalized robust Bayesian Committee Machine (grBCM).

Re-design of the reference's scalable-GP centerpiece
(``PyGPR/gr_bcm.py``, paper arXiv:1806.00720 cited in the reference
README) for JAX/TPU:

  * **Augmentation** (``gr_bcm.py:19-26``): each of the nc local experts
    trains on the concatenation of the global/communication set
    ``(xg, yg)`` with its local shard ``(xl_i, yl_i)``.
  * **Training**: the reference's ``GRBCM.train`` is stale/broken — it
    calls APIs that no longer exist (``gr_bcm.py:37``, ``:55``, ``:64``;
    SURVEY.md §2.5).  :func:`fit` implements the *intent*: independent
    per-expert NLML minimization (vmapped on-device L-BFGS — the
    embarrassingly parallel axis that shards across TPU chips) plus a
    global-expert fit.
  * **Aggregation** (``gr_bcm.py:116-149``): β-weighted
    precision combination.  ``prec₀ = 1/var_g``, ``precᵢ = 1/var_lᵢ``;
    ``βᵢ = ½(log precᵢ − log prec₀)`` per test point
    (``gr_bcm.py:131``), the communication expert is forced ``β₁ = 1``
    (``gr_bcm.py:132``), and the global expert takes
    ``β₀ = 1 − Σᵢ≥₁ βᵢ`` (``gr_bcm.py:133``).  Diagonal path:
    ``covar = (Σ βᵢ precᵢ)⁻¹``, ``mean = covar Σ βᵢ precᵢ μᵢ``
    (``gr_bcm.py:140-144``) — on a sharded mesh those sums are a single
    ``psum`` over the expert axis (see ``pygpr_tpu.parallel``).
  * **Failure masking** (SURVEY.md §5.3, absent in the reference): a
    per-expert boolean mask zeroes failed experts out of the β sums so
    one diverged fit cannot poison the committee.

Everything here is a pure function of arrays; the :class:`GRBCM` class
at the bottom is a thin stateful wrapper mirroring the reference API.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.models import exact_gp
from pygpr_tpu.ops import linalg
from pygpr_tpu.ops.kernels import Kernel

Array = jax.Array


def augment(xl: Array, yl: Array, xg: Array, yg: Array) -> Tuple[Array, Array]:
    """Build augmented expert datasets (``gr_bcm.py:19-26``).

    ``xl: [nc, nls, d]``, ``xg: [ng, d]`` →
    ``x_aug: [nc, ng+nls, d]`` with the global set replicated in front
    of every expert's local shard.
    """
    nc = xl.shape[0]
    xg_b = jnp.broadcast_to(xg[None], (nc,) + xg.shape)
    yg_b = jnp.broadcast_to(yg[None], (nc,) + yg.shape)
    return (
        jnp.concatenate([xg_b, xl], axis=1),
        jnp.concatenate([yg_b, yl], axis=1),
    )


class AggregateResult(NamedTuple):
    mean: Array    #: aggregated posterior mean [np]
    covar: Array   #: aggregated variance [np] (diag) or covariance [np,np]
    beta: Array    #: β weights [nc+1, np] (observability, gr_bcm.py:135)
    prec: Array    #: expert precisions [nc+1, np] (gr_bcm.py:136)


def aggregate(
    ys_g: Array,
    var_g: Array,
    ys_l: Array,
    var_l: Array,
    *,
    mask: Optional[Array] = None,
    config: Config = DEFAULT,
) -> AggregateResult:
    """Diagonal-variance grBCM aggregation (``gr_bcm.py:116-149``).

    ``ys_g/var_g: [np]`` global expert; ``ys_l/var_l: [nc, np]`` local
    experts; optional ``mask: [nc]`` bool — True keeps an expert.
    """
    prec_g = 1.0 / var_g                      # [np]
    prec_l = 1.0 / var_l                      # [nc, np]
    prec = jnp.concatenate([prec_g[None], prec_l], axis=0)

    beta_l = 0.5 * (jnp.log(prec_l) - jnp.log(prec_g)[None])  # [nc, np]
    # Communication expert pinned to weight 1 (gr_bcm.py:132).
    beta_l = beta_l.at[0].set(1.0)
    if mask is not None:
        beta_l = jnp.where(mask[:, None], beta_l, 0.0)
    beta_0 = 1.0 - jnp.sum(beta_l, axis=0)    # [np] (gr_bcm.py:133)
    beta = jnp.concatenate([beta_0[None], beta_l], axis=0)

    precs = prec * beta                        # β-weighted precisions
    if mask is not None:
        full_mask = jnp.concatenate(
            [jnp.ones((1,), bool), mask], axis=0
        )
        precs = jnp.where(full_mask[:, None], precs, 0.0)

    covar = 1.0 / jnp.sum(precs, axis=0)      # (gr_bcm.py:140-144)
    ys = jnp.concatenate([ys_g[None], ys_l], axis=0)
    mean = covar * jnp.sum(ys * precs, axis=0)
    return AggregateResult(mean, covar, beta, prec)


def aggregate_full_covar(
    beta: Array,
    covars_g: Array,
    covars_l: Array,
    *,
    config: Config = DEFAULT,
) -> Array:
    """Full-covariance aggregation (``gr_bcm.py:99-114``): invert each
    expert's posterior covariance, weight the precision matrices by the
    symmetrized ``½(βᵢ+βⱼ)`` (``gr_bcm.py:105-108``), sum, invert back."""
    covar_gl = jnp.concatenate([covars_g[None], covars_l], axis=0)
    chd = jax.vmap(lambda c: linalg.safe_cholesky(c, config).chol)(covar_gl)
    prec_gl = jax.vmap(linalg.inv_from_chol)(chd)

    beta_sym = 0.5 * (beta[:, :, None] + beta[:, None, :])
    prec = jnp.sum(prec_gl * beta_sym, axis=0)
    return linalg.inv_from_chol(linalg.safe_cholesky(prec, config).chol)


def predict(
    kern: Kernel,
    params_g: Array,
    params_l: Array,
    state_g: exact_gp.GPState,
    state_l: exact_gp.GPState,
    xs: Array,
    var: str = "diag",
    *,
    mask: Optional[Array] = None,
    config: Config = DEFAULT,
    stream: bool = False,
) -> AggregateResult:
    """Committee prediction: global + batched local predicts, then
    aggregation (``gr_bcm.py:151-155``).  ``stream=True`` sequentializes
    experts for single-chip memory (see ``exact_gp.factorize``)."""
    ys_g, cov_g = exact_gp.predict(kern, state_g, xs, var, config)
    ys_l, cov_l = exact_gp.predict(
        kern, state_l, xs, var, config, stream=stream
    )

    if var == "diag":
        var_g, var_l = cov_g, cov_l
    else:
        # Same jitter floor as the diag path (exact_gp._predict_var_one)
        # so β weights agree between the two modes.
        floor = jnp.asarray(config.jitter, cov_g.dtype)
        var_g = jnp.maximum(jnp.diagonal(cov_g, axis1=-2, axis2=-1), floor)
        var_l = jnp.maximum(jnp.diagonal(cov_l, axis1=-2, axis2=-1), floor)

    res = aggregate(ys_g, var_g, ys_l, var_l, mask=mask, config=config)
    if var == "diag":
        return res
    covars = aggregate_full_covar(res.beta, cov_g, cov_l, config=config)
    # Reference uses the diag-based β-precisions for the mean even in
    # full mode (gr_bcm.py:147-148).
    return AggregateResult(res.mean, covars, res.beta, res.prec)


def sample_predictive(
    kern: Kernel,
    params_g: Array,
    params_l: Array,
    state_g: exact_gp.GPState,
    state_l: exact_gp.GPState,
    xs: Array,
    key: Array,
    n_samples: int = 1,
    *,
    mask: Optional[Array] = None,
    config: Config = DEFAULT,
    stream: bool = False,
) -> Array:
    """Joint draws from the aggregated committee posterior at ``xs``.

    Runs the full-covariance committee predict (the reference's
    ``aggregate_full_covar`` combination, ``gr_bcm.py:99-114``), then
    ``f = μ + Lₚ z`` through the jitter ladder.  Returns
    ``[n_samples, np]``.  No reference analogue (the reference samples
    the prior only, ``sampler.py:122-137``).
    """
    res = predict(
        kern, params_g, params_l, state_g, state_l, xs, "full",
        mask=mask, config=config, stream=stream,
    )
    lp = linalg.safe_cholesky(res.covar, config).chol
    z = jax.random.normal(key, (xs.shape[-2], n_samples), dtype=xs.dtype)
    return (
        res.mean[None, :]
        + jnp.matmul(lp, z, precision=config.precision).T
    )


class FitInfo(NamedTuple):
    params_g: Array     #: fitted global-expert hyperparameters [nhp]
    params_l: Array     #: fitted per-expert hyperparameters [nc, nhp]
    nlml_g: Array       #: global-expert NLML at the optimum
    nlml_l: Array       #: per-expert NLML [nc]
    ok_l: Array         #: per-expert success mask [nc] (finite optimum)


def fit(
    kern: Kernel,
    xl: Array,
    yl: Array,
    xg: Array,
    yg: Array,
    *,
    params0: Optional[Array] = None,
    config: Config = DEFAULT,
    max_iter: int = 200,
    tol: float = 1e-4,
    log_space: bool = True,
    shared: bool = False,
    stream: bool = False,
    segment_iters: Optional[int] = None,
) -> Tuple[FitInfo, Array, Array]:
    """Working replacement for the reference's broken ``GRBCM.train``
    (``gr_bcm.py:36-97``): per-expert L-BFGS fits on the augmented
    datasets (vmapped — one XLA program for the whole committee) plus a
    global-expert fit.

    ``shared=True`` instead optimizes **one** hyperparameter vector on
    the summed expert NLML (the grBCM paper's joint training) — this is
    the calibrated choice: independently fitted experts can disagree
    wildly on noise levels, and the β-weighted precision combination
    then overclaims confidence (NLPD blows up even when RMSE is fine).

    ``stream=True`` (shared mode) sequentializes experts with
    ``lax.map`` so peak memory is ONE expert's gram — the single-chip
    mode for BASELINE-scale committees (16×6k+ experts OOM a 16 GB
    chip vmapped).  The objective is ``nlml_fast`` whose custom VJP
    stores only the nhp-vector gradient per expert, so reverse-mode
    through the map costs O(nc·nhp) residual memory, not O(nc·n²).

    ``segment_iters`` (shared mode) breaks the L-BFGS loop into
    host-synced segments of that many iterations.  Needed on remote/
    tunneled TPU runtimes that kill any single device execution past a
    wall-clock watchdog (~200 s observed): a BASELINE-scale committee
    fit is minutes of device time in one ``lax.while_loop`` otherwise.
    L-BFGS curvature memory restarts per segment (same tradeoff as
    ``optimize.resumable``), costing a few extra iterations.

    Returns ``(FitInfo, x_aug, y_aug)``.
    """
    from pygpr_tpu.optimize.lbfgs import fit_mle, minimize_lbfgs

    x_aug, y_aug = augment(xl, yl, xg, yg)
    if params0 is None:
        # Neutral all-ones start (θ=1, noise=1): shrinking the noise
        # downward from the data scale is well-conditioned, while the
        # kernel layer's parity init (noise 1e-4, covar.py:224) starts
        # in the near-singular interpolation regime and traps f32 fits.
        params0 = jnp.ones(
            (kern.n_params(xg.shape[-1]),), dtype=xg.dtype
        )

    res_g = fit_mle(
        kern, params0, xg, yg,
        config=config, max_iter=max_iter, tol=tol, log_space=log_space,
    )
    nc = xl.shape[0]
    if shared:
        from pygpr_tpu.models.likelihood import nlml as _nlml
        from pygpr_tpu.models.likelihood import nlml_fast as _nlml_fast

        if stream:
            def committee_vals(q):
                return jax.lax.map(
                    lambda ab: _nlml_fast(
                        kern, q, ab[0], ab[1], config
                    ),
                    (x_aug, y_aug),
                )
        else:
            def committee_vals(q):
                return _nlml(kern, q, x_aug, y_aug, config)

        def total(u):
            q = jnp.exp(u) if log_space else u
            return jnp.sum(committee_vals(q))

        u0 = jnp.log(jnp.abs(params0)) if log_space else params0
        if segment_iters is None:
            res_s = minimize_lbfgs(total, u0, max_iter=max_iter, tol=tol)
        else:
            # jit the segment runner ONCE — the axon PJRT has no
            # persistent compile cache, so a fresh minimize_lbfgs trace
            # per segment would re-pay the full compile every ~40 s of
            # work.  Segments always run segment_iters (the last one may
            # overshoot max_iter by < segment_iters; L-BFGS stops itself
            # at convergence) so every call hits the same executable.
            seg_fn = jax.jit(
                lambda u: minimize_lbfgs(
                    total, u, max_iter=segment_iters, tol=tol
                )
            )
            u, done = u0, 0
            while True:
                res_s = seg_fn(u)
                u = res_s.params
                it = int(res_s.iters)  # transfer = device sync
                done += it
                if (
                    bool(res_s.converged)
                    or it == 0
                    or done >= max_iter
                ):
                    break
            res_s = res_s._replace(iters=jnp.asarray(done))
        p_shared = jnp.exp(res_s.params) if log_space else res_s.params
        vals = committee_vals(p_shared)
        res_l = res_s._replace(
            params=jnp.broadcast_to(p_shared, (nc,) + p_shared.shape),
            value=vals,
        )
    else:
        p0_l = jnp.broadcast_to(params0, (nc,) + params0.shape)
        res_l = fit_mle(
            kern, p0_l, x_aug, y_aug,
            config=config, max_iter=max_iter, tol=tol, log_space=log_space,
        )
    ok_l = jnp.all(jnp.isfinite(res_l.params), axis=-1) & jnp.isfinite(
        res_l.value
    )
    info = FitInfo(
        params_g=res_g.params,
        params_l=res_l.params,
        nlml_g=res_g.value,
        nlml_l=res_l.value,
        ok_l=ok_l,
    )
    return info, x_aug, y_aug


class GRBCM:
    """Stateful wrapper mirroring the reference API
    (``GRBCM``, ``gr_bcm.py:11-155``): construct from local shards +
    global set, ``train()``, ``predict(xs, var)``; stashes ``beta`` /
    ``prec`` after aggregation for observability (``gr_bcm.py:135-136``).
    """

    def __init__(self, xl, yl, xg, yg, cov: Kernel, config: Config = DEFAULT,
                 stream: bool = False):
        xl, yl = jnp.asarray(xl), jnp.asarray(yl)
        xg, yg = jnp.asarray(xg), jnp.asarray(yg)
        self.nc = xl.shape[0]
        self.nsc = xl.shape[1]
        self.ng = xg.shape[0]
        self.dim = xg.shape[1]
        self.cov = cov
        self.config = config
        self.xl, self.yl, self.xg, self.yg = xl, yl, xg, yg
        x, y = augment(xl, yl, xg, yg)
        self.stream = stream
        self.gpg = exact_gp.ExactGP(xg, yg, cov, config)
        self.gpl = exact_gp.ExactGP(x, y, cov, config, stream=stream)
        self.mask = jnp.ones((self.nc,), bool)
        self.beta = None
        self.prec = None

    def train(
        self, max_iter: int = 200, tol: float = 1e-4,
        shared: bool = True,
    ) -> FitInfo:
        """Hyperparameter fits (the intended semantics of the
        reference's broken ``train``, SURVEY.md §2.5).

        ``shared=True`` (default): one hyperparameter vector on the
        summed expert NLML — the paper's joint training, and the
        calibrated choice for the β aggregation.  ``shared=False``:
        independent per-expert fits (the reference loop's structure).
        """
        info, _, _ = fit(
            self.cov, self.xl, self.yl, self.xg, self.yg,
            config=self.config, max_iter=max_iter, tol=tol,
            shared=shared,
        )
        self.gpg.set_params(info.params_g)
        self.gpl.set_params(info.params_l)
        self.mask = info.ok_l
        return info

    def prepare_serving(self) -> None:
        """Precompute ``T = L⁻¹`` on both the global and expert states
        (``exact_gp.precompute_tinv``): all later predicts are
        GEMM-only at half the solve flops."""
        self.gpg.prepare_serving()
        self.gpl.prepare_serving()

    def predict(self, xs, var: str = "diag"):
        self.gpg.update()
        self.gpl.update()
        res = predict(
            self.cov,
            self.gpg.params,
            self.gpl.params,
            self.gpg.state,
            self.gpl.state,
            jnp.asarray(xs),
            var,
            mask=self.mask,
            config=self.config,
            stream=self.stream,
        )
        self.beta = res.beta
        self.prec = res.prec
        return res.mean, res.covar

    def aggregate(self, ys_g, covars_g, ys_l, covars_l, var="diag"):
        """Reference-parity aggregation entry (``gr_bcm.py:116-149``)."""
        if var == "diag":
            var_g, var_l = covars_g, covars_l
        else:
            var_g = jnp.diagonal(covars_g, axis1=-2, axis2=-1)
            var_l = jnp.diagonal(covars_l, axis1=-2, axis2=-1)
        res = aggregate(
            ys_g, var_g, ys_l, var_l, mask=self.mask, config=self.config
        )
        self.beta = res.beta
        self.prec = res.prec
        if var == "diag":
            return res.mean, res.covar
        covars = aggregate_full_covar(
            res.beta, covars_g, covars_l, config=self.config
        )
        return res.mean, covars
