"""Product-of-experts committee family: PoE, gPoE, BCM, rBCM.

The reference implements exactly one committee aggregation — grBCM
(``/root/reference/PyGPR/gr_bcm.py:116-149``).  The paper it cites
(arXiv:1806.00720, ``README.md:4``) defines grBCM *by comparison to*
the wider distributed-GP family of Deisenroth & Ng (ICML 2015): the
product of experts (PoE), the generalized PoE (gPoE), the Bayesian
committee machine (BCM) and the robust BCM (rBCM).  A committee
framework is incomplete without them — they are the standard baselines
(and PoE/gPoE need no global/communication expert, so they apply to a
plain partition with no augmentation step).

All four share the precision-combination form used by grBCM

    prec(x*) = Σᵢ βᵢ(x*)·precᵢ(x*)  [+ prior correction]
    mean(x*) = covar(x*) · Σᵢ βᵢ(x*)·precᵢ(x*)·μᵢ(x*)

and differ only in the weights βᵢ and whether the prior precision is
subtracted back:

  ============  ==========================  =============================
  method        βᵢ                          prior correction
  ============  ==========================  =============================
  ``"poe"``     1                           none
  ``"gpoe"``    1/nc (sums to 1)            none
  ``"bcm"``     1                           + (1 − nc)·prec_prior
  ``"rbcm"``    ½(log σ²_prior − log σ²ᵢ)   + (1 − Σᵢβᵢ)·prec_prior
  ============  ==========================  =============================

The BCM/rBCM prior correction is what restores the prior far from the
data (PoE/gPoE collapse to overconfident/prior-width-but-wrong-mean
estimates there); rBCM's entropy weights additionally down-weight
experts that have learned nothing about a query point.

TPU mapping: per-expert predicts are the batched ``exact_gp.predict``
(vmap/lax.map over the committee axis — the shard axis on a mesh), the
aggregation is three masked sums over that axis (``psum`` when sharded;
see ``parallel/sharded.py::committee_predict_sharded``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.models import exact_gp
from pygpr_tpu.models.grbcm import AggregateResult
from pygpr_tpu.ops.kernels import Kernel

Array = jax.Array

METHODS = ("poe", "gpoe", "bcm", "rbcm")


def committee_beta(
    method: str,
    var_l: Array,
    prior_var: Array,
    mask: Optional[Array] = None,
) -> Array:
    """Per-expert, per-query weights βᵢ(x*) ``[nc, np]``.

    ``var_l: [nc, np]`` expert posterior variances; ``prior_var``
    ``[np]`` or ``[nc, np]`` prior variance(s) at the queries;
    ``mask: [nc]`` bool (True keeps the expert).
    """
    if method not in METHODS:
        raise ValueError(f"method must be one of {METHODS}, got {method!r}")
    nc = var_l.shape[0]
    pv = jnp.broadcast_to(prior_var, var_l.shape)
    if method == "poe" or method == "bcm":
        beta = jnp.ones_like(var_l)
    elif method == "gpoe":
        if mask is not None:
            n_act = jnp.maximum(jnp.sum(mask.astype(var_l.dtype)), 1.0)
        else:
            n_act = jnp.asarray(float(nc), var_l.dtype)
        beta = jnp.full_like(var_l, 1.0) / n_act
    else:  # rbcm — differential-entropy weights, clamped ≥ 0 (an f32
        # posterior variance can exceed the prior by rounding, which
        # would otherwise make βᵢ negative and the precision indefinite)
        beta = jnp.maximum(0.5 * (jnp.log(pv) - jnp.log(var_l)), 0.0)
    if mask is not None:
        beta = jnp.where(mask[:, None], beta, 0.0)
    return beta


def aggregate_committee(
    method: str,
    ys_l: Array,
    var_l: Array,
    prior_var: Array,
    *,
    mask: Optional[Array] = None,
    config: Config = DEFAULT,
) -> AggregateResult:
    """Combine independent expert posteriors ``(ys_l, var_l): [nc, np]``
    into one Gaussian per query point (diagonal path).

    ``prior_var`` is the prior variance k(x*, x*) at the queries —
    ``[np]`` for shared hyperparameters or ``[nc, np]`` per-expert (the
    BCM-family correction then uses the committee-mean prior
    precision; with shared hyperparameters this reduces to the
    textbook formulas exactly).
    """
    beta = committee_beta(method, var_l, prior_var, mask)
    prec_l = 1.0 / var_l
    pv = jnp.broadcast_to(prior_var, var_l.shape)
    if mask is not None:
        prec_prior = jnp.sum(
            jnp.where(mask[:, None], 1.0 / pv, 0.0), axis=0
        ) / jnp.maximum(jnp.sum(mask.astype(pv.dtype)), 1.0)
    else:
        prec_prior = jnp.mean(1.0 / pv, axis=0)

    wprec = beta * prec_l                     # masked via beta
    prec = jnp.sum(wprec, axis=0)             # [np]
    if method == "bcm" or method == "rbcm":
        prec = prec + (1.0 - jnp.sum(beta, axis=0)) * prec_prior
    # Deisenroth & Ng guarantee prec ≥ prec_prior for valid posteriors
    # (βᵢ ≥ 0 and precᵢ ≥ prec_prior); the floor only guards f32
    # rounding at the boundary.
    floor = jnp.asarray(config.jitter, prec.dtype) * prec_prior
    prec = jnp.maximum(prec, floor)
    covar = 1.0 / prec
    mean = covar * jnp.sum(wprec * ys_l, axis=0)
    return AggregateResult(mean, covar, beta, prec_l)


def prior_variance(
    kern: Kernel, params: Array, xs: Array, config: Config = DEFAULT
) -> Array:
    """Prior variance k(x*, x*) at the queries; auto-vmaps a leading
    per-expert parameter axis (``[nc, nhp] → [nc, np]``)."""
    if params.ndim == 2:
        return jax.vmap(
            lambda p: kern.diag(p, xs, config=config)
        )(params)
    return kern.diag(params, xs, config=config)


def predict_committee(
    kern: Kernel,
    state_l: exact_gp.GPState,
    xs: Array,
    method: str = "rbcm",
    *,
    mask: Optional[Array] = None,
    config: Config = DEFAULT,
    stream: bool = False,
) -> AggregateResult:
    """Committee prediction over a batched expert state ``[nc, ...]``:
    per-expert diag predicts (vmap, or ``lax.map`` when ``stream``) +
    the chosen aggregation.  Unlike grBCM there is no global expert and
    no augmentation — experts are plain data shards."""
    ys_l, var_l = exact_gp.predict(
        kern, state_l, xs, "diag", config, stream=stream
    )
    pv = prior_variance(kern, state_l.params, xs, config)
    return aggregate_committee(
        method, ys_l, var_l, pv, mask=mask, config=config
    )


def fit_committee(
    kern: Kernel,
    xl: Array,
    yl: Array,
    *,
    params0: Optional[Array] = None,
    config: Config = DEFAULT,
    max_iter: int = 200,
    tol: float = 1e-4,
    log_space: bool = True,
    shared: bool = True,
):
    """Hyperparameter fit for a plain (non-augmented) committee.

    ``shared=True`` (default, the calibrated choice — same reasoning as
    ``grbcm.fit``): one parameter vector minimizing the summed expert
    NLML.  ``shared=False``: independent vmapped per-expert L-BFGS.
    Returns the ``optimize.lbfgs`` fit result; ``result.params`` is
    ``[nhp]`` (shared) or ``[nc, nhp]``.
    """
    from pygpr_tpu.models.likelihood import nlml as _nlml
    from pygpr_tpu.optimize.lbfgs import fit_mle, minimize_lbfgs

    if params0 is None:
        params0 = jnp.ones((kern.n_params(xl.shape[-1]),), dtype=xl.dtype)
    if not shared:
        nc = xl.shape[0]
        p0_l = jnp.broadcast_to(params0, (nc,) + params0.shape)
        return fit_mle(
            kern, p0_l, xl, yl,
            config=config, max_iter=max_iter, tol=tol, log_space=log_space,
        )

    def total(u):
        q = jnp.exp(u) if log_space else u
        return jnp.sum(_nlml(kern, q, xl, yl, config))

    u0 = jnp.log(jnp.abs(params0)) if log_space else params0
    res = minimize_lbfgs(total, u0, max_iter=max_iter, tol=tol)
    if log_space:
        res = res._replace(params=jnp.exp(res.params))
    return res
