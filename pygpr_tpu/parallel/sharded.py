"""Expert-parallel grBCM and chain-parallel MCMC over a device mesh.

TPU-native realization of SURVEY.md §2.10 / §5.7:

  * **EP (expert parallel)** — grBCM's nc experts shard over the
    ``"expert"`` mesh axis.  Per-expert factorize/fit/predict are local
    to a device (embarrassingly parallel, the intent of the reference's
    broken per-expert ``scipy`` loop, ``gr_bcm.py:58-66``); the
    β-weighted aggregation sums (``gr_bcm.py:140-144``) become single
    ``lax.psum`` collectives over ICI.
  * **Chain parallel (DP-analogue)** — independent MCMC chains shard
    over the ``"chain"`` axis; the Robbins-Monro step-size statistic is
    ``pmean``-ed across chains/hosts ("cross-host step-size adaptation"
    in the north star).

Correctness invariant (tested on an 8-virtual-device CPU mesh):
sharded execution == the vmapped single-device computation, which the
reference's own batch-vs-loop tests pin down (``tests/test_gpr.py:60-76``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.models import exact_gp
from pygpr_tpu.ops.kernels import Kernel
from pygpr_tpu.parallel.mesh import CHAIN_AXIS, EXPERT_AXIS

Array = jax.Array


def grbcm_predict_sharded(
    kern: Kernel,
    params_g: Array,
    params_l: Array,
    xg: Array,
    yg: Array,
    x_aug: Array,
    y_aug: Array,
    xs: Array,
    mesh: Mesh,
    *,
    var: str = "diag",
    mask: Optional[Array] = None,
    config: Config = DEFAULT,
) -> Tuple[Array, Array]:
    """grBCM prediction with experts sharded over the mesh's
    ``"expert"`` axis.

    Inputs: ``params_l/x_aug/y_aug`` lead with nc (sharded); ``xg/yg/xs``
    replicated.  Returns aggregated ``(mean [np], var [np])`` for
    ``var="diag"`` or ``(mean [np], covar [np, np])`` for
    ``var="full"`` (the reference's ``aggregate_full_covar``,
    ``gr_bcm.py:99-114``, as a psum of β-weighted precision matrices).

    The math mirrors ``models.grbcm.aggregate`` exactly, with the three
    expert sums turned into ``psum`` collectives; the communication
    expert (global expert index 1 ≙ local expert 0 on shard 0,
    ``gr_bcm.py:132``) is pinned via ``lax.axis_index``.
    """
    nc = x_aug.shape[0]
    if mask is None:
        mask = jnp.ones((nc,), bool)

    def local_fn(p_l, xa, ya, m, xg, yg, xs):
        # --- local experts (this device's shard) --------------------
        state_l = exact_gp.factorize(kern, p_l, xa, ya, config)
        ys_l, cov_l = exact_gp.predict(kern, state_l, xs, var, config)

        # --- global expert (replicated work) ------------------------
        state_g = exact_gp.factorize(kern, params_g, xg, yg, config)
        ys_g, cov_g = exact_gp.predict(kern, state_g, xs, var, config)

        if var == "diag":
            var_g, var_l = cov_g, cov_l
        else:
            # match models.grbcm.predict: β uses the jitter-floored
            # diagonals so both modes agree on the weights
            floor = jnp.asarray(config.jitter, cov_g.dtype)
            var_g = jnp.maximum(
                jnp.diagonal(cov_g, axis1=-2, axis2=-1), floor
            )
            var_l = jnp.maximum(
                jnp.diagonal(cov_l, axis1=-2, axis2=-1), floor
            )

        prec_g = 1.0 / var_g                       # [np]
        prec_l = 1.0 / var_l                       # [nc_loc, np]
        beta_l = 0.5 * (jnp.log(prec_l) - jnp.log(prec_g)[None])
        # Pin the communication expert: global index 1 == local row 0
        # of expert-shard 0.
        is_first_shard = lax.axis_index(EXPERT_AXIS) == 0
        pin = (
            jnp.arange(beta_l.shape[0])[:, None] == 0
        ) & is_first_shard
        beta_l = jnp.where(pin, 1.0, beta_l)
        beta_l = jnp.where(m[:, None], beta_l, 0.0)

        # --- psum aggregation over the expert axis ------------------
        s_beta = lax.psum(jnp.sum(beta_l, axis=0), EXPERT_AXIS)
        s_prec = lax.psum(jnp.sum(beta_l * prec_l, axis=0), EXPERT_AXIS)
        s_mu = lax.psum(
            jnp.sum(beta_l * prec_l * ys_l, axis=0), EXPERT_AXIS
        )

        beta_0 = 1.0 - s_beta                       # gr_bcm.py:133
        denom = beta_0 * prec_g + s_prec
        covar = 1.0 / denom
        mean = covar * (beta_0 * prec_g * ys_g + s_mu)
        if var == "diag":
            return mean, covar

        # --- full-covariance aggregation (gr_bcm.py:99-114) ---------
        # Each expert's posterior covariance inverts locally; the
        # ½(βᵢ+βⱼ)-weighted precision matrices psum over the expert
        # axis; the global expert's term is added replicated (identical
        # on every shard, so it enters the sum exactly once).
        from pygpr_tpu.ops import linalg

        chd_l = jax.vmap(
            lambda c: linalg.safe_cholesky(c, config).chol
        )(cov_l)
        prec_mat_l = jax.vmap(linalg.inv_from_chol)(chd_l)
        beta_sym_l = 0.5 * (
            beta_l[:, :, None] + beta_l[:, None, :]
        )                                           # [nc_loc, np, np]
        S = lax.psum(
            jnp.sum(beta_sym_l * prec_mat_l, axis=0), EXPERT_AXIS
        )
        prec_mat_g = linalg.inv_from_chol(
            linalg.safe_cholesky(cov_g, config).chol
        )
        beta0_sym = 0.5 * (beta_0[:, None] + beta_0[None, :])
        P_total = S + beta0_sym * prec_mat_g
        cov_full = linalg.inv_from_chol(
            linalg.safe_cholesky(P_total, config).chol
        )
        return mean, cov_full

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(EXPERT_AXIS),  # params_l
            P(EXPERT_AXIS),  # x_aug
            P(EXPERT_AXIS),  # y_aug
            P(EXPERT_AXIS),  # mask
            P(),             # xg
            P(),             # yg
            P(),             # xs
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(params_l, x_aug, y_aug, mask, xg, yg, xs)


def grbcm_fit_sharded(
    kern: Kernel,
    params0: Array,
    xg: Array,
    yg: Array,
    x_aug: Array,
    y_aug: Array,
    mesh: Mesh,
    *,
    config: Config = DEFAULT,
    max_iter: int = 200,
    tol: float = 1e-4,
    log_space: bool = True,
    shared: bool = True,
) -> Tuple[Array, Array, Array, Array]:
    """Committee hyperparameter fits sharded over the ``"expert"``
    axis + a replicated global fit.

    ``shared=True`` (default — the calibrated mode, matching
    ``models.grbcm.fit(shared=True)``): ONE hyperparameter vector is
    optimized on the **joint** committee NLML.  Each device sums the
    NLML of its local experts and the total objective (value and, via
    AD transposition, gradient) is a ``lax.psum`` over the expert axis
    inside ``shard_map`` — the parameters stay replicated, so every
    device runs the identical L-BFGS trajectory on the globally-reduced
    objective (the grBCM paper's joint training, intent of the
    reference's broken loop ``gr_bcm.py:58-74``).  Independent
    per-expert fits (``shared=False``) make the β-precision
    aggregation badly overconfident (see ``models/grbcm.py``).

    ``shared=False``: independent per-expert L-BFGS fits, no
    collectives (the reference loop's literal structure).

    Returns ``(params_g, params_l [nc, nhp], nlml_g, nlml_l [nc])``;
    for ``shared=True`` the rows of ``params_l`` are identical and
    ``nlml_l`` holds each expert's NLML at the shared optimum.
    """
    from pygpr_tpu.models.likelihood import nlml as _nlml
    from pygpr_tpu.optimize.lbfgs import fit_mle, minimize_lbfgs

    nc = x_aug.shape[0]
    p0_l = jnp.broadcast_to(params0, (nc,) + params0.shape)

    def local_fn(p0_l, xa, ya, xg, yg):
        res_g = fit_mle(
            kern, params0, xg, yg,
            config=config, max_iter=max_iter, tol=tol, log_space=log_space,
        )
        if shared:
            def local_val(u):
                q = jnp.exp(u) if log_space else u
                return jnp.sum(_nlml(kern, q, xa, ya, config))

            # The joint objective must expose a GLOBALLY-reduced
            # gradient to plain ``jax.value_and_grad`` (optax's zoom
            # line search differentiates value_fn itself): inside
            # shard_map the transpose of psum is identity, so a naive
            # ``psum(local)`` objective would hand every device only
            # its LOCAL gradient — devices would then run divergent
            # L-BFGS trajectories and deadlock on mismatched
            # collective counts.  custom_vjp psums both directions.
            @jax.custom_vjp
            def total(u):
                return lax.psum(local_val(u), EXPERT_AXIS)

            def _total_fwd(u):
                return lax.psum(local_val(u), EXPERT_AXIS), u

            def _total_bwd(u, g):
                _, vjp = jax.vjp(local_val, u)
                (gu,) = vjp(g)
                return (lax.psum(gu, EXPERT_AXIS),)

            total.defvjp(_total_fwd, _total_bwd)

            u0 = jnp.log(jnp.abs(params0)) if log_space else params0
            res_s = minimize_lbfgs(total, u0, max_iter=max_iter, tol=tol)
            p_shared = (
                jnp.exp(res_s.params) if log_space else res_s.params
            )
            vals = _nlml(kern, p_shared, xa, ya, config)   # [nc_loc]
            p_l = jnp.broadcast_to(
                p_shared, (xa.shape[0],) + p_shared.shape
            )
            return res_g.params, p_l, res_g.value, vals
        res_l = fit_mle(
            kern, p0_l, xa, ya,
            config=config, max_iter=max_iter, tol=tol, log_space=log_space,
        )
        return res_g.params, res_l.params, res_g.value, res_l.value

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(EXPERT_AXIS), P(EXPERT_AXIS), P(EXPERT_AXIS), P(), P()),
        out_specs=(P(), P(EXPERT_AXIS), P(), P(EXPERT_AXIS)),
        check_vma=False,
    )
    return fn(p0_l, x_aug, y_aug, xg, yg)


def committee_predict_sharded(
    kern: Kernel,
    params_l: Array,
    xl: Array,
    yl: Array,
    xs: Array,
    mesh: Mesh,
    method: str = "rbcm",
    *,
    mask: Optional[Array] = None,
    config: Config = DEFAULT,
) -> Tuple[Array, Array]:
    """PoE-family committee prediction (``models.committee``) with the
    plain (non-augmented) experts sharded over the ``"expert"`` axis.

    Per-expert factorize/predict run device-local; the aggregation is
    four ``psum``s (Σβ, Σβ·prec, Σβ·prec·μ, and the committee-mean
    prior precision for the BCM/rBCM correction).  Matches
    ``models.committee.predict_committee`` exactly — the sharded ==
    batched invariant is tested on the 8-virtual-device mesh.
    """
    from pygpr_tpu.models.committee import METHODS

    if method not in METHODS:
        raise ValueError(f"method must be one of {METHODS}, got {method!r}")
    nc = xl.shape[0]
    if mask is None:
        mask = jnp.ones((nc,), bool)

    def local_fn(p_l, xa, ya, m, xs):
        state_l = exact_gp.factorize(kern, p_l, xa, ya, config)
        ys_l, var_l = exact_gp.predict(kern, state_l, xs, "diag", config)
        pv = jax.vmap(lambda p: kern.diag(p, xs, config=config))(
            state_l.params
        )                                           # [nc_loc, np]

        mf = m.astype(var_l.dtype)
        n_act = jnp.maximum(
            lax.psum(jnp.sum(mf), EXPERT_AXIS), 1.0
        )
        prec_prior = (
            lax.psum(jnp.sum(mf[:, None] / pv, axis=0), EXPERT_AXIS)
            / n_act
        )

        if method in ("poe", "bcm"):
            beta = jnp.ones_like(var_l)
        elif method == "gpoe":
            beta = jnp.ones_like(var_l) / n_act
        else:  # rbcm
            beta = jnp.maximum(
                0.5 * (jnp.log(pv) - jnp.log(var_l)), 0.0
            )
        beta = jnp.where(m[:, None], beta, 0.0)

        wprec = beta / var_l
        s_beta = lax.psum(jnp.sum(beta, axis=0), EXPERT_AXIS)
        s_prec = lax.psum(jnp.sum(wprec, axis=0), EXPERT_AXIS)
        s_mu = lax.psum(jnp.sum(wprec * ys_l, axis=0), EXPERT_AXIS)

        prec = s_prec
        if method in ("bcm", "rbcm"):
            prec = prec + (1.0 - s_beta) * prec_prior
        floor = jnp.asarray(config.jitter, prec.dtype) * prec_prior
        prec = jnp.maximum(prec, floor)
        covar = 1.0 / prec
        return covar * s_mu, covar

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(EXPERT_AXIS),  # params_l
            P(EXPERT_AXIS),  # xl
            P(EXPERT_AXIS),  # yl
            P(EXPERT_AXIS),  # mask
            P(),             # xs
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    p_all = (
        params_l
        if params_l.ndim == 2
        else jnp.broadcast_to(params_l, (nc,) + params_l.shape)
    )
    return fn(p_all, xl, yl, mask, xs)


def mcmc_sharded(
    kern: Kernel,
    x: Array,
    y: Array,
    key: Array,
    mesh: Mesh,
    *,
    n_chains: int,
    coordinate_step_size: bool = True,
    sampler: str = "rwm",
    **mcmc_kwargs,
):
    """MCMC chains sharded over the ``"chain"`` mesh axis, with the
    step-size adaptation statistic ``pmean``-ed across all chains
    (north-star "step-size adaptation coordinated across hosts").

    ``sampler`` selects the kernel: ``"rwm"`` (adaptive random-walk /
    HMC, ``sample.mcmc.sample_posterior`` — returns ``MCMCResult``),
    ``"nuts"`` (iterative multinomial NUTS with dual averaging,
    ``sample.nuts.sample_posterior_nuts`` — returns ``NUTSResult``),
    or ``"ess"`` (elliptical slice sampling of the LATENT posterior,
    ``sample.ess.sample_latent`` — returns ``ESSResult``; pass
    ``params``, ``lik``, ``lik_params`` through the kwargs).  The
    hyperparameter samplers ride the dual-averaging/adaptation
    statistic through the same ``pmean`` hook so every shard converges
    to one shared step size; ESS has no tuning parameter at all
    (``coordinate_step_size`` is ignored), so its chains shard
    embarrassingly.

    ``n_chains`` must be a multiple of the mesh's chain-axis size.
    Result leaves carry leading dim ``n_chains``.
    """
    from pygpr_tpu.sample.mcmc import sample_posterior
    from pygpr_tpu.sample.nuts import sample_posterior_nuts

    n_shards = mesh.shape[CHAIN_AXIS]
    assert n_chains % n_shards == 0
    assert sampler in ("rwm", "nuts", "ess"), sampler

    if sampler == "ess":
        from pygpr_tpu.sample.ess import sample_latent

        params = mcmc_kwargs.pop("params")
        lik = mcmc_kwargs.pop("lik")
        lik_params = mcmc_kwargs.pop("lik_params")

        def ess_local(key):
            ks = jax.random.split(key[0], n_chains // n_shards)
            return jax.vmap(
                lambda kk: sample_latent(
                    kern, params, lik, lik_params, x, y, kk,
                    **mcmc_kwargs,
                )
            )(ks)

        fn = shard_map(
            ess_local,
            mesh=mesh,
            in_specs=(P(CHAIN_AXIS),),
            out_specs=P(CHAIN_AXIS),
            check_vma=False,
        )
        return fn(jax.random.split(key, n_shards))

    def local_fn(key):
        # Each shard runs n_chains // n_shards chains; the sync_fn
        # averages the adaptation statistic over the local vmap batch
        # implicitly (per-chain) and across shards via pmean.
        sync = (
            (lambda s: lax.pmean(s, CHAIN_AXIS))
            if coordinate_step_size
            else (lambda s: s)
        )
        run = sample_posterior if sampler == "rwm" else (
            sample_posterior_nuts
        )
        return run(
            kern, x, y, key[0],
            n_chains=n_chains // n_shards,
            sync_fn=sync,
            **mcmc_kwargs,
        )

    keys = jax.random.split(key, n_shards)
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(CHAIN_AXIS),),
        out_specs=P(CHAIN_AXIS),
        check_vma=False,
    )
    return fn(keys)
