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
    mask: Optional[Array] = None,
    config: Config = DEFAULT,
) -> Tuple[Array, Array]:
    """grBCM diagonal-variance prediction with experts sharded over the
    mesh's ``"expert"`` axis.

    Inputs: ``params_l/x_aug/y_aug`` lead with nc (sharded); ``xg/yg/xs``
    replicated.  Returns aggregated ``(mean [np], var [np])``.

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
        ys_l, var_l = exact_gp.predict(kern, state_l, xs, "diag", config)

        # --- global expert (replicated work) ------------------------
        state_g = exact_gp.factorize(kern, params_g, xg, yg, config)
        ys_g, var_g = exact_gp.predict(kern, state_g, xs, "diag", config)

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
        return mean, covar

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
) -> Tuple[Array, Array, Array, Array]:
    """Per-expert L-BFGS fits sharded over the ``"expert"`` axis + a
    replicated global fit.  No collectives — the fits are independent
    (the reference's per-expert loop intent, ``gr_bcm.py:58-66``).

    Returns ``(params_g, params_l [nc, nhp], nlml_g, nlml_l [nc])``.
    """
    from pygpr_tpu.optimize.lbfgs import fit_mle

    nc = x_aug.shape[0]
    p0_l = jnp.broadcast_to(params0, (nc,) + params0.shape)

    def local_fn(p0_l, xa, ya, xg, yg):
        res_l = fit_mle(
            kern, p0_l, xa, ya,
            config=config, max_iter=max_iter, tol=tol, log_space=log_space,
        )
        res_g = fit_mle(
            kern, params0, xg, yg,
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


def mcmc_sharded(
    kern: Kernel,
    x: Array,
    y: Array,
    key: Array,
    mesh: Mesh,
    *,
    n_chains: int,
    coordinate_step_size: bool = True,
    **mcmc_kwargs,
):
    """MCMC chains sharded over the ``"chain"`` mesh axis, with the
    step-size adaptation statistic ``pmean``-ed across all chains
    (north-star "step-size adaptation coordinated across hosts").

    ``n_chains`` must be a multiple of the mesh's chain-axis size.
    Returns an ``MCMCResult`` with leading dim ``n_chains``.
    """
    from pygpr_tpu.sample.mcmc import sample_posterior

    n_shards = mesh.shape[CHAIN_AXIS]
    assert n_chains % n_shards == 0

    def local_fn(key):
        # Each shard runs n_chains // n_shards chains; the sync_fn
        # averages the adaptation statistic over the local vmap batch
        # implicitly (per-chain) and across shards via pmean.
        sync = (
            (lambda s: lax.pmean(s, CHAIN_AXIS))
            if coordinate_step_size
            else (lambda s: s)
        )
        return sample_posterior(
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
