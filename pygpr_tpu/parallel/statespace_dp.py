"""Temporal-parallel state-space GP over a device mesh — the
"sequence-parallel" axis of this engine.

The parallel-scan Kalman filter (``models/statespace``) already turns
the sequential recursion into an associative reduction; that same
associativity distributes across chips with the textbook two-level
scan (Blelloch):

  1. each device runs the LOCAL associative scan over its contiguous
     time block (shard_map stage 1 — zero communication);
  2. the per-block aggregate elements (one (A, b, C, η, J) tuple per
     device, a few d² floats each) are folded into per-block prefix
     OFFSETS between the two shard_maps — a replicated O(ndev·d²)
     computation whose gather is the only cross-device traffic;
  3. shard_map stage 2 applies each block's offset to its local
     prefixes elementwise and psums the innovation NLML.

The innovation decomposition needs each block's left-boundary filtered
state — the predecessor's last (m, P) — which is exactly the block's
offset applied to the stationary prior, so no extra exchange.

Wire cost is independent of n: weak scaling in the chain length is
structural.  Exactness: ``nlml_ss_dp`` == single-device
``models.statespace.nlml_ss`` to f64 round-off (tested on the 8-device
CPU mesh).  Gradients flow through both shard_maps UNDER JIT (the
eager shard_map transpose currently trips an XLA sharding assert;
``fit_ss_dp``'s L-BFGS while_loop is jitted, so fits are unaffected).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.models.statespace import (
    _bmm,
    _bmv,
    _filter_combine,
    _filter_elements,
    _filter_identity,
    _prep,
    _t,
)
from pygpr_tpu.parallel.mesh import EXPERT_AXIS

Array = jax.Array


def nlml_ss_dp(
    nu: float,
    params: Array,
    t: Array,
    y: Array,
    mesh,
    *,
    axis: str = EXPERT_AXIS,
    config: Config = DEFAULT,
) -> Array:
    """Exact Matérn-ν NLML with the time axis sharded over ``mesh``.

    ``t`` sorted ascending, ``n`` divisible by the axis size.  The
    transitions (Δt-dependent, elementwise) are built globally before
    sharding so block boundaries need no neighbor exchange; inside the
    shard every step is local except one tiny ``all_gather``.
    """
    ndev = mesh.shape[axis]
    n = t.shape[0]
    assert n % ndev == 0, (n, ndev)
    dtype = y.dtype

    a_s, q_s, p_inf, r_var = _prep(nu, params, t, y, config)
    d = p_inf.shape[0]

    # ---- stage 1 (shard_map): local scans, zero communication ------
    def local_scan(a_loc, q_loc, y_loc):
        nloc = y_loc.shape[0]
        mask = jnp.ones((nloc,), dtype)
        elems = _filter_elements(a_loc, q_loc, y_loc, r_var, mask)
        return jax.lax.associative_scan(
            _filter_combine, elems, axis=2
        )

    spec_m = P(None, None, axis)
    prefix = shard_map(
        local_scan,
        mesh=mesh,
        in_specs=(spec_m, spec_m, P(axis)),
        out_specs=(spec_m,) * 5,
    )(a_s, q_s, y)

    # ---- block aggregates → per-block offsets (tiny, replicated) ---
    nloc = n // ndev
    agg = jax.tree.map(
        lambda x: x[..., nloc - 1 :: nloc], prefix
    )                                              # leaves [d,?,ndev]
    offs = [_filter_identity(d, 1, dtype)]         # block 0: identity
    for k in range(ndev - 1):
        offs.append(_filter_combine(
            offs[-1], jax.tree.map(lambda g: g[..., k : k + 1], agg)
        ))
    off_all = jax.tree.map(
        lambda *xs: jnp.concatenate(xs, axis=-1), *offs
    )                                              # leaves [d,?,ndev]

    # ---- stage 2 (shard_map): apply offsets + innovation sum -------
    def local_apply(off_loc, pre_loc, a_loc, q_loc, y_loc):
        nloc = y_loc.shape[0]
        off_b = jax.tree.map(
            lambda x: jnp.broadcast_to(x, x.shape[:-1] + (nloc,)),
            off_loc,
        )
        a_c, b_c, c_c, _, _ = _filter_combine(off_b, pre_loc)
        p0_b = jnp.broadcast_to(p_inf[:, :, None], a_c.shape)
        ms = b_c[:, 0, :]                           # [d, nloc]
        ps = c_c + _bmm(a_c, _bmm(p0_b, _t(a_c)))   # [d, d, nloc]

        # left-boundary filtered state of this block = the offset
        # applied to (m₀=0, P₀=P∞) — the predecessor's last state
        a_o, b_o, c_o, _, _ = off_loc
        m_bound = b_o[:, 0, 0]                      # [d]
        p_bound = (
            c_o[:, :, 0]
            + (a_o[:, :, 0] @ p_inf) @ a_o[:, :, 0].T
        )
        m_prev = jnp.concatenate(
            [m_bound[:, None], ms[:, :-1]], axis=-1
        )
        p_prev = jnp.concatenate(
            [p_bound[:, :, None], ps[:, :, :-1]], axis=-1
        )
        m_bar = _bmv(a_loc, m_prev)
        p_bar = _bmm(_bmm(a_loc, p_prev), _t(a_loc)) + q_loc
        s = p_bar[0, 0] + r_var
        v = y_loc - m_bar[0]
        nll_loc = 0.5 * jnp.sum(
            jnp.log(2.0 * jnp.asarray(math.pi, dtype) * s)
            + jnp.square(v) / s
        )
        return jax.lax.psum(nll_loc, axis)

    return shard_map(
        local_apply,
        mesh=mesh,
        in_specs=((spec_m,) * 5, (spec_m,) * 5, spec_m, spec_m,
                  P(axis)),
        out_specs=P(),
    )(off_all, prefix, a_s, q_s, y)


def fit_ss_dp(
    nu: float,
    t: Array,
    y: Array,
    mesh,
    params0=None,
    *,
    axis: str = EXPERT_AXIS,
    max_iter: int = 150,
    tol: float = 1e-4,
    config: Config = DEFAULT,
):
    """Distributed L-BFGS fit on the sharded exact NLML (log-space,
    ``fit_mle`` policy) — gradients flow through ``shard_map`` and the
    collectives, so every device computes the identical update."""
    from pygpr_tpu.optimize.lbfgs import minimize_lbfgs

    if params0 is None:
        params0 = jnp.asarray([1.0, 1.0, 0.3], y.dtype)
    u0 = jnp.log(jnp.abs(params0))

    def objective(u):
        return nlml_ss_dp(
            nu, jnp.exp(u), t, y, mesh, axis=axis, config=config
        )

    res = minimize_lbfgs(objective, u0, max_iter=max_iter, tol=tol)
    return jnp.exp(res.params), res.value, res.converged
