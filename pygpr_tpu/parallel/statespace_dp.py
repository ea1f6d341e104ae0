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
structural — and ASSERTED, not just claimed: the compiled-HLO
collective bytes are identical at n=1024 and n=4096
(``tests/test_comm_volume.py::test_statespace_dp_comm_volume_independent_of_n``;
the transitions are built per-shard from the local Δt slice and t is
pinned replicated, because either one left to GSPMD materializes an
O(n) all-gather).  Exactness: ``nlml_ss_dp`` == single-device
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

    from pygpr_tpu.models.statespace import _ssm_constants, _transitions

    sig, ls, sn = params[0], params[1], params[2]
    lam, p_inf = _ssm_constants(nu, sig, ls, dtype)
    r_var = jnp.square(sn)
    d = p_inf.shape[0]
    # Δt carries the only cross-step coupling; computed globally (one
    # elementwise diff), everything Δt-derived is built INSIDE the
    # shard.  Pin t replicated: left alone, GSPMD shards the diff and
    # then ALL-GATHERS t to stitch the boundaries — an O(n) exchange
    # (caught by test_comm_volume.py); replicated, the diff is
    # compute-local and the shard_map just slices its block.
    sh_rep = jax.sharding.NamedSharding(mesh, P())
    if isinstance(t, jax.core.Tracer):
        t = jax.lax.with_sharding_constraint(t, sh_rep)
    dt = jnp.diff(t, prepend=t[:1])                   # dt[0] = 0
    if isinstance(dt, jax.core.Tracer):
        dt = jax.lax.with_sharding_constraint(dt, sh_rep)

    # ---- stage 1 (shard_map): local scans, zero communication ------
    # Transitions (A, Q) are built per-shard from the local Δt slice —
    # building the [d,d,n] stacks outside and sharding them afterwards
    # made GSPMD materialize O(n) exchanges.  The block aggregate (each
    # device's LAST prefix element) is likewise extracted inside the
    # shard so the only cross-device tuple is [d,?,1] per device (both
    # caught by test_comm_volume.py).
    def local_scan(dt_loc, y_loc):
        nloc = y_loc.shape[0]
        mask = jnp.ones((nloc,), dtype)
        a_loc, q_loc = _transitions(nu, lam, p_inf, dt_loc)
        # global step 0 folds the stationary prior: A₀ ← 0, Q₀ ← P∞
        # (statespace._prep) — only the first device's first column
        first = jax.lax.axis_index(axis) == 0
        a_loc = a_loc.at[:, :, 0].set(
            jnp.where(first, jnp.zeros((d, d), dtype), a_loc[:, :, 0])
        )
        q_loc = q_loc.at[:, :, 0].set(
            jnp.where(first, p_inf, q_loc[:, :, 0])
        )
        elems = _filter_elements(a_loc, q_loc, y_loc, r_var, mask)
        pre = jax.lax.associative_scan(
            _filter_combine, elems, axis=2
        )
        agg = jax.tree.map(lambda x: x[..., -1:], pre)
        return pre, agg, a_loc, q_loc

    spec_m = P(None, None, axis)
    prefix, agg, a_s, q_s = shard_map(
        local_scan,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=((spec_m,) * 5, (spec_m,) * 5, spec_m, spec_m),
    )(dt, y)

    # ---- block aggregates → per-block offsets (tiny, replicated) ---
    nloc = n // ndev                               # agg leaves [d,?,ndev]
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
