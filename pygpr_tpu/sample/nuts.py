"""No-U-Turn Sampler (NUTS) over GP hyperparameters.

The adaptive complement to :mod:`pygpr_tpu.sample.mcmc`'s RWM/HMC: NUTS
(Hoffman & Gelman 2014, JMLR 15) removes the trajectory-length tuning
knob by doubling the Hamiltonian trajectory until it starts to turn
back on itself, and multinomial sampling (Betancourt 2017,
arXiv:1701.02434 app. A.3) picks the next state from the whole
trajectory weighted by e^{-H}.  The reference repo has no sampler over
hyperparameters at all (SURVEY.md §2.6 note); this extends the
north-star MCMC story (BASELINE.md config 3) with the field-standard
sampler.

TPU-first shape — the classic recursive tree is hostile to XLA
(data-dependent recursion), so this is the **iterative** formulation:

  * One doubling = one inner ``lax.while_loop`` over at most
    2^depth leapfrog steps with a **checkpoint buffer** of
    ``max_depth`` slots holding sub-trajectory left endpoints, so all
    dyadic sub-tree U-turn checks of the recursive algorithm run in
    O(max_depth) memory (Phan & Pradhan, arXiv:1905.09813 §A).  Slot
    arithmetic: even leaf ``i`` is stored at slot ``popcount(i)``; odd
    leaf ``n`` closes the dyadic ranges at slots
    ``popcount(n>>1) − trailing_ones(n) + 1 … popcount(n>>1)``.
  * The U-turn test is the **momentum-sum** criterion
    (ρ·v_left < 0 or ρ·v_right < 0, ρ = Σ momenta over the segment,
    v = M⁻¹p) — unlike the paper's Δq·p form it is invariant to build
    order, so backward doublings reuse the same code with a negated
    step.
  * Whole transitions jit; chains vmap and shard over the mesh axis
    exactly like ``sample_posterior``/``sample_posterior_hmc``; the
    dual-averaging statistic goes through ``sync_fn`` for cross-host
    coordination (pmean), same contract as the other samplers.
  * Warmup = two dual-averaging phases (Nesterov primal-dual, Stan's
    γ=0.05, t₀=10, κ=0.75) around a Welford pass that estimates a
    diagonal metric (momentum ~ N(0, M), M⁻¹ ≈ posterior variance,
    regularized toward 10⁻³·I like Stan's windowed adaptation).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.ops.kernels import Kernel
from pygpr_tpu.sample.mcmc import log_posterior_fn

Array = jax.Array

_DIVERGENCE = 1000.0     # Stan's energy-error divergence threshold
_DA_GAMMA = 0.05         # dual-averaging shrinkage
_DA_T0 = 10.0            # dual-averaging iteration offset
_DA_KAPPA = 0.75         # dual-averaging decay


class NUTSResult(NamedTuple):
    samples: Array          #: [..., n_samples, nhp] θ-space draws
    log_prob: Array         #: [..., n_samples] unnormalized log-posterior
    accept_rate: Array      #: [...] mean accept-statistic (sampling phase)
    step_size: Array        #: [...] adapted leapfrog step size
    tree_depth: Array       #: [...] mean tree depth (sampling phase)
    divergence_rate: Array  #: [...] fraction of divergent transitions
    inv_mass: Array         #: [..., nhp] adapted diagonal inverse metric


def _popcount(i: Array, nbits: int) -> Array:
    acc = jnp.zeros_like(i)
    for b in range(nbits):           # static unroll, nbits = max_depth+1
        acc = acc + ((i >> b) & 1)
    return acc


def _trailing_ones(i: Array, nbits: int) -> Array:
    # trailing_ones(n) = ctz(n+1); ctz(x) = popcount((x & -x) − 1)
    x = i + 1
    return _popcount((x & -x) - 1, nbits + 1)


def _nuts_transition(
    vg: Callable, u, lp_u, grad_u, key, eps, inv_mass, max_depth: int
):
    """One multinomial-NUTS transition.  Returns
    ``(u', lp', grad', accept_stat, depth, diverged)``."""
    dtype = u.dtype
    nhp = u.shape[-1]
    nbits = max_depth + 1

    def kinetic(p):
        return 0.5 * jnp.sum(p * p * inv_mass)

    def leapfrog(q, p, g, step):
        p_half = p + 0.5 * step * g
        q_new = q + step * inv_mass * p_half
        lp_new, g_new = vg(q_new)
        p_new = p_half + 0.5 * step * g_new
        return q_new, p_new, lp_new, g_new

    k_mom, k_loop = jax.random.split(key)
    p0 = jax.random.normal(k_mom, (nhp,), dtype) * jnp.sqrt(
        1.0 / inv_mass
    )
    h0 = -lp_u + kinetic(p0)

    # ---- one doubling: build 2^depth leaves from one endpoint -------
    def build_subtree(q0, p0_, g0, direction, n_leaf, key):
        """Iterative subtree with checkpointed dyadic U-turn checks.

        Returns the build endpoint state, the subtree's multinomial
        proposal, log-weight, ρ_subtree (``rho_prefix`` at exit),
        termination flags, and accept-stat sums.
        """
        step = direction * eps
        ck_v = jnp.zeros((max_depth + 1, nhp), dtype)   # slot velocities
        ck_rho = jnp.zeros((max_depth + 1, nhp), dtype)  # prefix Σp before slot leaf

        def cond(c):
            return (c["i"] < n_leaf) & (~c["turning"]) & (~c["diverging"])

        def body(c):
            i = c["i"]
            q, p, lp_q, g = leapfrog(c["q"], c["p"], c["g"], step)
            h = -lp_q + kinetic(p)
            d_e = h - h0
            bad = ~jnp.isfinite(d_e)
            diverging = bad | (d_e > _DIVERGENCE)
            log_w = jnp.where(bad, -jnp.inf, -d_e)
            alpha = jnp.where(
                bad, 0.0, jnp.minimum(1.0, jnp.exp(-d_e))
            )
            v = inv_mass * p
            rho_after = c["rho_prefix"] + p

            # progressive multinomial proposal within the subtree
            key, k_u = jax.random.split(c["key"])
            new_tot = jnp.logaddexp(c["log_w_sub"], log_w)
            take = (
                jnp.log(jax.random.uniform(k_u, (), dtype))
                < log_w - new_tot
            )
            prop_q = jnp.where(take, q, c["prop_q"])
            prop_lp = jnp.where(take, lp_q, c["prop_lp"])
            prop_g = jnp.where(take, g, c["prop_g"])

            # checkpoint store (even leaf) at slot popcount(i)
            is_even = (i & 1) == 0
            slot = _popcount(i, nbits)
            ck_v_new = jnp.where(
                is_even,
                c["ck_v"].at[slot].set(v),
                c["ck_v"],
            )
            ck_rho_new = jnp.where(
                is_even,
                c["ck_rho"].at[slot].set(c["rho_prefix"]),
                c["ck_rho"],
            )
            # dyadic U-turn checks (odd leaf): slots idx_min..idx_max
            idx_max = _popcount(i >> 1, nbits)
            idx_min = idx_max - _trailing_ones(i, nbits) + 1
            slots = jnp.arange(max_depth + 1)
            active = (slots >= idx_min) & (slots <= idx_max) & (~is_even)
            rho_rng = rho_after[None, :] - ck_rho_new       # [S, nhp]
            c1 = jnp.sum(rho_rng * ck_v_new, -1) < 0.0
            c2 = jnp.sum(rho_rng * v[None, :], -1) < 0.0
            turning = jnp.any(active & (c1 | c2))

            return {
                "i": i + 1,
                "q": q,
                "p": p,
                "g": g,
                "rho_prefix": rho_after,
                "log_w_sub": new_tot,
                "prop_q": prop_q,
                "prop_lp": prop_lp,
                "prop_g": prop_g,
                "ck_v": ck_v_new,
                "ck_rho": ck_rho_new,
                "turning": turning,
                "diverging": diverging,
                "sum_alpha": c["sum_alpha"] + alpha,
                "n_alpha": c["n_alpha"] + 1.0,
                "key": key,
            }

        init = {
            "i": jnp.int32(0),
            "q": q0,
            "p": p0_,
            "g": g0,
            "rho_prefix": jnp.zeros((nhp,), dtype),
            "log_w_sub": jnp.asarray(-jnp.inf, dtype),
            "prop_q": q0,
            "prop_lp": jnp.asarray(-jnp.inf, dtype),
            "prop_g": g0,
            "ck_v": ck_v,
            "ck_rho": ck_rho,
            "turning": jnp.asarray(False),
            "diverging": jnp.asarray(False),
            "sum_alpha": jnp.asarray(0.0, dtype),
            "n_alpha": jnp.asarray(0.0, dtype),
            "key": key,
        }
        out = jax.lax.while_loop(cond, body, init)
        return out

    # ---- outer doubling loop -----------------------------------------
    def o_cond(c):
        return (c["depth"] < max_depth) & (~c["turning"]) & (
            ~c["diverging"]
        )

    def o_body(c):
        key, k_dir, k_sub, k_swap = jax.random.split(c["key"], 4)
        go_right = jax.random.bernoulli(k_dir)
        direction = jnp.where(go_right, 1.0, -1.0).astype(dtype)
        q0 = jnp.where(go_right, c["q_r"], c["q_l"])
        p0_ = jnp.where(go_right, c["p_r"], c["p_l"])
        g0 = jnp.where(go_right, c["g_r"], c["g_l"])
        n_leaf = jnp.int32(1) << c["depth"]

        s = build_subtree(q0, p0_, g0, direction, n_leaf, k_sub)

        ok = (~s["turning"]) & (~s["diverging"])
        # biased progressive sampling across the doubling
        log_a = s["log_w_sub"] - c["log_w"]
        take = ok & (
            jnp.log(jax.random.uniform(k_swap, (), dtype)) < log_a
        )
        prop_q = jnp.where(take, s["prop_q"], c["prop_q"])
        prop_lp = jnp.where(take, s["prop_lp"], c["prop_lp"])
        prop_g = jnp.where(take, s["prop_g"], c["prop_g"])
        log_w = jnp.where(
            ok, jnp.logaddexp(c["log_w"], s["log_w_sub"]), c["log_w"]
        )

        # extend the global endpoint the subtree grew from
        upd = lambda new, old: jnp.where(ok & go_right, new, old)
        q_r = upd(s["q"], c["q_r"])
        p_r = upd(s["p"], c["p_r"])
        g_r = upd(s["g"], c["g_r"])
        upd_l = lambda new, old: jnp.where(ok & (~go_right), new, old)
        q_l = upd_l(s["q"], c["q_l"])
        p_l = upd_l(s["p"], c["p_l"])
        g_l = upd_l(s["g"], c["g_l"])
        rho = jnp.where(ok, c["rho"] + s["rho_prefix"], c["rho"])

        # merged-trajectory U-turn check (momentum-sum criterion)
        v_l, v_r = inv_mass * p_l, inv_mass * p_r
        turn_top = (jnp.sum(rho * v_l) < 0.0) | (
            jnp.sum(rho * v_r) < 0.0
        )
        return {
            "depth": c["depth"] + 1,
            "q_l": q_l, "p_l": p_l, "g_l": g_l,
            "q_r": q_r, "p_r": p_r, "g_r": g_r,
            "rho": rho,
            "log_w": log_w,
            "prop_q": prop_q,
            "prop_lp": prop_lp,
            "prop_g": prop_g,
            "turning": s["turning"] | (ok & turn_top),
            "diverging": s["diverging"],
            "sum_alpha": c["sum_alpha"] + s["sum_alpha"],
            "n_alpha": c["n_alpha"] + s["n_alpha"],
            "key": key,
        }

    init = {
        "depth": jnp.int32(0),
        "q_l": u, "p_l": p0, "g_l": grad_u,
        "q_r": u, "p_r": p0, "g_r": grad_u,
        "rho": p0,
        "log_w": jnp.zeros((), dtype),      # initial leaf: −ΔE = 0
        "prop_q": u,
        "prop_lp": lp_u,
        "prop_g": grad_u,
        "turning": jnp.asarray(False),
        "diverging": jnp.asarray(False),
        "sum_alpha": jnp.zeros((), dtype),
        "n_alpha": jnp.zeros((), dtype),
        "key": k_loop,
    }
    out = jax.lax.while_loop(o_cond, o_body, init)
    accept_stat = out["sum_alpha"] / jnp.maximum(out["n_alpha"], 1.0)
    return (
        out["prop_q"],
        out["prop_lp"],
        out["prop_g"],
        accept_stat,
        out["depth"],
        out["diverging"],
    )


def _dual_avg_update(m, h_bar, log_eps_bar, stat, mu, dtype):
    """One Nesterov dual-averaging step (m is 1-based)."""
    mf = m.astype(dtype)
    h_bar = (1.0 - 1.0 / (mf + _DA_T0)) * h_bar + stat / (mf + _DA_T0)
    log_eps = mu - jnp.sqrt(mf) / _DA_GAMMA * h_bar
    w = mf ** (-_DA_KAPPA)
    log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
    return h_bar, log_eps_bar, log_eps


def run_nuts(
    lp: Callable[[Array], Array],
    u0: Array,
    key: Array,
    *,
    n_samples: int,
    n_warmup: int,
    max_depth: int = 6,
    target_accept: float = 0.8,
    init_step: float = 0.1,
    adapt_mass: bool = True,
    sync_fn: Callable[[Array], Array] = lambda s: s,
):
    """One NUTS chain on an arbitrary log-density ``lp`` — warmup
    (dual averaging + optional diagonal-metric Welford pass) then
    sampling.  Returns the fields of :class:`NUTSResult` (single
    chain, no leading axis)."""
    dtype = u0.dtype
    nhp = u0.shape[-1]
    vg = jax.value_and_grad(lp)
    lp0, g0 = vg(u0)

    nw1 = n_warmup // 2 if adapt_mass else n_warmup
    nw2 = n_warmup - nw1
    discard = max(nw1 // 4, 1)

    def warm_phase(carry_in, nw, inv_mass, collect):
        """Dual-averaging warmup scan; optionally Welford-collect u."""
        u, lp_u, g_u, key, log_eps0 = carry_in
        mu = jnp.log(10.0) + log_eps0

        def body(c, m):
            (u, lp_u, g_u, h_bar, log_eps_bar, log_eps, key,
             w_cnt, w_mean, w_m2) = c
            key, sub = jax.random.split(key)
            u, lp_u, g_u, alpha, _, _ = _nuts_transition(
                vg, u, lp_u, g_u, sub, jnp.exp(log_eps), inv_mass,
                max_depth,
            )
            stat = sync_fn(target_accept - alpha)
            h_bar, log_eps_bar, log_eps = _dual_avg_update(
                m, h_bar, log_eps_bar, stat, mu, dtype
            )
            if collect:
                take = (m > discard).astype(dtype)
                cnt = w_cnt + take
                delta = u - w_mean
                w_mean = w_mean + take * delta / jnp.maximum(cnt, 1.0)
                w_m2 = w_m2 + take * delta * (u - w_mean)
                w_cnt = cnt
            return (
                u, lp_u, g_u, h_bar, log_eps_bar, log_eps, key,
                w_cnt, w_mean, w_m2,
            ), None

        c0 = (
            u, lp_u, g_u,
            jnp.zeros((), dtype), log_eps0, log_eps0, key,
            jnp.zeros((), dtype), jnp.zeros((nhp,), dtype),
            jnp.zeros((nhp,), dtype),
        )
        c, _ = jax.lax.scan(body, c0, jnp.arange(1, nw + 1))
        (u, lp_u, g_u, _, log_eps_bar, _, key, w_cnt, w_mean,
         w_m2) = c
        return u, lp_u, g_u, key, log_eps_bar, w_cnt, w_m2

    inv_mass = jnp.ones((nhp,), dtype)
    log_eps = jnp.asarray(jnp.log(init_step), dtype)
    u, lp_u, g_u, key, log_eps, w_cnt, w_m2 = warm_phase(
        (u0, lp0, g0, key, log_eps), nw1, inv_mass, adapt_mass
    )
    if adapt_mass and nw2 > 0:
        # Stan-style regularized diagonal metric from the Welford pass
        var = w_m2 / jnp.maximum(w_cnt - 1.0, 1.0)
        n_eff = jnp.maximum(w_cnt, 1.0)
        inv_mass = jnp.where(
            w_cnt > 2.0,
            (n_eff / (n_eff + 5.0)) * var
            + (5.0 / (n_eff + 5.0)) * 1e-3,
            inv_mass,
        )
        u, lp_u, g_u, key, log_eps, _, _ = warm_phase(
            (u, lp_u, g_u, key, log_eps), nw2, inv_mass, False
        )

    eps = jnp.exp(log_eps)

    def sample_body(c, _):
        u, lp_u, g_u, key = c
        key, sub = jax.random.split(key)
        u, lp_u, g_u, alpha, depth, div = _nuts_transition(
            vg, u, lp_u, g_u, sub, eps, inv_mass, max_depth
        )
        return (u, lp_u, g_u, key), (
            u, lp_u, alpha, depth.astype(dtype), div,
        )

    _, (us, lps, alphas, depths, divs) = jax.lax.scan(
        sample_body, (u, lp_u, g_u, key), None, length=n_samples
    )
    return (
        us,
        lps,
        jnp.mean(alphas),
        eps,
        jnp.mean(depths),
        jnp.mean(divs.astype(dtype)),
        inv_mass,
    )


def sample_posterior_nuts(
    kern: Kernel,
    x: Array,
    y: Array,
    key: Array,
    params0: Optional[Array] = None,
    *,
    n_samples: int = 500,
    n_warmup: int = 500,
    n_chains: int = 4,
    max_depth: int = 6,
    target_accept: float = 0.8,
    init_step: float = 0.1,
    adapt_mass: bool = True,
    prior_std: float = 3.0,
    jitter_init: float = 0.5,
    config: Config = DEFAULT,
    sync_fn: Callable[[Array], Array] = lambda s: s,
    priors=None,
) -> NUTSResult:
    """NUTS over log-hyperparameters with ``n_chains`` vmapped chains.

    Same posterior, chain-jitter, prior, and ``sync_fn`` contract as
    :func:`pygpr_tpu.sample.mcmc.sample_posterior`; each leapfrog leaf
    costs one NLML gradient (the optimizer inner-loop op, reference
    stack SURVEY.md §3.2), and a transition spends at most
    ``2^max_depth − 1`` of them.  Returns θ-space draws
    ``[n_chains, n_samples, nhp]`` plus adaptation diagnostics.
    """
    if params0 is None:
        params0 = jnp.ones((kern.n_params(x.shape[-1]),), dtype=x.dtype)
    u0 = jnp.log(jnp.abs(params0))
    lp = log_posterior_fn(kern, x, y, prior_std, config, priors)

    keys = jax.random.split(key, n_chains + 1)
    init_keys = keys[:n_chains]
    u0s = u0[None] + jitter_init * jax.vmap(
        lambda k: jax.random.normal(k, u0.shape, u0.dtype)
    )(init_keys)
    chain_keys = jax.random.split(keys[-1], n_chains)

    run = partial(
        run_nuts,
        lp,
        n_samples=n_samples,
        n_warmup=n_warmup,
        max_depth=max_depth,
        target_accept=target_accept,
        init_step=init_step,
        adapt_mass=adapt_mass,
        sync_fn=sync_fn,
    )
    us, lps, acc, eps, depth, div, inv_mass = jax.vmap(
        lambda u, k: run(u, k)
    )(u0s, chain_keys)
    return NUTSResult(
        jnp.exp(us), lps, acc, eps, depth, div, inv_mass
    )
