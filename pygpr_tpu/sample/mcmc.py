"""MCMC hyperparameter sampling (adaptive random-walk Metropolis).

The reference has **no** Markov chain over hyperparameters — its
``sampler.py`` does input designs and GP prior draws only (SURVEY.md
§2.6) — but the BASELINE north star asks for an MCMC hyperparameter
sampler with posterior-moment parity and cross-host step-size
adaptation.  This module provides it TPU-first:

  * The target is the hyperparameter posterior
    ``log p(u | x, y) ∝ −nlml(exp u) + log N(u; 0, prior_std²)``
    over **log-hyperparameters** u (positivity + scale-free steps).
  * One chain = one ``lax.scan`` — the whole sampler jits; chains are
    vmapped (and shard over a mesh axis in ``pygpr_tpu.parallel``).
  * Step size adapts during warmup by Robbins-Monro toward a target
    acceptance rate; the adaptation statistic goes through a pluggable
    ``sync_fn`` so the distributed layer can ``pmean`` it across
    chains/hosts (the "step-size adaptation coordinated across hosts"
    of the north star; the single-process primitive is the parabolic
    rule in ``optimize.step_size``, reference ``hp_update.py``).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.models.likelihood import nlml
from pygpr_tpu.ops.kernels import Kernel

Array = jax.Array


class MCMCResult(NamedTuple):
    samples: Array       #: [..., n_samples, nhp] hyperparameter draws (θ, not log θ)
    log_prob: Array      #: [..., n_samples] unnormalized log-posterior
    accept_rate: Array   #: [...] post-warmup acceptance fraction
    step_size: Array     #: [...] adapted RWM step size


def log_posterior_fn(
    kern: Kernel,
    x: Array,
    y: Array,
    prior_std: float = 3.0,
    config: Config = DEFAULT,
    priors=None,
) -> Callable[[Array], Array]:
    """Log-posterior over u = log θ.

    Default prior: flat-ish Gaussian on u (scale ``prior_std``).  Pass
    ``priors`` (a per-parameter sequence from
    :mod:`pygpr_tpu.models.priors`) for explicit θ-space priors — the
    chain runs in u, so the change-of-variables Jacobian is applied
    (:func:`~pygpr_tpu.models.priors.log_prior_u`); coordinates with
    ``None`` keep the default Gaussian-on-u regularizer (a fully flat
    coordinate would make the u-marginal improper).
    """
    if priors is not None:
        from pygpr_tpu.models.priors import log_prior_u

        def lp(u: Array) -> Array:
            val = -nlml(kern, jnp.exp(u), x, y, config)
            soft = jnp.stack([
                jnp.square(u[..., i] / prior_std)
                for i, p in enumerate(priors) if p is None
            ]) if any(p is None for p in priors) else None
            reg = 0.0 if soft is None else -0.5 * jnp.sum(soft)
            return val + log_prior_u(priors, u) + reg

        return lp

    def lp(u: Array) -> Array:
        val = -nlml(kern, jnp.exp(u), x, y, config)
        prior = -0.5 * jnp.sum(jnp.square(u / prior_std))
        return val + prior

    return lp


def _rwm_chain(
    lp: Callable[[Array], Array],
    u0: Array,
    key: Array,
    n_samples: int,
    n_warmup: int,
    target_accept: float,
    init_step: float,
    sync_fn: Callable[[Array], Array],
):
    """Adaptive random-walk Metropolis, fully inside lax.scan."""
    dtype = u0.dtype
    nhp = u0.shape[-1]

    def mh_step(u, lp_u, log_step, key):
        k1, k2 = jax.random.split(key)
        prop = u + jnp.exp(log_step) * jax.random.normal(k1, (nhp,), dtype)
        lp_p = lp(prop)
        log_a = lp_p - lp_u
        accept = jnp.log(jax.random.uniform(k2, (), dtype)) < log_a
        u = jnp.where(accept, prop, u)
        lp_u = jnp.where(accept, lp_p, lp_u)
        a_prob = jnp.minimum(1.0, jnp.exp(log_a))
        return u, lp_u, accept, a_prob

    def warmup_body(carry, it):
        u, lp_u, log_step, key = carry
        key, sub = jax.random.split(key)
        u, lp_u, _, a_prob = mh_step(u, lp_u, log_step, sub)
        # Robbins-Monro toward target acceptance; sync_fn lets the
        # distributed layer average the statistic across chains/hosts.
        stat = sync_fn(a_prob - target_accept)
        log_step = log_step + stat / jnp.sqrt(1.0 + it)
        return (u, lp_u, log_step, key), None

    def sample_body(carry, _):
        u, lp_u, log_step, key = carry
        key, sub = jax.random.split(key)
        u, lp_u, accept, _ = mh_step(u, lp_u, log_step, sub)
        return (u, lp_u, log_step, key), (u, lp_u, accept)

    log_step0 = jnp.asarray(jnp.log(init_step), dtype)
    lp0 = lp(u0)
    carry = (u0, lp0, log_step0, key)
    carry, _ = jax.lax.scan(
        warmup_body, carry, jnp.arange(n_warmup, dtype=dtype)
    )
    carry, (us, lps, accepts) = jax.lax.scan(
        sample_body, carry, None, length=n_samples
    )
    _, _, log_step, _ = carry
    return (
        jnp.exp(us),
        lps,
        jnp.mean(accepts.astype(dtype)),
        jnp.exp(log_step),
    )


def sample_posterior(
    kern: Kernel,
    x: Array,
    y: Array,
    key: Array,
    params0: Optional[Array] = None,
    *,
    n_samples: int = 1000,
    n_warmup: int = 500,
    n_chains: int = 4,
    target_accept: float = 0.3,
    init_step: float = 0.1,
    prior_std: float = 3.0,
    jitter_init: float = 0.5,
    config: Config = DEFAULT,
    sync_fn: Callable[[Array], Array] = lambda s: s,
    priors=None,
) -> MCMCResult:
    """Sample the hyperparameter posterior with ``n_chains`` vmapped
    adaptive-RWM chains.  Returns θ-space draws ``[n_chains, n_samples,
    nhp]``; chains start from jittered ``log params0``."""
    if params0 is None:
        # Neutral start u=0 (θ=1): the kernel-layer init (noise 1e-4,
        # covar.py:224) sits deep in the interpolation mode and can trap
        # whole chains there.
        params0 = jnp.ones(
            (kern.n_params(x.shape[-1]),), dtype=x.dtype
        )
    u0 = jnp.log(jnp.abs(params0))
    lp = log_posterior_fn(kern, x, y, prior_std, config, priors)

    keys = jax.random.split(key, n_chains + 1)
    init_keys, chain_keys = keys[:n_chains], keys[n_chains:]
    u0s = u0[None] + jitter_init * jax.vmap(
        lambda k: jax.random.normal(k, u0.shape, u0.dtype)
    )(init_keys)
    chain_keys = jax.random.split(keys[-1], n_chains)

    run = partial(
        _rwm_chain,
        lp,
        n_samples=n_samples,
        n_warmup=n_warmup,
        target_accept=target_accept,
        init_step=init_step,
        sync_fn=sync_fn,
    )
    samples, lps, acc, step = jax.vmap(lambda u, k: run(u, k))(
        u0s, chain_keys
    )
    return MCMCResult(samples, lps, acc, step)


def _hmc_chain(
    lp: Callable[[Array], Array],
    u0: Array,
    key: Array,
    n_samples: int,
    n_warmup: int,
    target_accept: float,
    init_step: float,
    n_leapfrog: int,
    sync_fn: Callable[[Array], Array],
):
    """Adaptive Hamiltonian Monte Carlo: leapfrog with autodiff grads
    (one NLML gradient per step — the same O(n³) op as the optimizer
    inner loop), Robbins-Monro step-size adaptation in warmup."""
    dtype = u0.dtype
    nhp = u0.shape[-1]
    grad_lp = jax.grad(lp)

    def leapfrog(u, p, eps):
        p = p + 0.5 * eps * grad_lp(u)

        def body(_, carry):
            u, p = carry
            u = u + eps * p
            p = p + eps * grad_lp(u)
            return u, p

        u, p = jax.lax.fori_loop(0, n_leapfrog - 1, body, (u, p))
        u = u + eps * p
        p = p + 0.5 * eps * grad_lp(u)
        return u, p

    def hmc_step(u, lp_u, log_step, key):
        k1, k2 = jax.random.split(key)
        eps = jnp.exp(log_step)
        p0 = jax.random.normal(k1, (nhp,), dtype)
        u_new, p_new = leapfrog(u, p0, eps)
        lp_new = lp(u_new)
        h0 = lp_u - 0.5 * jnp.sum(p0 * p0)
        h1 = lp_new - 0.5 * jnp.sum(p_new * p_new)
        log_a = h1 - h0
        # reject non-finite trajectories outright
        log_a = jnp.where(jnp.isfinite(log_a), log_a, -jnp.inf)
        accept = jnp.log(jax.random.uniform(k2, (), dtype)) < log_a
        u = jnp.where(accept, u_new, u)
        lp_u = jnp.where(accept, lp_new, lp_u)
        a_prob = jnp.minimum(1.0, jnp.exp(log_a))
        return u, lp_u, accept, a_prob

    def warmup_body(carry, it):
        u, lp_u, log_step, key = carry
        key, sub = jax.random.split(key)
        u, lp_u, _, a_prob = hmc_step(u, lp_u, log_step, sub)
        stat = sync_fn(a_prob - target_accept)
        log_step = log_step + stat / jnp.sqrt(1.0 + it)
        return (u, lp_u, log_step, key), None

    def sample_body(carry, _):
        u, lp_u, log_step, key = carry
        key, sub = jax.random.split(key)
        u, lp_u, accept, _ = hmc_step(u, lp_u, log_step, sub)
        return (u, lp_u, log_step, key), (u, lp_u, accept)

    carry = (u0, lp(u0), jnp.asarray(jnp.log(init_step), dtype), key)
    carry, _ = jax.lax.scan(
        warmup_body, carry, jnp.arange(n_warmup, dtype=dtype)
    )
    carry, (us, lps, accepts) = jax.lax.scan(
        sample_body, carry, None, length=n_samples
    )
    _, _, log_step, _ = carry
    return (
        jnp.exp(us),
        lps,
        jnp.mean(accepts.astype(dtype)),
        jnp.exp(log_step),
    )


def sample_posterior_hmc(
    kern: Kernel,
    x: Array,
    y: Array,
    key: Array,
    params0: Optional[Array] = None,
    *,
    n_samples: int = 500,
    n_warmup: int = 300,
    n_chains: int = 4,
    target_accept: float = 0.75,
    init_step: float = 0.05,
    n_leapfrog: int = 8,
    prior_std: float = 3.0,
    jitter_init: float = 0.5,
    config: Config = DEFAULT,
    sync_fn: Callable[[Array], Array] = lambda s: s,
    priors=None,
) -> MCMCResult:
    """HMC over log-hyperparameters (gradient-guided — mixes far better
    than RWM in correlated posteriors; each leapfrog step costs one
    NLML gradient).  Same chain/vmap/sync structure as
    :func:`sample_posterior`."""
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
        _hmc_chain,
        lp,
        n_samples=n_samples,
        n_warmup=n_warmup,
        target_accept=target_accept,
        init_step=init_step,
        n_leapfrog=n_leapfrog,
        sync_fn=sync_fn,
    )
    samples, lps, acc, step = jax.vmap(lambda u, k: run(u, k))(
        u0s, chain_keys
    )
    return MCMCResult(samples, lps, acc, step)


def posterior_moments(samples: Array) -> Tuple[Array, Array]:
    """Pooled posterior mean/std over chains × draws → ``[nhp]`` each."""
    flat = samples.reshape(-1, samples.shape[-1])
    return jnp.mean(flat, axis=0), jnp.std(flat, axis=0)


def effective_sample_size(samples) -> "np.ndarray":
    """ESS per hyperparameter (Stan's rank-free estimator: multi-chain
    autocorrelations via FFT, Geyer initial-positive-pair truncation).
    Host-side NumPy — a diagnostic, like ``split_rhat``; the truncation
    index is data-dependent and has no business being traced.

    ``samples: [n_chains, n_samples, nhp]`` → ``[nhp]``.
    """
    import numpy as np

    s = np.asarray(samples)
    nc, ns, nhp = s.shape
    out = np.empty(nhp)
    for j in range(nhp):
        ch = s[:, :, j]
        centered = ch - ch.mean(axis=1, keepdims=True)
        # per-chain autocovariance via FFT
        nfft = 1 << (2 * ns - 1).bit_length()
        f = np.fft.rfft(centered, nfft, axis=1)
        acov = np.fft.irfft(f * np.conj(f), nfft, axis=1)[:, :ns].real
        acov /= ns
        W = ch.var(axis=1, ddof=1).mean()
        B = ns * ch.mean(axis=1).var(ddof=1) if nc > 1 else 0.0
        var_plus = W * (ns - 1) / ns + B / ns
        if var_plus <= 0:
            out[j] = float(nc * ns)
            continue
        rho = 1.0 - (W - acov.mean(axis=0)) / var_plus
        # Geyer: sum successive pairs while positive
        tau = 0.0
        t = 1
        while t + 1 < ns:
            pair = rho[t] + rho[t + 1]
            if pair < 0:
                break
            tau += pair
            t += 2
        out[j] = nc * ns / (1.0 + 2.0 * tau)
    return out


def predictive_mixture(
    kern: Kernel,
    x: Array,
    y: Array,
    samples: Array,
    xs: Array,
    *,
    n_use: int = 64,
    config: Config = DEFAULT,
) -> Tuple[Array, Array]:
    """Fully Bayesian posterior predictive: marginalize the
    hyperparameters over the MCMC draws instead of plugging in one
    point estimate.

        p(y* | x*, D) ≈ (1/S) Σ_s N(y*; μ(θ_s), σ²(θ_s))

    moment-matched to one Gaussian per query: ``mean = E_s[μ_s]``,
    ``var = E_s[σ_s²] + Var_s[μ_s]`` (law of total variance — the
    hyperparameter-uncertainty term the plug-in MLE predictive lacks).

    ``samples`` is ``MCMCResult.samples`` (any leading chain axes);
    thinned to ≤ ``n_use`` draws by a static stride, then streamed one
    factorize+predict per draw under ``lax.map`` (peak memory = one
    n×n gram, not S of them).  Returns ``(mean [nq], var [nq])``.
    """
    from pygpr_tpu.models import exact_gp

    flat = samples.reshape(-1, samples.shape[-1])
    stride = max(flat.shape[0] // n_use, 1)
    use = flat[::stride][:n_use]

    def one(p):
        state = exact_gp.factorize(kern, p, x, y, config)
        return exact_gp.predict(kern, state, xs, "diag", config)

    mus, vars_ = jax.lax.map(one, use)           # [S, nq] each
    mean = jnp.mean(mus, axis=0)
    var = jnp.mean(vars_, axis=0) + jnp.var(mus, axis=0)
    return mean, var


def split_rhat(samples: Array) -> Array:
    """Split-R̂ convergence diagnostic per hyperparameter → ``[nhp]``.

    Standard Gelman-Rubin on 2×n_chains half-chains; values ≲ 1.01
    indicate mixing.  (The reference has no diagnostics at all.)
    """
    nc, ns, nhp = samples.shape
    half = ns // 2
    chains = jnp.concatenate(
        [samples[:, :half], samples[:, half : 2 * half]], axis=0
    )  # [2nc, half, nhp]
    m = chains.shape[0]
    mean_c = jnp.mean(chains, axis=1)            # [m, nhp]
    var_c = jnp.var(chains, axis=1, ddof=1)      # [m, nhp]
    W = jnp.mean(var_c, axis=0)
    B = half * jnp.var(mean_c, axis=0, ddof=1)
    var_post = (half - 1) / half * W + B / half
    return jnp.sqrt(var_post / W)
