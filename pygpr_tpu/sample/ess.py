"""Elliptical slice sampling for latent GP posteriors (Murray, Adams &
MacKay, AISTATS 2010).

The sampling complement to the Laplace approximation
(``models/laplace.py``): instead of a Gaussian *approximation* of
``p(f | y, X, θ) ∝ N(f; 0, K) · Πᵢ p(yᵢ|fᵢ)``, draw exact (asymptotic)
samples from it.  ESS is the standard tool for this target because it
has **no tuning parameters**, is rejection-free (every step moves), and
exploits the Gaussian prior exactly: a proposal ellipse
``f' = f cos ϑ + ν sin ϑ`` through the state ``f`` and a prior draw
``ν ~ N(0, K)`` stays on the prior's equi-density shells, so only the
likelihood enters the slice test.

TPU-first shape:

  * One prior draw per step = one precomputed Cholesky GEMV (the
    O(n³) factor is paid once outside the scan, reusing the jitter
    ladder — ``sample_gp``'s draw primitive, reference
    ``sampler.py:122-137``).
  * The angle-shrinkage loop is a ``lax.while_loop`` (provably
    terminates: the bracket halves toward ϑ=0 where L(f')→L(f)); one
    transition is therefore fully jittable, and the chain is one
    ``lax.scan``.  Chains vmap/shard exactly like the hyperparameter
    samplers in ``sample/mcmc.py``.
  * The pointwise ``log_lik`` from ``models/obs.py`` supplies the
    slice function — any observation model works unchanged.

Reference: the repo being re-built has no latent sampler of any kind;
this extends the north-star MCMC story (BASELINE.md config 3) from
hyperparameters to latents, enabling fully Bayesian non-Gaussian
prediction (mix ESS latent draws inside MCMC hyperparameter draws).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.ops import linalg
from pygpr_tpu.ops.kernels import Kernel

Array = jax.Array


class ESSResult(NamedTuple):
    samples: Array    #: [n_samples, n] latent draws f ~ p(f | y, X, θ)
    log_lik: Array    #: [n_samples] Σᵢ log p(yᵢ|fᵢ) along the chain


def _ess_step(log_l, chol_k: Array, f: Array, ll: Array, key: Array):
    """One elliptical slice transition (Murray et al., Fig. 2)."""
    k_nu, k_u, k_theta, k_loop = jax.random.split(key, 4)
    nu = jnp.dot(
        chol_k, jax.random.normal(k_nu, f.shape, f.dtype)
    )
    log_u = ll + jnp.log(jax.random.uniform(k_u, dtype=f.dtype))
    theta = jax.random.uniform(
        k_theta, dtype=f.dtype, minval=0.0, maxval=2.0 * math.pi
    )
    lo, hi = theta - 2.0 * math.pi, theta

    def proposal(th):
        fp = f * jnp.cos(th) + nu * jnp.sin(th)
        return fp, log_l(fp)

    def cond(state):
        return state[1] <= log_u

    def body(state):
        th, _, _, lo, hi, k = state
        lo = jnp.where(th < 0.0, th, lo)
        hi = jnp.where(th < 0.0, hi, th)
        # uniform shrink toward ϑ=0 (where f'=f and L(f') = L(f) > log u,
        # so termination is guaranteed)
        k, k_th = jax.random.split(k)
        th = lo + (hi - lo) * jax.random.uniform(k_th, dtype=f.dtype)
        fp, llp = proposal(th)
        return th, llp, fp, lo, hi, k

    f0, ll0 = proposal(theta)
    _, ll_new, f_new, _, _, _ = jax.lax.while_loop(
        cond, body, (theta, ll0, f0, lo, hi, k_loop)
    )
    return f_new, ll_new


def sample_latent(
    kern: Kernel,
    params: Array,
    lik,
    lik_params: Array,
    x: Array,
    y: Array,
    key: Array,
    *,
    n_samples: int = 200,
    n_warmup: int = 100,
    thin: int = 1,
    f0: Array = None,
    config: Config = DEFAULT,
) -> ESSResult:
    """Sample the latent posterior ``p(f | y, X, θ)`` by ESS.

    ``thin`` keeps every ``thin``-th post-warmup state (the scan still
    runs every transition; thinning only bounds the stored output).
    ``f0`` defaults to the zero function (the prior mean).
    """
    K = kern.matrix(params, x, config=config)
    chol_k = linalg.safe_cholesky(K, config).chol

    def log_l(f):
        return jnp.sum(lik.log_lik(lik_params, y, f))

    f = jnp.zeros_like(y) if f0 is None else f0
    ll = log_l(f)

    def transition(carry, k):
        f, ll = carry
        f, ll = _ess_step(log_l, chol_k, f, ll, k)
        return (f, ll), None

    keys = jax.random.split(key, n_warmup + n_samples * thin)
    (f, ll), _ = jax.lax.scan(transition, (f, ll), keys[:n_warmup])

    def keep(carry, ks):
        (f, ll) = carry
        (f, ll), _ = jax.lax.scan(transition, (f, ll), ks)
        return (f, ll), (f, ll)

    _, (samples, lls) = jax.lax.scan(
        keep, (f, ll), keys[n_warmup:].reshape(n_samples, thin, -1)
    )
    return ESSResult(samples=samples, log_lik=lls)


def predictive_latent_mixture(
    kern: Kernel,
    params: Array,
    x: Array,
    result: ESSResult,
    xp: Array,
    config: Config = DEFAULT,
) -> Tuple[Array, Array]:
    """Latent predictive moments at ``xp`` marginalized over the ESS
    draws (Monte-Carlo mixture, law of total variance).

    Each draw contributes the noiseless conditional
    ``N(K*ᵀK⁻¹f, K** − K*ᵀK⁻¹K*)``; the conditional covariance is
    f-independent, so it is computed once and only the means mix.
    """
    K = kern.matrix(params, x, config=config)
    res = linalg.safe_cholesky(K, config)
    krns = kern.matrix(params, x, xp, config=config)      # [m, n]
    lks = linalg.cholesky_solve(res.chol, krns.T)          # [n, m]
    base_var = kern.diag(params, xp, config=config) - jnp.sum(
        krns * lks.T, axis=-1
    )
    base_var = jnp.maximum(base_var, jnp.asarray(0.0, base_var.dtype))
    means = jnp.matmul(
        result.samples, lks, precision=config.precision
    )                                                      # [S, m]
    mean = jnp.mean(means, axis=0)
    var = base_var + jnp.var(means, axis=0)
    return mean, var
