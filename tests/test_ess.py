"""Elliptical slice sampling (sample/ess.py) — Murray et al. 2010.

Oracle: with a Gaussian likelihood the latent posterior is the exact
GP posterior N(K(K+σₙ²I)⁻¹y, K − K(K+σₙ²I)⁻¹K) — ESS moments must
match it to Monte-Carlo tolerance.  For non-Gaussian targets, the
sampler must agree with the Laplace mode (consistency between the two
independent inference engines) and be key-deterministic.
"""

import jax
import jax.numpy as jnp
import numpy as np

import pygpr_tpu as gp
from pygpr_tpu.models import laplace
from pygpr_tpu.models.obs import BernoulliLogit, GaussianLik
from pygpr_tpu.ops import linalg
from pygpr_tpu.sample import ess


def _setup(rng, n=40, sig_n=0.25):
    x = rng.uniform(0.0, 4.0, (n, 1))
    f = np.sin(2.0 * x[:, 0])
    y = f + sig_n * rng.normal(size=n)
    return jnp.asarray(x), jnp.asarray(y), sig_n


def _exact_latent_posterior(kern, p, x, y, sig_n):
    K = np.asarray(kern.matrix(p, x))
    n = K.shape[0]
    A = K + sig_n**2 * np.eye(n)
    mean = K @ np.linalg.solve(A, np.asarray(y))
    cov = K - K @ np.linalg.solve(A, K)
    return mean, cov


def test_gaussian_moments_match_exact(rng):
    x, y, sig_n = _setup(rng)
    kern = gp.RBF()
    p = jnp.asarray([1.0, 1.0])
    lik = GaussianLik()
    lp = jnp.asarray([np.log(sig_n)])
    res = jax.jit(
        lambda k: ess.sample_latent(
            kern, p, lik, lp, x, y, k,
            n_samples=3000, n_warmup=300, thin=2,
        )
    )(jax.random.PRNGKey(0))
    S = np.asarray(res.samples)
    mean_ex, cov_ex = _exact_latent_posterior(kern, p, x, y, sig_n)
    sd_ex = np.sqrt(np.diag(cov_ex))
    # MC tolerance: ~sd/sqrt(ESS); thinned chain of 3000 has ESS ≥ few
    # hundred, so 5 MC-σ with ESS=100 ≈ 0.5 sd
    err = np.abs(S.mean(0) - mean_ex)
    assert np.max(err / sd_ex) < 0.5, np.max(err / sd_ex)
    ratio = S.std(0) / sd_ex
    assert 0.7 < ratio.min() and ratio.max() < 1.35, (
        ratio.min(), ratio.max()
    )


def test_predictive_mixture_matches_exact(rng):
    x, y, sig_n = _setup(rng)
    kern = gp.RBF()
    p = jnp.asarray([1.0, 1.0])
    res = jax.jit(
        lambda k: ess.sample_latent(
            kern, p, GaussianLik(), jnp.asarray([np.log(sig_n)]),
            x, y, k, n_samples=3000, n_warmup=300, thin=2,
        )
    )(jax.random.PRNGKey(1))
    xs = jnp.asarray(np.linspace(0.2, 3.8, 17)[:, None])
    mu, var = ess.predictive_latent_mixture(kern, p, x, res, xs)
    # exact latent predictive through the kernel-layer noise form
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    import pygpr_tpu.models.exact_gp as eg
    st = eg.factorize(cov, jnp.asarray([1.0, 1.0, sig_n]), x, y)
    mu_ex, var_ex = eg.predict(cov, st, xs, var="diag")
    var_ex = np.asarray(var_ex) - sig_n**2  # strip the k** noise term
    sd = np.sqrt(var_ex)
    assert np.max(np.abs(np.asarray(mu) - np.asarray(mu_ex)) / sd) < 0.5
    assert np.allclose(np.asarray(var), var_ex, rtol=0.35)


def test_logit_agrees_with_laplace_mode(rng):
    x = jnp.asarray(rng.uniform(0.0, 4.0, (50, 1)))
    f = np.sin(2.0 * np.asarray(x)[:, 0])
    y = jnp.asarray((f > 0).astype(np.float64))
    kern = gp.RBF()
    p = jnp.asarray([2.0, 1.0])
    lik = BernoulliLogit()
    lp = jnp.zeros((0,))
    res = jax.jit(
        lambda k: ess.sample_latent(
            kern, p, lik, lp, x, y, k,
            n_samples=2000, n_warmup=300, thin=2,
        )
    )(jax.random.PRNGKey(2))
    post_mean = np.asarray(res.samples).mean(0)
    st = laplace.posterior_mode(kern, p, lik, lp, x, y)
    f_hat = np.asarray(st.f_hat)
    cos = post_mean @ f_hat / (
        np.linalg.norm(post_mean) * np.linalg.norm(f_hat)
    )
    assert cos > 0.95, cos
    # both engines classify the training set the same way
    assert np.mean((post_mean > 0) == (f_hat > 0)) > 0.95


def test_key_deterministic_and_moves(rng):
    x, y, sig_n = _setup(rng, n=20)
    args = (
        gp.RBF(), jnp.asarray([1.0, 1.0]), GaussianLik(),
        jnp.asarray([np.log(sig_n)]), x, y,
    )
    r1 = ess.sample_latent(*args, jax.random.PRNGKey(7),
                           n_samples=50, n_warmup=10)
    r2 = ess.sample_latent(*args, jax.random.PRNGKey(7),
                           n_samples=50, n_warmup=10)
    np.testing.assert_array_equal(
        np.asarray(r1.samples), np.asarray(r2.samples)
    )
    # rejection-free: consecutive states always differ
    diffs = np.abs(np.diff(np.asarray(r1.samples), axis=0)).max(axis=1)
    assert (diffs > 0).all()


def test_ess_sharded_matches_single_device(rng):
    """mcmc_sharded(sampler="ess"): chains shard over the chain mesh
    axis and reproduce the SAME draws as the equivalent un-sharded
    vmap (same key-splitting tree), so sharded == single-device
    exactly, not just in distribution."""
    from pygpr_tpu.parallel import make_mesh
    from pygpr_tpu.parallel.sharded import mcmc_sharded

    x, y, sig_n = _setup(rng, n=24)
    kern = gp.RBF()
    p = jnp.asarray([1.0, 1.0])
    lik = GaussianLik()
    lp = jnp.asarray([np.log(sig_n)])
    n_shards = 4
    n_chains = 8
    mesh = make_mesh(n_expert=1, n_chain=n_shards)
    key = jax.random.PRNGKey(7)

    res = mcmc_sharded(
        kern, x, y, key, mesh,
        n_chains=n_chains, sampler="ess",
        params=p, lik=lik, lik_params=lp,
        n_samples=50, n_warmup=20,
    )
    assert res.samples.shape == (n_chains, 50, x.shape[0])

    # un-sharded reference with the identical key tree
    keys = jax.random.split(key, n_shards)
    ref = []
    for ks in keys:
        for kk in jax.random.split(ks, n_chains // n_shards):
            ref.append(
                ess.sample_latent(
                    kern, p, lik, lp, x, y, kk,
                    n_samples=50, n_warmup=20,
                ).samples
            )
    np.testing.assert_allclose(
        np.asarray(res.samples), np.stack(ref), atol=1e-10
    )
