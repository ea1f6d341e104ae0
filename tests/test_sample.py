"""Sampling-layer tests: designs (hard-core property, clustering),
GP prior draws, and MCMC posterior-moment checks — coverage the
reference lacks entirely (SURVEY.md §4 "Not covered by tests")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pygpr_tpu as gp
from pygpr_tpu.sample import (
    Matern1,
    Uniform,
    assign_clusters,
    cluster_samples,
    euclidean_dist,
    posterior_moments,
    sample_gp,
    sample_posterior,
    split_rhat,
)


def test_uniform_in_box_and_seeded():
    s = Uniform(seed=3)
    mins, maxs = jnp.asarray([0.0, -1.0]), jnp.asarray([2.0, 1.0])
    x = s.sample(100, mins, maxs)
    assert x.shape == (100, 2)
    assert np.all(np.asarray(x) >= np.asarray(mins))
    assert np.all(np.asarray(x) <= np.asarray(maxs))
    x2 = Uniform(seed=3).sample(100, mins, maxs)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x2))
    x3 = Uniform(seed=4).sample(100, mins, maxs)
    assert not np.allclose(np.asarray(x), np.asarray(x3))


def test_matern1_hard_core_property():
    """Every accepted pair is ≥ min_dist apart (sampler.py:41)."""
    s = Matern1(seed=0, max_count=500)
    mins, maxs = jnp.zeros(2), jnp.ones(2)
    n = 20
    x = s.sample(n, mins, maxs)
    assert x.shape == (n, 2)
    d = np.sqrt(np.maximum(np.asarray(euclidean_dist(x, x)), 0.0))
    np.fill_diagonal(d, np.inf)
    assert d.min() > s.min_dist


def test_matern1_shrinks_min_dist():
    """Requesting many points in a small box forces the ×0.9 shrink
    loop (sampler.py:57-59)."""
    s = Matern1(seed=1, max_count=1000)
    x = s.sample(100, jnp.zeros(2), jnp.ones(2))
    assert x.shape == (100, 2)
    assert s.min_dist < (1.0 / 100) ** 0.5  # below the initial guess


def test_partition_shapes_and_membership():
    s = Matern1(seed=2, max_count=400)
    nc, ns = 4, 25
    xpart, xc = s.partition(nc, ns, jnp.zeros(2), jnp.ones(2))
    assert xpart.shape == (nc, ns, 2)
    assert xc.shape == (nc, 2)
    # each shard's points are nearest (or near-nearest) to its center
    for i in range(nc):
        d_own = np.asarray(
            np.sum((np.asarray(xpart[i]) - np.asarray(xc[i])) ** 2, -1)
        )
        assert np.isfinite(d_own).all()


def test_assign_clusters_nearest(rng):
    x = jnp.asarray(rng.uniform(size=(40, 2)))
    xc = jnp.asarray([[0.25, 0.5], [0.75, 0.5]])
    part = assign_clusters(x, xc, 10)
    assert part.shape == (2, 10, 2)
    # points in shard 0 are closer to center 0 than to center 1
    # (holds when clusters are large enough to fill both shards)
    d0 = np.sum((np.asarray(part[0]) - np.asarray(xc[0])) ** 2, -1)
    d1 = np.sum((np.asarray(part[0]) - np.asarray(xc[1])) ** 2, -1)
    assert (d0 <= d1).mean() > 0.8


def test_cluster_samples_parity_api(rng):
    x = jnp.asarray(rng.uniform(size=(40, 2)))
    xc = jnp.asarray(rng.uniform(size=(4, 2)))
    part = cluster_samples(x, xc)
    assert part.shape == (4, 10, 2)
    with pytest.raises(AssertionError):
        cluster_samples(jnp.asarray(rng.uniform(size=(41, 2))), xc)


def test_sample_gp_statistics():
    """Prior draws have the kernel's covariance structure: marginal
    variance ≈ σ² and strong short-range correlation."""
    n = 80
    x = jnp.linspace(0, 1, n)[:, None]
    cov = gp.RBF()
    hp = jnp.asarray([1.0, 2.0])
    draws = np.stack(
        [
            np.asarray(
                sample_gp(x, cov, hp, key=jax.random.PRNGKey(i))
            )
            for i in range(300)
        ]
    )
    var = draws.var(axis=0)
    assert 0.7 < var.mean() < 1.3  # σ²=1
    # neighbors are highly correlated under an RBF prior
    c = np.corrcoef(draws[:, 0], draws[:, 1])[0, 1]
    assert c > 0.9


def test_sample_gp_mean_shift():
    x = jnp.linspace(0, 1, 10)[:, None]
    mean = jnp.full((10,), 5.0)
    f = sample_gp(x, gp.RBF(), jnp.asarray([1e-3, 1.0]), mean=mean)
    np.testing.assert_allclose(np.asarray(f), 5.0, atol=0.1)


@pytest.mark.slow
def test_mcmc_posterior_moments(rng):
    """North-star check: posterior concentrates near the generating
    hyperparameters on synthetic data (BASELINE config 3)."""
    n, dim = 60, 1
    x = jnp.asarray(rng.uniform(0, 3, size=(n, dim)))
    true_noise = 0.1
    y = jnp.sin(2.0 * x[:, 0]) + true_noise * jnp.asarray(rng.normal(size=n))
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    res = sample_posterior(
        cov, x, y, jax.random.PRNGKey(0),
        n_samples=400, n_warmup=400, n_chains=4,
    )
    assert res.samples.shape == (4, 400, 3)
    acc = np.asarray(res.accept_rate)
    assert np.all(acc > 0.1) and np.all(acc < 0.7)  # adaptation worked
    mean, std = posterior_moments(res.samples)
    noise_post = float(mean[-1])
    assert 0.05 < noise_post < 0.25  # brackets true 0.1
    rhat = np.asarray(split_rhat(res.samples))
    assert np.all(rhat < 1.3)


def test_predictive_mixture(rng):
    """Fully Bayesian predictive (hyperparameter-marginalized):
    lax.map path == brute per-sample loop; degenerate single-sample
    case == the plug-in predictive exactly; hyperparameter uncertainty
    only ever widens the predictive (law of total variance)."""
    from pygpr_tpu.models import exact_gp
    from pygpr_tpu.sample import predictive_mixture

    n = 48
    x = jnp.asarray(rng.uniform(0, 3, size=(n, 1)))
    y = jnp.sin(2.0 * x[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=n))
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    xs = jnp.asarray(rng.uniform(0, 3, size=(16, 1)))
    res = sample_posterior(
        cov, x, y, jax.random.PRNGKey(2),
        n_samples=60, n_warmup=150, n_chains=2,
    )

    mean, var = predictive_mixture(cov, x, y, res.samples, xs, n_use=24)
    assert np.isfinite(np.asarray(mean)).all()
    assert (np.asarray(var) > 0).all()

    # brute-force mixture over the same thinned draws
    flat = res.samples.reshape(-1, 3)
    use = flat[:: max(flat.shape[0] // 24, 1)][:24]
    mus, vs = [], []
    for p in np.asarray(use):
        st = exact_gp.factorize(cov, jnp.asarray(p), x, y)
        m, v = exact_gp.predict(cov, st, xs, "diag")
        mus.append(np.asarray(m))
        vs.append(np.asarray(v))
    mus, vs = np.stack(mus), np.stack(vs)
    np.testing.assert_allclose(np.asarray(mean), mus.mean(0), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(var), vs.mean(0) + mus.var(0), rtol=1e-7
    )
    # mixture variance ≥ mean component variance
    assert (np.asarray(var) >= vs.mean(0) - 1e-12).all()

    # single draw == plug-in
    one = res.samples[:1, :1]
    m1, v1 = predictive_mixture(cov, x, y, one, xs, n_use=1)
    st = exact_gp.factorize(cov, one[0, 0], x, y)
    mp, vp = exact_gp.predict(cov, st, xs, "diag")
    np.testing.assert_allclose(np.asarray(m1), np.asarray(mp), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(vp), rtol=1e-12)


def test_effective_sample_size_calibration(rng):
    """iid draws → ESS ≈ n; AR(1) with φ=0.9 → ESS ≈ n(1−φ)/(1+φ)."""
    from pygpr_tpu.sample import effective_sample_size

    nc, ns = 4, 4000
    iid = rng.normal(size=(nc, ns, 1))
    ess = effective_sample_size(iid)[0]
    assert 0.7 * nc * ns < ess < 1.3 * nc * ns, ess

    phi = 0.9
    z = np.empty((nc, ns))
    z[:, 0] = rng.normal(size=nc)
    eps = rng.normal(size=(nc, ns))
    for t in range(1, ns):
        z[:, t] = phi * z[:, t - 1] + np.sqrt(1 - phi**2) * eps[:, t]
    ess_ar = effective_sample_size(z[:, :, None])[0]
    want = nc * ns * (1 - phi) / (1 + phi)
    assert 0.5 * want < ess_ar < 2.0 * want, (ess_ar, want)
    assert ess_ar < 0.1 * nc * ns


def test_mcmc_runs_jitted(rng):
    """The whole sampler is one jittable program."""
    n = 20
    x = jnp.asarray(rng.uniform(size=(n, 1)))
    y = jnp.sin(x[:, 0])
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    f = jax.jit(
        lambda k: sample_posterior(
            cov, x, y, k, n_samples=20, n_warmup=20, n_chains=2
        ).samples
    )
    s = f(jax.random.PRNGKey(1))
    assert s.shape == (2, 20, 3)
    assert np.isfinite(np.asarray(s)).all()


@pytest.mark.slow
def test_hmc_posterior_moments(rng):
    """HMC recovers the generating noise level (gradient-guided
    counterpart of the RWM check above)."""
    from pygpr_tpu.sample import sample_posterior_hmc

    n = 60
    x = jnp.asarray(rng.uniform(0, 3, size=(n, 1)))
    y = jnp.sin(2.0 * x[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=n))
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    res = sample_posterior_hmc(
        cov, x, y, jax.random.PRNGKey(0),
        n_samples=200, n_warmup=200, n_chains=4,
    )
    assert res.samples.shape == (4, 200, 3)
    acc = np.asarray(res.accept_rate)
    assert np.all(acc > 0.3)
    mean, _ = posterior_moments(res.samples)
    assert 0.05 < float(mean[-1]) < 0.25
    rhat = np.asarray(split_rhat(res.samples))
    assert np.all(rhat < 1.3)


def test_sobol_design_low_discrepancy():
    """Scrambled Sobol: deterministic per seed, in-box, and lower
    centered L2 discrepancy than iid uniform at the same n (the
    property QMC designs exist for)."""
    from scipy.stats import qmc

    from pygpr_tpu.sample import Sobol

    mins, maxs = jnp.zeros(3), jnp.ones(3)
    x = Sobol(seed=1).sample(256, mins, maxs)
    x2 = Sobol(seed=1).sample(256, mins, maxs)
    x3 = Sobol(seed=2).sample(256, mins, maxs)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x2))
    assert not np.allclose(np.asarray(x), np.asarray(x3))
    xa = np.asarray(x)
    assert (xa >= 0).all() and (xa <= 1).all()
    u = np.asarray(gp.Uniform(seed=1).sample(256, mins, maxs))
    assert qmc.discrepancy(xa) < 0.25 * qmc.discrepancy(u)
