"""NUTS sampler tests: exactness on a known Gaussian target, moment
parity with the adaptive-RWM chain on a real GP hyperparameter
posterior, adaptive-termination behavior, and the checkpoint-slot
arithmetic of the iterative tree (the part that is easy to get subtly
wrong).  The reference has no hyperparameter sampler at all
(SURVEY.md §2.6 note)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

import pygpr_tpu as gp
from pygpr_tpu.sample import (
    effective_sample_size,
    posterior_moments,
    run_nuts,
    sample_posterior,
    sample_posterior_nuts,
    split_rhat,
)
from pygpr_tpu.sample.nuts import _popcount, _trailing_ones


def _gp_problem(n=48, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(0, 4, (n, 1)), axis=0))
    y = jnp.asarray(
        np.sin(2.0 * np.asarray(x)[:, 0]) + 0.2 * rng.normal(size=n)
    )
    return x, y, gp.Sum((gp.RBF(), gp.WhiteNoise()))


def test_checkpoint_bit_arithmetic():
    """Slot bookkeeping of the iterative tree vs plain-Python bit ops:
    even leaf i stores at popcount(i); odd leaf n closes the dyadic
    ranges ending at n, whose left endpoints were stored at exactly
    slots idx_min..idx_max."""
    nbits = 8
    for i in range(256):
        assert int(_popcount(jnp.int32(i), nbits)) == bin(i).count("1")
        t = 0
        while (i >> t) & 1:
            t += 1
        assert int(_trailing_ones(jnp.int32(i), nbits)) == t

    # semantic check: for every odd leaf n, the dyadic ranges ending at
    # n are [n+1-2^m, n] for each 2^m | n+1; their left endpoints a are
    # even and must live at slot popcount(a), and the slot window
    # [idx_min, idx_max] must be exactly {popcount(a)} over those a.
    for n in range(1, 128, 2):
        slots = set()
        m = 1
        while (n + 1) % (1 << m) == 0:
            a = n + 1 - (1 << m)
            slots.add(bin(a).count("1"))
            m += 1
        idx_max = int(_popcount(jnp.int32(n >> 1), nbits))
        idx_min = idx_max - int(_trailing_ones(jnp.int32(n), nbits)) + 1
        assert slots == set(range(idx_min, idx_max + 1)), n


def test_nuts_gaussian_target_exact():
    """On a correlated 2-D Gaussian the chain must recover mean and
    covariance within MC error, never diverge, and terminate its
    trajectories adaptively (mean depth strictly below max_depth)."""
    cov = np.array([[1.0, 0.9], [0.9, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov))
    lp = lambda u: -0.5 * u @ prec @ u

    run = functools.partial(
        run_nuts, lp, n_samples=1500, n_warmup=500, max_depth=6
    )
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    u0s = jnp.asarray(np.random.default_rng(1).normal(size=(4, 2)))
    us, _, acc, eps, depth, div, _ = jax.vmap(
        lambda u, k: run(u, k)
    )(u0s, keys)

    flat = np.asarray(us).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(0), 0.0, atol=0.1)
    np.testing.assert_allclose(np.cov(flat.T), cov, atol=0.12)
    assert np.all(np.asarray(div) == 0.0)
    assert np.all(np.asarray(acc) > 0.6)
    assert np.all(np.asarray(depth) < 6.0)  # trees self-terminate
    assert np.all(np.asarray(eps) > 0.0)


def test_nuts_matches_rwm_on_gp_posterior():
    """NUTS and the existing adaptive-RWM sampler target the identical
    log-posterior (same prior, same NLML), so their pooled posterior
    moments must agree within MC tolerance."""
    x, y, cov = _gp_problem()
    res_n = sample_posterior_nuts(
        cov, x, y, jax.random.PRNGKey(0),
        n_samples=400, n_warmup=400, n_chains=4, max_depth=6,
    )
    res_r = sample_posterior(
        cov, x, y, jax.random.PRNGKey(1),
        n_samples=6000, n_warmup=2000, n_chains=4,
    )
    mn, sn = posterior_moments(jnp.log(res_n.samples))
    mr, sr = posterior_moments(jnp.log(res_r.samples))
    np.testing.assert_allclose(
        np.asarray(mn), np.asarray(mr), atol=0.15
    )
    np.testing.assert_allclose(
        np.asarray(sn), np.asarray(sr), atol=0.12
    )
    assert np.all(np.asarray(split_rhat(jnp.log(res_n.samples))) < 1.05)
    assert np.all(np.asarray(res_n.divergence_rate) < 0.02)
    # the whole point of gradient-guided trajectories: far better
    # mixing per draw than the random walk
    ess_n = effective_sample_size(np.log(np.asarray(res_n.samples)))
    n_total = res_n.samples.shape[0] * res_n.samples.shape[1]
    assert ess_n.min() > 0.1 * n_total


def test_nuts_mass_adaptation_helps_anisotropic():
    """On a badly scaled Gaussian (std 1 vs 30) the adapted diagonal
    metric must pick up the scale separation and the sampler must
    still recover the wide coordinate's variance."""
    scales = np.array([1.0, 30.0])
    prec = jnp.asarray(np.diag(1.0 / scales**2))
    lp = lambda u: -0.5 * u @ prec @ u
    us, _, _, _, _, div, inv_mass = run_nuts(
        lp,
        jnp.zeros(2),
        jax.random.PRNGKey(3),
        n_samples=2500,
        n_warmup=800,
        max_depth=8,
    )
    assert float(div) == 0.0
    im = np.asarray(inv_mass)
    # adapted inverse metric ≈ posterior variance ⇒ ratio ≈ 900
    assert im[1] / im[0] > 50.0
    flat = np.asarray(us)
    assert 20.0 < flat[:, 1].std() < 45.0
    assert 0.7 < flat[:, 0].std() < 1.4


def test_nuts_sync_fn_hook_and_no_mass():
    """The cross-host coordination hook is applied to the
    dual-averaging statistic (contract shared with RWM/HMC), and the
    adapt_mass=False path runs with a unit metric."""
    calls = []

    def sync(s):
        calls.append(True)
        return s

    x, y, cov = _gp_problem(n=24)
    res = sample_posterior_nuts(
        cov, x, y, jax.random.PRNGKey(5),
        n_samples=30, n_warmup=30, n_chains=2,
        adapt_mass=False, sync_fn=sync,
    )
    assert calls  # traced through the hook
    assert np.isfinite(np.asarray(res.samples)).all()
    np.testing.assert_allclose(np.asarray(res.inv_mass), 1.0)
