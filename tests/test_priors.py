"""Hyperparameter priors (``models/priors.py``) — MAP fit and
prior-informed MCMC.

Density normalization against scipy.stats, MAP-vs-MLE shrinkage
behavior, the prior-dominates limit, and the u-space Jacobian the
samplers rely on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pygpr_tpu as gp
from pygpr_tpu.models.priors import (
    Gamma,
    HalfNormal,
    LogNormal,
    Uniform,
    log_prior,
    log_prior_u,
)

COV = gp.Sum((gp.RBF(), gp.WhiteNoise()))


def test_densities_match_scipy():
    from scipy import stats

    t = np.asarray([0.2, 0.7, 1.5, 4.0])
    tj = jnp.asarray(t)
    np.testing.assert_allclose(
        np.asarray(LogNormal(0.3, 0.8).log_prob(tj)),
        stats.lognorm.logpdf(t, s=0.8, scale=np.exp(0.3)),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(Gamma(2.5, 1.3).log_prob(tj)),
        stats.gamma.logpdf(t, a=2.5, scale=1 / 1.3),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(HalfNormal(0.6).log_prob(tj)),
        stats.halfnorm.logpdf(t, scale=0.6),
        rtol=1e-10,
    )
    u = Uniform(0.5, 2.0)
    np.testing.assert_allclose(
        np.asarray(u.log_prob(tj[1:3])),
        stats.uniform.logpdf(t[1:3], loc=0.5, scale=1.5),
        rtol=1e-10,
    )
    assert np.asarray(u.log_prob(jnp.asarray(4.0))) == -np.inf


def test_log_prior_none_entries_and_length_check():
    theta = jnp.asarray([1.0, 2.0, 0.5])
    lp = log_prior([None, LogNormal(), None], theta)
    np.testing.assert_allclose(
        float(lp), float(LogNormal().log_prob(jnp.asarray(2.0)))
    )
    with pytest.raises(ValueError):
        log_prior([None], theta)


def test_log_prior_u_jacobian():
    """p_u(u) = p_θ(e^u)·e^u — verified by normalizing over a grid."""
    prior = Gamma(3.0, 2.0)
    u = jnp.linspace(-8.0, 4.0, 20001)
    dens = jnp.exp(log_prior_u([prior], u[:, None]))
    integral = float(jnp.trapezoid(dens, u))
    np.testing.assert_allclose(integral, 1.0, rtol=1e-4)


def _data(rng, n=64):
    x = jnp.asarray(rng.uniform(0, 4, (n, 1)))
    y = jnp.sin(2 * x[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=n))
    return x, y


def test_fit_map_weak_prior_matches_mle(rng):
    x, y = _data(rng)
    p0 = jnp.ones(3)
    from pygpr_tpu.models.likelihood import nlml

    mle = gp.fit_mle(COV, p0, x, y)
    weak = [LogNormal(0.0, 50.0)] * 3
    mapr = gp.fit_map(COV, p0, x, y, weak)
    # the NLML surface is flat near the optimum, so compare achieved
    # NLML (the noise coordinate is the identifiable one)
    v_mle = float(nlml(COV, mle.params, x, y))
    v_map = float(nlml(COV, mapr.params, x, y))
    assert v_map < v_mle + 0.5, (v_map, v_mle)
    np.testing.assert_allclose(
        abs(float(mapr.params[-1])), abs(float(mle.params[-1])),
        rtol=5e-2,
    )


def test_fit_map_strong_prior_dominates(rng):
    """With ~zero-width priors the MAP point is the prior mode."""
    x, y = _data(rng)
    p0 = jnp.ones(3)
    mode = np.asarray([0.7, 2.0, 0.3])
    strong = [LogNormal(float(np.log(m)), 1e-3) for m in mode]
    res = gp.fit_map(COV, p0, x, y, strong, max_iter=300)
    np.testing.assert_allclose(np.asarray(res.params), mode, rtol=1e-2)


def test_fit_map_noise_floor_rescues_degenerate_fit(rng):
    """n small + noiseless-looking data drives MLE noise → 0
    (interpolation mode); a HalfNormal floor prior keeps MAP sane
    while leaving signal params free (None entries)."""
    n = 24
    x = jnp.asarray(np.linspace(0, 4, n)[:, None])
    y = jnp.sin(2 * x[:, 0])  # exactly noiseless
    p0 = jnp.ones(3)
    mle = gp.fit_mle(COV, p0, x, y)
    pri = [None, None, HalfNormal(0.2)]
    mapr = gp.fit_map(COV, p0, x, y, pri)
    assert abs(float(mapr.params[-1])) >= abs(float(mle.params[-1]))
    assert np.isfinite(float(mapr.value))


def test_mcmc_with_priors_shifts_posterior(rng):
    """A tight Gamma prior on σₙ must pull the posterior noise mean
    toward the prior mode relative to the default-prior chain."""
    from pygpr_tpu.sample.mcmc import sample_posterior

    x, y = _data(rng, n=48)
    key = jax.random.PRNGKey(0)
    kwargs = dict(n_samples=300, n_warmup=300, n_chains=2)
    base = sample_posterior(COV, x, y, key, **kwargs)
    # prior mode (a-1)/b = 0.5, tight
    pri = [None, None, Gamma(400.0, 800.0)]
    shifted = sample_posterior(COV, x, y, key, priors=pri, **kwargs)
    m_base = float(jnp.mean(jnp.abs(base.samples[..., -1])))
    m_shift = float(jnp.mean(jnp.abs(shifted.samples[..., -1])))
    assert abs(m_shift - 0.5) < 0.1, m_shift
    assert abs(m_shift - 0.5) < abs(m_base - 0.5)


def test_fit_map_committee_vmap(rng):
    """MAP auto-vmaps over the leading committee axis like fit_mle."""
    nc, n = 3, 40
    x = jnp.asarray(rng.uniform(0, 4, (nc, n, 1)))
    y = jnp.sin(2 * x[..., 0]) + 0.1 * jnp.asarray(
        rng.normal(size=(nc, n)))
    res = gp.fit_map(COV, jnp.ones(3), x, y,
                     [LogNormal(0.0, 2.0)] * 3)
    assert res.params.shape == (nc, 3)
    assert np.isfinite(np.asarray(res.value)).all()
