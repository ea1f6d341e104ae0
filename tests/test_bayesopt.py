"""Bayesian optimization (``optimize/bayesopt.py``).

Closed-form acquisition oracles (EI vs Monte Carlo, PI vs normal CDF),
LogEI stability where EI underflows, in-box proposals, and the full
ask/tell loop actually minimizing a 2-D test function.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pygpr_tpu import RBF, Sum, WhiteNoise, factorize
from pygpr_tpu.optimize.bayesopt import (
    BayesOpt,
    expected_improvement,
    log_expected_improvement,
    lower_confidence_bound,
    probability_of_improvement,
    propose,
    thompson_sample,
)

COV = Sum((RBF(), WhiteNoise()))


def test_ei_matches_monte_carlo(rng):
    """EI == E[max(0, best − f)] under f ~ N(μ, σ²)."""
    mean = jnp.asarray([0.3, -1.0, 2.0])
    var = jnp.asarray([0.5, 2.0, 0.1])
    best = jnp.asarray(0.0)
    z = rng.normal(size=(2_000_000, 3))
    f = np.asarray(mean) + np.sqrt(np.asarray(var)) * z
    mc = np.maximum(0.0, float(best) - f).mean(0)
    np.testing.assert_allclose(
        np.asarray(expected_improvement(mean, var, best)),
        mc, rtol=5e-3, atol=1e-4,
    )


def test_log_ei_consistent_and_stable():
    mean = jnp.asarray([0.0, 1.0, 5.0, 30.0])
    var = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    best = jnp.asarray(0.0)
    ei = expected_improvement(mean, var, best)
    lei = log_expected_improvement(mean, var, best)
    # consistent where EI is representable
    np.testing.assert_allclose(
        np.asarray(jnp.exp(lei[:3])), np.asarray(ei[:3]), rtol=1e-6
    )
    # z = −30: EI underflows to 0 but logEI stays finite and ordered
    assert np.isfinite(float(lei[3]))
    assert float(lei[3]) < float(lei[2]) < float(lei[1])
    # gradient survives the deep-negative branch
    g = jax.grad(
        lambda m: jnp.sum(log_expected_improvement(m, var, best))
    )(mean)
    assert np.isfinite(np.asarray(g)).all()


def test_pi_and_lcb_forms():
    from scipy.stats import norm

    mean = jnp.asarray([0.5, -0.5])
    var = jnp.asarray([0.25, 4.0])
    best = jnp.asarray(0.0)
    pi = probability_of_improvement(mean, var, best)
    expect = norm.cdf((0.0 - np.asarray(mean)) / np.sqrt(np.asarray(var)))
    np.testing.assert_allclose(np.asarray(pi), expect, rtol=1e-6)
    lcb = lower_confidence_bound(mean, var, beta=2.0)
    np.testing.assert_allclose(
        np.asarray(lcb),
        -(np.asarray(mean) - 2.0 * np.sqrt(np.asarray(var))),
        rtol=1e-6,
    )


@pytest.mark.parametrize("acq", ["log_ei", "ei", "lcb", "pi"])
def test_propose_in_bounds(acq, rng):
    x = jnp.asarray(rng.uniform(size=(20, 2)))
    y = (x**2).sum(-1)
    state = factorize(COV, COV.init_params(x), x, y)
    lo, hi = jnp.zeros(2), jnp.ones(2)
    xn = propose(
        COV, state, (lo, hi), jax.random.PRNGKey(0), acq=acq,
        n_raw=128, n_starts=4, n_steps=30,
    )
    assert xn.shape == (2,)
    assert np.all(np.asarray(xn) >= 0.0) and np.all(np.asarray(xn) <= 1.0)


def test_propose_improves_on_raw_sweep(rng):
    """Gradient ascent must beat the best raw candidate it started at."""
    from pygpr_tpu.optimize.bayesopt import _acq_values
    from pygpr_tpu.config import DEFAULT

    x = jnp.asarray(rng.uniform(size=(30, 2)))
    y = ((x - 0.3) ** 2).sum(-1)
    state = factorize(COV, COV.init_params(x), x, y)
    lo, hi = jnp.zeros(2), jnp.ones(2)
    key = jax.random.PRNGKey(1)
    best = jnp.min(state.y)
    raw = jax.random.uniform(key, (128, 2))
    raw_best = float(
        jnp.max(_acq_values(COV, state, raw, "log_ei", best, 2.0, DEFAULT))
    )
    xn = propose(
        COV, state, (lo, hi), key, acq="log_ei",
        n_raw=128, n_starts=4, n_steps=60,
    )
    final = float(
        _acq_values(COV, state, xn[None], "log_ei", best, 2.0, DEFAULT)[0]
    )
    assert final >= raw_best - 1e-9, (final, raw_best)


def test_thompson_sample_in_bounds(rng):
    x = jnp.asarray(rng.uniform(size=(16, 2)))
    y = (x**2).sum(-1)
    state = factorize(COV, COV.init_params(x), x, y)
    xn = thompson_sample(
        COV, state, (jnp.zeros(2), jnp.ones(2)), jax.random.PRNGKey(0),
        n_candidates=64,
    )
    assert xn.shape == (2,)
    assert 0.0 <= float(xn[0]) <= 1.0 and 0.0 <= float(xn[1]) <= 1.0


def _branin(x):
    """Branin on [-5,10]×[0,15]; global minimum 0.397887."""
    a, b, c = 1.0, 5.1 / (4 * np.pi**2), 5 / np.pi
    r, s, t = 6.0, 10.0, 1 / (8 * np.pi)
    x1, x2 = x[..., 0], x[..., 1]
    return (
        a * (x2 - b * x1**2 + c * x1 - r) ** 2
        + s * (1 - t) * np.cos(x1)
        + s
    )


def test_bayesopt_loop_minimizes_branin(rng):
    """25 BO iterations get within 0.5 of the Branin optimum —
    far better than the random-search baseline on the same budget."""
    lo = np.array([-5.0, 0.0])
    hi = np.array([10.0, 15.0])
    x0 = lo + (hi - lo) * rng.uniform(size=(8, 2))
    y0 = _branin(x0)

    bo = BayesOpt(
        COV, x0, y0, (lo, hi), refit_every=5, seed=0,
        propose_kwargs=dict(n_raw=256, n_starts=4, n_steps=40),
    )
    for _ in range(25):
        xn = bo.ask()
        bo.tell(xn, _branin(np.asarray(xn)))

    _, y_best = bo.best
    assert float(y_best) < 0.397887 + 0.5, float(y_best)

    # random-search baseline on the identical budget (8 + 25 evals)
    xr = lo + (hi - lo) * np.random.default_rng(7).uniform(size=(33, 2))
    y_rand = _branin(xr).min()
    assert float(y_best) < y_rand, (float(y_best), y_rand)


def test_bayesopt_tell_extends_incrementally(rng):
    """Between refits, tell() must extend (not refactorize): the state
    n grows and matches the data length."""
    x0 = rng.uniform(size=(6, 2))
    y0 = (x0**2).sum(-1)
    bo = BayesOpt(
        COV, x0, y0, (np.zeros(2), np.ones(2)), refit_every=100, seed=1
    )
    p_before = np.asarray(bo.params)
    for i in range(3):
        xn = bo.ask()
        bo.tell(xn, float((np.asarray(xn) ** 2).sum()))
        assert bo.state.x.shape[0] == 6 + i + 1
    # hyperparameters untouched between refits
    np.testing.assert_array_equal(p_before, np.asarray(bo.params))


def test_propose_batch_shape_bounds_and_spread(rng):
    """Kriging-believer q-batch: [q, d] in-box, and the fantasy mass
    keeps the batch spread out (no two points coincide)."""
    from pygpr_tpu.optimize.bayesopt import propose_batch

    x = jnp.asarray(rng.uniform(size=(20, 2)))
    y = ((x - 0.4) ** 2).sum(-1)
    state = factorize(COV, COV.init_params(x), x, y)
    q = 4
    xb = propose_batch(
        COV, state, (jnp.zeros(2), jnp.ones(2)), jax.random.PRNGKey(0),
        q, acq="log_ei", n_raw=128, n_starts=4, n_steps=30,
    )
    assert xb.shape == (q, 2)
    xb = np.asarray(xb)
    assert np.all(xb >= 0.0) and np.all(xb <= 1.0)
    d = np.linalg.norm(xb[:, None] - xb[None, :], axis=-1)
    d += np.eye(q)  # mask the diagonal
    assert d.min() > 1e-3, d


def test_propose_batch_thompson(rng):
    from pygpr_tpu.optimize.bayesopt import propose_batch

    x = jnp.asarray(rng.uniform(size=(16, 2)))
    y = (x**2).sum(-1)
    state = factorize(COV, COV.init_params(x), x, y)
    xb = propose_batch(
        COV, state, (jnp.zeros(2), jnp.ones(2)), jax.random.PRNGKey(3),
        3, acq="thompson", n_raw=64,
    )
    assert xb.shape == (3, 2)
    assert np.all(np.asarray(xb) >= 0.0) and np.all(np.asarray(xb) <= 1.0)


def test_bayesopt_ask_batch(rng):
    """ask(q) returns a [q, d] batch and tell() absorbs it whole."""
    x0 = rng.uniform(size=(6, 2))
    y0 = (x0**2).sum(-1)
    bo = BayesOpt(
        COV, x0, y0, (np.zeros(2), np.ones(2)), refit_every=100, seed=2,
        propose_kwargs=dict(n_raw=64, n_starts=2, n_steps=20),
    )
    xb = bo.ask(q=3)
    assert xb.shape == (3, 2)
    bo.tell(xb, (np.asarray(xb) ** 2).sum(-1))
    assert bo.state.x.shape[0] == 9
    assert bo.y.shape[0] == 9
