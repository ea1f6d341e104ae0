"""SVGP (models/svgp.py) + observation likelihoods (models/obs.py).

Oracles:
  * Gauss-Hermite variational expectations vs brute-force numerical
    integration (f64).
  * The closed-form optimal Gaussian q substituted into the
    uncollapsed bound == Titsias' collapsed SGPR bound (the defining
    identity linking the two sparse models), and the same for the
    latent predictive.
  * Minibatch estimator unbiasedness as an exact identity over a
    disjoint batch partition.
  * End-to-end classification (logit + probit) and Poisson counts.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pygpr_tpu as gp
from pygpr_tpu.models import obs, sgpr, svgp

KERN = gp.RBF()


# --------------------------------------------------------------------
# observation likelihoods
# --------------------------------------------------------------------

def _brute_expectation(g, mu, var):
    from scipy.integrate import quad

    sd = math.sqrt(var)
    val, _ = quad(
        lambda f: g(f)
        * math.exp(-0.5 * ((f - mu) / sd) ** 2)
        / (sd * math.sqrt(2 * math.pi)),
        mu - 12 * sd,
        mu + 12 * sd,
        limit=200,
    )
    return val


@pytest.mark.parametrize(
    "lik,loglik",
    [
        (
            obs.BernoulliLogit(),
            lambda y, f: -math.log1p(math.exp(-(2 * y - 1) * f))
            if abs(f) < 30
            else min((2 * y - 1) * f, 0.0),
        ),
        (
            obs.BernoulliProbit(),
            lambda y, f: float(
                jax.scipy.stats.norm.logcdf((2 * y - 1) * f)
            ),
        ),
    ],
)
def test_gauss_hermite_matches_quadrature(lik, loglik):
    lp = jnp.zeros((0,), jnp.float64)
    for y in (0.0, 1.0):
        for mu, var in [(-1.5, 0.3), (0.0, 1.0), (2.0, 4.0), (0.7, 0.01)]:
            got = float(
                lik.expected_log_lik(
                    lp,
                    jnp.asarray([y]),
                    jnp.asarray([mu]),
                    jnp.asarray([var]),
                )[0]
            )
            want = _brute_expectation(lambda f: loglik(y, f), mu, var)
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_gaussian_poisson_closed_forms():
    """Closed-form expectations vs GH quadrature of the same density."""
    mu, var = jnp.asarray([0.4, -1.0]), jnp.asarray([0.5, 2.0])
    glik = obs.GaussianLik()
    lp = jnp.asarray([math.log(0.3)])
    y = jnp.asarray([0.2, 1.5])
    want = obs.gauss_hermite(
        lambda f: -0.5 * math.log(2 * math.pi * 0.09)
        - (y[..., None] - f) ** 2 / (2 * 0.09),
        mu,
        var,
    )
    np.testing.assert_allclose(
        np.asarray(glik.expected_log_lik(lp, y, mu, var)),
        np.asarray(want),
        rtol=1e-9,
    )
    plik = obs.PoissonLik()
    yc = jnp.asarray([3.0, 0.0])
    want_p = obs.gauss_hermite(
        lambda f: yc[..., None] * f
        - jnp.exp(f)
        - jax.lax.lgamma(yc + 1.0)[..., None],
        mu,
        var,
    )
    np.testing.assert_allclose(
        np.asarray(plik.expected_log_lik(jnp.zeros(0), yc, mu, var)),
        np.asarray(want_p),
        rtol=1e-7,
    )


# --------------------------------------------------------------------
# the SGPR bridge (Gaussian likelihood)
# --------------------------------------------------------------------

def _gaussian_setup(rng, n=96, m=12, dim=1, sn=0.3):
    x = jnp.asarray(rng.uniform(0, 4, (n, dim)))
    y = jnp.sin(2.0 * x.sum(-1)) + sn * jnp.asarray(rng.normal(size=n))
    z = jnp.asarray(sgpr.init_inducing(np.asarray(x), m, seed=1))
    lik = obs.GaussianLik()
    vp = svgp.init_variational(KERN, lik, x, z)
    vp = vp._replace(
        log_theta=jnp.asarray(np.log([1.3, 0.8])),
        lik=jnp.asarray([math.log(sn)]),
    )
    return x, y, z, lik, vp


def test_optimal_q_matches_collapsed_bound(rng):
    """−ELBO at the closed-form optimal q == SGPR collapsed −ELBO."""
    x, y, z, lik, vp = _gaussian_setup(rng)
    vopt = svgp.optimal_q_gaussian(KERN, vp, x, y)
    got = float(svgp.neg_elbo(KERN, lik, vopt, x, y))
    packed = jnp.concatenate(
        [jnp.exp(vp.log_theta), jnp.exp(vp.lik)]
    )
    want = float(sgpr.neg_elbo(KERN, packed, x, y, z))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # ...and any other q is worse (bound property)
    assert float(svgp.neg_elbo(KERN, lik, vp, x, y)) > got


def test_optimal_q_predictive_matches_sgpr(rng):
    x, y, z, lik, vp = _gaussian_setup(rng)
    vopt = svgp.optimal_q_gaussian(KERN, vp, x, y)
    xs = jnp.asarray(rng.uniform(0, 4, (32, 1)))
    mu_f, var_f = svgp.predict(KERN, lik, vopt, xs, space="f")
    packed = jnp.concatenate([jnp.exp(vp.log_theta), jnp.exp(vp.lik)])
    st = sgpr.factorize(KERN, packed, x, y, z)
    mu_s, var_s = sgpr.predict(KERN, st, xs, var="diag")
    sn2 = float(jnp.exp(2.0 * vp.lik[0]))
    np.testing.assert_allclose(
        np.asarray(mu_f), np.asarray(mu_s), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(var_f) + sn2, np.asarray(var_s), rtol=1e-4
    )
    # y-space predictive adds exactly the observation noise
    mu_y, var_y = svgp.predict(KERN, lik, vopt, xs, space="y")
    np.testing.assert_allclose(
        np.asarray(var_y), np.asarray(var_f) + sn2, rtol=1e-12
    )


def test_minibatch_estimator_unbiased(rng):
    """Mean of the scaled minibatch −ELBO over a disjoint partition
    equals the full-batch −ELBO exactly."""
    x, y, z, lik, vp = _gaussian_setup(rng, n=96)
    vp = vp._replace(m_w=jnp.asarray(rng.normal(size=12)))
    full = float(svgp.neg_elbo(KERN, lik, vp, x, y))
    nb = 24
    vals = [
        float(
            svgp.neg_elbo(
                KERN, lik, vp, x[i: i + nb], y[i: i + nb],
                scale=96 / nb,
            )
        )
        for i in range(0, 96, nb)
    ]
    np.testing.assert_allclose(np.mean(vals), full, rtol=1e-12)


def test_gaussian_fit_approaches_collapsed_bound(rng):
    """Adam on (m_w, L_s) alone must close most of the gap to the
    collapsed optimum."""
    x, y, z, lik, vp = _gaussian_setup(rng, n=64, m=8)
    before = float(svgp.neg_elbo(KERN, lik, vp, x, y))
    res = svgp.fit(
        KERN, lik, x, y, z, vp0=vp, batch_size=64, n_steps=1500,
        learning_rate=0.05, opt_z=False,
    )
    # hyperparameters moved too, so compare against the collapsed bound
    # at the FITTED hyperparameters — the uncollapsed value can never
    # go below it, and a good fit should sit close above it.
    vfit = res.params
    packed = jnp.concatenate([jnp.exp(vfit.log_theta), jnp.exp(vfit.lik)])
    collapsed = float(sgpr.neg_elbo(KERN, packed, x, y, z))
    after = float(svgp.neg_elbo(KERN, lik, vfit, x, y))
    assert after < before - 5.0
    assert after >= collapsed - 1e-6
    assert after - collapsed < 2.0, (after, collapsed)


# --------------------------------------------------------------------
# end-to-end non-Gaussian fits
# --------------------------------------------------------------------

@pytest.mark.parametrize("lik", [obs.BernoulliLogit(), obs.BernoulliProbit()])
def test_classification_end_to_end(rng, lik):
    n = 256
    x = jnp.asarray(rng.uniform(0, 4, (n, 1)))
    f = 3.0 * jnp.sin(2.0 * x[:, 0])
    p_true = jax.nn.sigmoid(f)
    y = jnp.asarray(
        (rng.uniform(size=n) < np.asarray(p_true)).astype(np.float64)
    )
    z = jnp.asarray(np.linspace(0, 4, 16)[:, None])
    res = svgp.fit(
        KERN, lik, x, y, z, batch_size=128, n_steps=600,
        learning_rate=0.08, seed=3,
    )
    xs = jnp.asarray(np.linspace(0.1, 3.9, 128)[:, None])
    p_hat, _ = svgp.predict(KERN, lik, res.params, xs)
    f_s = 3.0 * np.sin(2.0 * np.asarray(xs)[:, 0])
    # points with |f| small are genuine coin flips — score only where
    # the true class is decided (|p − ½| > 0.15)
    decided = np.abs(f_s) > 0.6
    acc = float(
        np.mean(((np.asarray(p_hat) > 0.5) == (f_s > 0))[decided])
    )
    assert acc > 0.97, acc
    assert np.all((np.asarray(p_hat) >= 0) & (np.asarray(p_hat) <= 1))


def test_poisson_counts_end_to_end(rng):
    n = 256
    x = jnp.asarray(rng.uniform(0, 4, (n, 1)))
    log_rate = 1.0 + np.sin(2.0 * np.asarray(x)[:, 0])
    y = jnp.asarray(rng.poisson(np.exp(log_rate)).astype(np.float64))
    z = jnp.asarray(np.linspace(0, 4, 16)[:, None])
    res = svgp.fit(
        KERN, obs.PoissonLik(), x, y, z, batch_size=128, n_steps=600,
        learning_rate=0.08, seed=4,
    )
    xs = jnp.asarray(np.linspace(0.1, 3.9, 64)[:, None])
    mu_f, _ = svgp.predict(KERN, obs.PoissonLik(), res.params, xs, "f")
    want = 1.0 + np.sin(2.0 * np.asarray(xs)[:, 0])
    rmse = float(np.sqrt(np.mean((np.asarray(mu_f) - want) ** 2)))
    assert rmse < 0.25, rmse
    m_y, v_y = svgp.predict(KERN, obs.PoissonLik(), res.params, xs)
    assert (np.asarray(v_y) >= np.asarray(m_y) - 1e-9).all()  # overdispersed


def test_student_t_quadrature_and_robustness(rng):
    """GH expectation vs brute quadrature, and the defining property:
    a Student-t fit shrugs off outliers that wreck a Gaussian fit."""
    from scipy.stats import t as t_dist

    lik = obs.StudentTLik(nu=4.0)
    lp = jnp.asarray([math.log(0.4)])
    for y, mu, var in [(0.3, 0.0, 0.5), (-2.0, 1.0, 1.5), (5.0, 0.0, 0.2)]:
        got = float(
            lik.expected_log_lik(
                lp, jnp.asarray([y]), jnp.asarray([mu]), jnp.asarray([var])
            )[0]
        )
        want = _brute_expectation(
            lambda f: t_dist.logpdf(y, 4.0, loc=f, scale=0.4), mu, var
        )
        # heavy-tailed integrand: 32-node GH is good to ~1e-6 here
        np.testing.assert_allclose(got, want, rtol=1e-5)

    # robustness: 10% gross outliers
    n = 256
    x = jnp.asarray(rng.uniform(0, 4, (n, 1)))
    y = np.sin(2.0 * np.asarray(x)[:, 0]) + 0.1 * rng.normal(size=n)
    out = rng.permutation(n)[: n // 10]
    y[out] += rng.choice([-8.0, 8.0], size=len(out))
    y = jnp.asarray(y)
    z = jnp.asarray(np.linspace(0, 4, 16)[:, None])
    xs = jnp.asarray(np.linspace(0.1, 3.9, 64)[:, None])
    want = np.sin(2.0 * np.asarray(xs)[:, 0])

    kw = dict(batch_size=128, n_steps=600, learning_rate=0.08, seed=6)
    res_t = svgp.fit(KERN, lik, x, y, z, **kw)
    mu_t, _ = svgp.predict(KERN, lik, res_t.params, xs, "f")
    rmse_t = float(np.sqrt(np.mean((np.asarray(mu_t) - want) ** 2)))
    res_g = svgp.fit(KERN, obs.GaussianLik(), x, y, z, **kw)
    mu_g, _ = svgp.predict(KERN, obs.GaussianLik(), res_g.params, xs, "f")
    rmse_g = float(np.sqrt(np.mean((np.asarray(mu_g) - want) ** 2)))
    assert rmse_t < 0.12, rmse_t
    assert rmse_t < 0.5 * rmse_g, (rmse_t, rmse_g)


def test_svgp_fit_dp_equals_single_device(rng):
    """GSPMD data-parallel fit == single-device fit (same schedule,
    deterministic Adam) on the 8-virtual-device mesh."""
    from pygpr_tpu.parallel import make_mesh, svgp_fit_dp

    n = 128
    x = jnp.asarray(rng.uniform(0, 4, (n, 1)))
    y = jnp.sin(2.0 * x[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=n))
    z = jnp.asarray(np.linspace(0, 4, 8)[:, None])
    lik = obs.GaussianLik()
    kw = dict(batch_size=64, n_steps=60, learning_rate=0.05, seed=5)
    res_1 = svgp.fit(KERN, lik, x, y, z, **kw)
    mesh = make_mesh(n_expert=8, n_chain=1)
    res_dp = svgp_fit_dp(KERN, lik, x, y, z, mesh, **kw)
    np.testing.assert_allclose(
        np.asarray(res_dp.losses), np.asarray(res_1.losses), rtol=1e-8
    )
    for a, b in zip(res_dp.params, res_1.params):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-9
        )


def test_segmented_fit_identical_to_one_scan(rng):
    """segment_steps breaks the Adam scan into host-synced chunks with
    a bit-identical trajectory (Adam state carries across segments)."""
    x, y, z, lik, vp = _gaussian_setup(rng, n=64, m=8)
    kw = dict(batch_size=32, n_steps=40, learning_rate=0.05, seed=9)
    res_one = svgp.fit(KERN, lik, x, y, z, vp0=vp, **kw)
    res_seg = svgp.fit(KERN, lik, x, y, z, vp0=vp, segment_steps=7, **kw)
    # n_steps rounds up to 42 = 6 segments of 7; the first 40 losses
    # must match the unsegmented run exactly
    np.testing.assert_allclose(
        np.asarray(res_seg.losses[:40]), np.asarray(res_one.losses),
        rtol=1e-12,
    )


def test_sgpr_sample_predictive(rng):
    """Sparse posterior draws: moments converge to predict()'s."""
    x, y, z, lik, vp = _gaussian_setup(rng, n=96, m=16)
    packed = jnp.concatenate([jnp.exp(vp.log_theta), jnp.exp(vp.lik)])
    st = sgpr.factorize(KERN, packed, x, y, z)
    xs = jnp.asarray(rng.uniform(0, 4, (24, 1)))
    draws = sgpr.sample_predictive(
        KERN, st, xs, jax.random.PRNGKey(0), n_samples=4000
    )
    mean, var = sgpr.predict(KERN, st, xs, var="diag")
    d = np.asarray(draws)
    np.testing.assert_allclose(
        d.mean(0), np.asarray(mean), atol=4 * float(jnp.sqrt(var.max()))
        / np.sqrt(4000),
    )
    np.testing.assert_allclose(
        d.var(0), np.asarray(var), rtol=0.15
    )


def test_svgp_class_wrapper(rng):
    n = 128
    x = rng.uniform(0, 4, (n, 1))
    y = (np.sin(2 * x[:, 0]) > 0).astype(np.float64)
    model = svgp.SVGP(x, y, KERN, obs.BernoulliLogit(), m=12, seed=0)
    res = model.train(n_steps=300, learning_rate=0.1, batch_size=64)
    assert np.isfinite(np.asarray(res.losses)).all()
    p, pv = model.predict(x[:16])
    assert p.shape == (16,) and pv.shape == (16,)
    assert float(model.neg_elbo()) < float(res.losses[0])
