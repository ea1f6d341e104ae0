"""Warped-GP tests: exact identity-warp reduction to the plain GP,
bijection correctness of the tanh warp (monotone, g′ ≥ 1, Newton
inverse to f64), Jacobian-corrected NLML finite-difference gradients,
and the headline property — on skewed (log-normal) observations the
learned warp must beat the plain Gaussian GP in held-out NLPD."""

import jax
import jax.numpy as jnp
import numpy as np

import pygpr_tpu as gp
from pygpr_tpu.models import exact_gp, likelihood, warped
from pygpr_tpu.optimize.lbfgs import fit_mle


def _skewed_problem(n=100, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(0, 4, (n, 1)), axis=0))
    f = np.sin(2.0 * np.asarray(x)[:, 0])
    y = jnp.asarray(np.exp(f + 0.15 * rng.normal(size=n)))
    return x, y


def test_identity_warp_reduces_to_plain_gp():
    x, y = _skewed_problem()
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    pe = jnp.asarray([1.0, 1.0, 0.2])
    w = warped.IdentityWarp()
    v_w = float(warped.nlml_warped(cov, pe, w, jnp.zeros(0), x, y))
    v_e = float(likelihood.nlml(cov, pe, x, y))
    np.testing.assert_allclose(v_w, v_e, rtol=1e-12)

    st = warped.factorize_warped(cov, pe, w, jnp.zeros(0), x, y)
    mean, var, median = warped.predict_warped(
        cov, st, w, jnp.zeros(0), x
    )
    m_e, v_e2 = exact_gp.predict(cov, exact_gp.factorize(cov, pe, x, y),
                                 x, "diag")
    np.testing.assert_allclose(np.asarray(mean), np.asarray(m_e),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(median), np.asarray(m_e),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(var), np.asarray(v_e2),
                               rtol=1e-6)


def test_tanh_warp_bijection():
    rng = np.random.default_rng(1)
    w = warped.TanhWarp(3)
    wp = jnp.asarray(rng.normal(size=9) * 0.5)
    y = jnp.asarray(np.linspace(-3, 3, 200))
    z = w.forward(wp, y)
    assert np.all(np.diff(np.asarray(z)) > 0)          # monotone
    assert float(w.deriv(wp, y).min()) >= 1.0          # g' ≥ 1
    np.testing.assert_allclose(
        np.asarray(w.inverse(wp, z)), np.asarray(y), atol=1e-12
    )
    # deriv matches AD of forward
    d_ad = jax.vmap(jax.grad(lambda yy: w.forward(wp, yy)))(y)
    np.testing.assert_allclose(
        np.asarray(w.deriv(wp, y)), np.asarray(d_ad), rtol=1e-12
    )


def test_log_warp_is_lognormal():
    """LogWarp NLML == plain NLML of log y minus Σ log y (the exact
    log-normal change of variables)."""
    x, y = _skewed_problem(n=50, seed=2)
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    pe = jnp.asarray([1.0, 1.0, 0.2])
    w = warped.LogWarp()
    v_w = float(warped.nlml_warped(cov, pe, w, jnp.zeros(0), x, y))
    v_manual = float(
        likelihood.nlml(cov, pe, x, jnp.log(y))
    ) + float(jnp.sum(jnp.log(y)))
    np.testing.assert_allclose(v_w, v_manual, rtol=1e-12)


def test_warped_nlml_fd_gradients():
    x, y = _skewed_problem(n=40, seed=3)
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    w = warped.TanhWarp(2)
    nk = 3

    def obj(u):
        return warped.nlml_warped(
            cov, jnp.exp(u[:nk]), w, u[nk:], x, y
        )

    u0 = jnp.concatenate([
        jnp.log(jnp.asarray([1.0, 1.0, 0.3])),
        w.init_params(y) + 0.1,
    ])
    g = jax.grad(obj)(u0)
    eps = 1e-6
    for i in range(u0.shape[0]):
        e = jnp.zeros_like(u0).at[i].set(eps)
        fd = (float(obj(u0 + e)) - float(obj(u0 - e))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd, rtol=5e-5,
                                   atol=1e-7)


def test_warped_beats_plain_on_lognormal_data():
    """The module's reason to exist: on log-normal targets the learned
    tanh warp must deliver better held-out NLPD (and no worse NLML)
    than the plain Gaussian GP."""
    x, y = _skewed_problem()
    rng = np.random.default_rng(10)
    xs = jnp.asarray(np.sort(rng.uniform(0.1, 3.9, (60, 1)), axis=0))
    ys = jnp.asarray(np.exp(
        np.sin(2.0 * np.asarray(xs)[:, 0]) + 0.15 * rng.normal(size=60)
    ))
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))

    warp = warped.TanhWarp(3)
    res_w = warped.fit_warped(cov, warp, x, y, max_iter=150)
    nlpd_w = float(warped.nlpd_warped(
        cov, res_w.state, warp, res_w.warp_params, xs, ys
    ))

    res_p = fit_mle(cov, cov.init_params(x), x, y, max_iter=150)
    st_p = exact_gp.factorize(cov, res_p.params, x, y)
    nlpd_p = float(warped.nlpd_warped(
        cov, st_p, warped.IdentityWarp(), jnp.zeros(0), xs, ys
    ))
    assert nlpd_w < nlpd_p, (nlpd_w, nlpd_p)

    # and the point predictions stay sane
    mean, var, median = warped.predict_warped(
        cov, res_w.state, warp, res_w.warp_params, xs
    )
    assert np.all(np.asarray(var) >= 0)
    rmse = float(np.sqrt(np.mean(
        (np.asarray(median) - np.exp(np.sin(2 * np.asarray(xs)[:, 0])))
        ** 2
    )))
    assert rmse < 0.3, rmse


def test_warpedgp_wrapper():
    x, y = _skewed_problem(n=60, seed=5)
    model = warped.WarpedGP(x, y, gp.Sum((gp.RBF(), gp.WhiteNoise())))
    res = model.train(max_iter=100)
    mean, var, median = model.predict(x)
    assert np.isfinite(np.asarray(mean)).all()
    assert np.all(np.asarray(var) >= 0)
    assert np.isfinite(float(res.nlml))
