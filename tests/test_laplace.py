"""Laplace-approximation GP (models/laplace.py) — R&W ch. 3.

Oracles:
  * Gaussian likelihood ⇒ the approximation is EXACT: the Laplace
    evidence/posterior must reproduce the closed-form exact-GP NLML and
    predictive moments (kernel-layer noise == likelihood-layer noise).
  * Newton stationarity at the mode: ∇log p(y|f̂) = K⁻¹f̂.
  * AD hyperparameter gradient of the evidence vs central finite
    differences (f64).
  * End-to-end classification / count regression quality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pygpr_tpu as gp
from pygpr_tpu.models import exact_gp, laplace, likelihood
from pygpr_tpu.models.obs import (
    BernoulliLogit,
    BernoulliProbit,
    GaussianLik,
    PoissonLik,
    StudentTLik,
)


def _xy(rng, n=60, dim=1):
    x = rng.uniform(0.0, 4.0, (n, dim))
    f = np.sin(2.0 * x.sum(-1))
    return jnp.asarray(x), f


def test_gaussian_reduction_exact(rng):
    """For a Gaussian likelihood, Laplace == exact GP (evidence and
    latent-predictive moments)."""
    x, f = _xy(rng)
    sig_n = 0.3
    y = jnp.asarray(f + sig_n * rng.normal(size=f.shape))
    kern = gp.RBF()
    p = jnp.asarray([1.2, 0.8])
    lp = jnp.asarray([np.log(sig_n)])

    state = laplace.posterior_mode(kern, p, GaussianLik(), lp, x, y)
    # exact closed form through the kernel-layer noise parameterization
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    p_full = jnp.asarray([1.2, 0.8, sig_n])
    nlml_exact = likelihood.nlml(cov, p_full, x, y)
    np.testing.assert_allclose(
        float(state.nlml), float(nlml_exact), rtol=1e-4
    )

    xs = jnp.asarray(np.linspace(0.0, 4.0, 33)[:, None])
    mu_l, var_l = laplace.predict(kern, state, xs, space="latent")
    st_exact = exact_gp.factorize(cov, p_full, x, y)
    mu_e, var_e = exact_gp.predict(cov, st_exact, xs, var="diag")
    np.testing.assert_allclose(
        np.asarray(mu_l), np.asarray(mu_e), atol=1e-5
    )
    # exact-GP diag includes the WhiteNoise k** term; latent + sn² is
    # the comparable quantity
    np.testing.assert_allclose(
        np.asarray(var_l) + sig_n**2, np.asarray(var_e), atol=1e-5
    )


@pytest.mark.parametrize("lik", [BernoulliLogit(), BernoulliProbit()])
def test_mode_stationarity(rng, lik):
    """At the Newton fixed point, ∇log p(y|f̂) == K⁻¹f̂ (= a)."""
    x, f = _xy(rng, n=50)
    y = jnp.asarray((f > 0).astype(np.float64))
    p = jnp.asarray([1.0, 1.0])
    lp = lik.init_params(jnp.float64)
    state = laplace.posterior_mode(kern=gp.RBF(), params=p, lik=lik,
                                   lik_params=lp, x=x, y=y)
    resid = np.asarray(state.grad_ll - state.a)
    assert np.max(np.abs(resid)) < 1e-8
    assert np.isfinite(float(state.nlml))


def test_evidence_gradient_fd(rng):
    """AD-through-Newton gradient of the evidence vs central FD."""
    x, f = _xy(rng, n=30)
    y = jnp.asarray((f > 0).astype(np.float64))
    kern = gp.RBF()
    lik = BernoulliProbit()
    u0 = np.log(np.asarray([1.3, 0.7]))

    def obj(u):
        return laplace.nlml(
            kern, jnp.exp(jnp.asarray(u)), lik,
            jnp.zeros((0,)), x, y, n_newton=25,
        )

    g_ad = np.asarray(jax.grad(lambda u: obj(u))(jnp.asarray(u0)))
    eps = 1e-6
    for j in range(2):
        e = np.zeros(2)
        e[j] = eps
        fd = (float(obj(u0 + e)) - float(obj(u0 - e))) / (2 * eps)
        np.testing.assert_allclose(g_ad[j], fd, rtol=1e-5, atol=1e-8)


def test_classification_end_to_end(rng):
    """LaplaceGP classifies a smooth 1-D boundary: calibrated probs."""
    x, f = _xy(rng, n=100)
    y = jnp.asarray((f > 0).astype(np.float64))
    model = gp.LaplaceGP(x, y, gp.RBF(), BernoulliLogit())
    res = model.train(max_iter=60)
    assert np.isfinite(float(res.nlml))

    xs = jnp.asarray(np.linspace(0.1, 3.9, 101)[:, None])
    prob, pvar = model.predict(xs)
    prob = np.asarray(prob)
    truth = (np.sin(2.0 * np.asarray(xs)[:, 0]) > 0).astype(float)
    assert ((prob >= 0.0) & (prob <= 1.0)).all()
    acc = np.mean((prob > 0.5) == (truth > 0.5))
    assert acc >= 0.93, f"accuracy {acc}"
    # training must improve the evidence over the init hyperparameters
    nlml0 = laplace.nlml(
        gp.RBF(), gp.RBF().init_params(x), BernoulliLogit(),
        jnp.zeros((0,)), x, y,
    )
    assert float(res.nlml) <= float(nlml0) + 1e-9


def test_poisson_counts(rng):
    """Count regression through the log link recovers the rate."""
    x, f = _xy(rng, n=120)
    rate = np.exp(1.0 + np.asarray(f))
    y = jnp.asarray(rng.poisson(rate).astype(np.float64))
    res = laplace.fit(gp.RBF(), PoissonLik(), x, y, max_iter=50)
    xs = jnp.asarray(np.linspace(0.1, 3.9, 64)[:, None])
    m, v = laplace.predict(gp.RBF(), res.state, xs, PoissonLik())
    m = np.asarray(m)
    assert (m > 0).all() and np.isfinite(np.asarray(v)).all()
    true_rate = np.exp(1.0 + np.sin(2.0 * np.asarray(xs)[:, 0]))
    rel = np.sqrt(np.mean((m - true_rate) ** 2)) / true_rate.mean()
    base = np.sqrt(np.mean((true_rate.mean() - true_rate) ** 2))
    assert rel < base / true_rate.mean(), "no better than constant rate"


def test_student_t_clamped_newton(rng):
    """Non-log-concave Student-t: the W-clamp keeps Newton finite and
    the mode shrugs off a gross outlier (robustness property)."""
    x, f = _xy(rng, n=60)
    y_clean = f + 0.1 * rng.normal(size=f.shape)
    y = np.array(y_clean)
    y[7] += 25.0  # gross outlier
    lik = StudentTLik(nu=4.0)
    lp = jnp.asarray([np.log(0.1)])
    p = jnp.asarray([1.0, 1.0])
    state = laplace.posterior_mode(
        gp.RBF(), p, lik, lp, x, jnp.asarray(y), n_newton=40
    )
    assert np.isfinite(float(state.nlml))
    f_hat = np.asarray(state.f_hat)
    # the latent mode at the outlier stays near the smooth function,
    # not the corrupted observation
    assert abs(f_hat[7] - f[7]) < 1.0
    assert np.sqrt(np.mean((f_hat - f) ** 2)) < 0.2
