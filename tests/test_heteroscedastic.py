"""Most-likely heteroscedastic GP tests: two-regime noise-field
recovery (levels within loose bands, ratio clearly resolved), held-out
NLPD beating the homoscedastic exact GP on heteroscedastic data, and
the sanity reduction — on constant-noise data the learned field is
flat and predictions match the plain GP."""

import jax.numpy as jnp
import numpy as np

import pygpr_tpu as gp
from pygpr_tpu.models import exact_gp, heteroscedastic as hgp
from pygpr_tpu.optimize.lbfgs import fit_mle


def _two_regime(n=200, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, 4, (n, 1)), axis=0)
    sig = np.where(x[:, 0] < 2.0, 0.05, 0.4)
    y = np.sin(2 * x[:, 0]) + sig * rng.normal(size=n)
    return x, y, rng


def test_two_regime_noise_recovery_and_nlpd():
    x, y, rng = _two_regime()
    state = hgp.fit_hgp(x, jnp.asarray(y), n_rounds=3, damping=1.0)

    nv = np.asarray(state.noise_train)
    lo = float(np.sqrt(np.median(nv[x[:, 0] < 1.8])))
    hi = float(np.sqrt(np.median(nv[x[:, 0] > 2.2])))
    # loose bands: the χ²₁-corrected log-residual estimator resolves
    # the field to within ~2× of truth (0.05 / 0.4)
    assert 0.02 < lo < 0.2, lo
    assert 0.2 < hi < 0.8, hi
    assert hi / lo > 3.0, (lo, hi)

    xs = np.sort(rng.uniform(0.1, 3.9, (100, 1)), axis=0)
    sig_s = np.where(xs[:, 0] < 2.0, 0.05, 0.4)
    ys = np.sin(2 * xs[:, 0]) + sig_s * rng.normal(size=100)

    cov_noise = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    mu_h, var_h = hgp.predict_hgp(
        state, gp.RBF(), cov_noise, jnp.asarray(xs)
    )
    nlpd_h = float(np.mean(
        0.5 * np.log(2 * np.pi * np.asarray(var_h))
        + (ys - np.asarray(mu_h)) ** 2 / (2 * np.asarray(var_h))
    ))

    cov0 = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    res0 = fit_mle(cov0, cov0.init_params(jnp.asarray(x)),
                   jnp.asarray(x), jnp.asarray(y), max_iter=100)
    st0 = exact_gp.factorize(cov0, res0.params, jnp.asarray(x),
                             jnp.asarray(y))
    mu0, var0 = exact_gp.predict(cov0, st0, jnp.asarray(xs), "diag")
    nlpd_0 = float(np.mean(
        0.5 * np.log(2 * np.pi * np.asarray(var0))
        + (ys - np.asarray(mu0)) ** 2 / (2 * np.asarray(var0))
    ))
    assert nlpd_h < nlpd_0, (nlpd_h, nlpd_0)


def test_constant_noise_reduces_to_homoscedastic():
    rng = np.random.default_rng(3)
    n = 150
    x = np.sort(rng.uniform(0, 4, (n, 1)), axis=0)
    y = np.sin(2 * x[:, 0]) + 0.15 * rng.normal(size=n)
    state = hgp.fit_hgp(x, jnp.asarray(y), n_rounds=2, damping=1.0)

    nv = np.asarray(state.noise_train)
    # flat field near the true level (χ²-corrected, loose 2× band)
    assert 0.07 < float(np.sqrt(np.median(nv))) < 0.3
    assert float(np.sqrt(nv.max()) / np.sqrt(nv.min())) < 4.0

    # predictions match a plain fitted GP closely
    xs = np.sort(rng.uniform(0.2, 3.8, (60, 1)), axis=0)
    cov_noise = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    mu_h, _ = hgp.predict_hgp(state, gp.RBF(), cov_noise,
                              jnp.asarray(xs))
    cov0 = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    res0 = fit_mle(cov0, cov0.init_params(jnp.asarray(x)),
                   jnp.asarray(x), jnp.asarray(y), max_iter=100)
    st0 = exact_gp.factorize(cov0, res0.params, jnp.asarray(x),
                             jnp.asarray(y))
    mu0, _ = exact_gp.predict(cov0, st0, jnp.asarray(xs), "diag")
    np.testing.assert_allclose(
        np.asarray(mu_h), np.asarray(mu0), atol=0.08
    )


def test_wrapper_api():
    x, y, _ = _two_regime(n=120, seed=5)
    model = hgp.HeteroscedasticGP(x, y)
    model.train(n_rounds=2)
    mean, var = model.predict(x)
    assert np.isfinite(np.asarray(mean)).all()
    assert np.all(np.asarray(var) > 0)
    noise = np.asarray(model.noise_at(x))
    assert noise.shape == (120,) and (noise > 0).all()
    # latent variance is below the observation variance
    _, var_lat = model.predict(x, observation=False)
    assert np.all(np.asarray(var_lat) <= np.asarray(var) + 1e-12)