"""Deep kernel learning (models/dkl.py).

Oracles: an identity linear layer reduces DeepKernel to the bare base
kernel; fast == AD == FD gradients through the MLP; batched == stacked;
and the defining end-to-end property — on sharp/non-stationary data the
learned warp beats a plain stationary RBF in NLML and held-out RMSE.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import pygpr_tpu as gp
from pygpr_tpu.models import exact_gp
from pygpr_tpu.models.dkl import DeepKernel, fit_dkl
from pygpr_tpu.models.likelihood import nlml, nlml_value_and_grad
from pygpr_tpu.optimize.lbfgs import fit_mle


def test_identity_layer_reduces_to_base(rng):
    """One linear layer with W=I, b=0 == base kernel on raw x."""
    d = 2
    kern = DeepKernel(gp.RBF(), widths=(d,))
    x = jnp.asarray(rng.uniform(0, 3, (15, d)))
    xq = jnp.asarray(rng.uniform(0, 3, (6, d)))
    pb = jnp.asarray(np.r_[1.2, 0.7, 0.9])
    p = jnp.concatenate([jnp.eye(d).ravel(), jnp.zeros(d), pb])
    assert p.shape[0] == kern.n_params(d)
    np.testing.assert_allclose(
        np.asarray(kern.matrix(p, x)),
        np.asarray(gp.RBF().matrix(pb, x)),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(kern.matrix(p, x, xq)),
        np.asarray(gp.RBF().matrix(pb, x, xq)),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(kern.diag(p, x)),
        np.asarray(gp.RBF().diag(pb, x)),
        rtol=1e-12,
    )


def test_gradients_fast_ad_fd(rng):
    """Fast (solve-free VJP) == AD == finite differences through the
    MLP weights and the base hyperparameters jointly."""
    kern = DeepKernel(gp.Sum((gp.RBF(), gp.WhiteNoise())), widths=(4, 2),
                      seed=1)
    x = jnp.asarray(rng.uniform(0, 3, (18, 2)))
    y = jnp.asarray(np.sin(2 * np.asarray(x).sum(-1)))
    p = kern.init_params(x)
    p = p.at[-1].set(0.3)  # noise off the hostile 1e-4 init

    cfg_fast = dataclasses.replace(gp.DEFAULT, grad_mode="fast")
    cfg_ad = dataclasses.replace(gp.DEFAULT, grad_mode="ad")
    v1, g1 = nlml_value_and_grad(kern, p, x, y, cfg_fast)
    v2, g2 = nlml_value_and_grad(kern, p, x, y, cfg_ad)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-6, atol=1e-9)

    eps = 1e-6
    idx = list(range(0, p.shape[0], max(1, p.shape[0] // 8)))
    fd = np.array(
        [
            (
                float(nlml(kern, p.at[i].add(eps), x, y))
                - float(nlml(kern, p.at[i].add(-eps), x, y))
            )
            / (2 * eps)
            for i in idx
        ]
    )
    np.testing.assert_allclose(np.asarray(g1)[idx], fd, rtol=1e-4,
                               atol=1e-7)


def test_batched_equals_stacked(rng):
    kern = DeepKernel(gp.RBF(), widths=(3,), seed=2)
    nc, n, d = 3, 12, 2
    xb = jnp.asarray(rng.uniform(0, 2, (nc, n, d)))
    yb = jnp.asarray(rng.normal(size=(nc, n)))
    p = kern.init_params(xb[0])
    batched = np.asarray(nlml(kern, p, xb, yb))
    stacked = np.array(
        [float(nlml(kern, p, xb[i], yb[i])) for i in range(nc)]
    )
    np.testing.assert_allclose(batched, stacked, rtol=1e-12)


def test_dkl_beats_plain_rbf_on_step_data(rng):
    """Non-stationary target (step × slope): the learned warp reaches a
    lower NLML than a fitted stationary RBF and a better held-out RMSE."""
    n = 96
    x = np.sort(rng.uniform(-2, 2, n))[:, None]

    def f(t):
        return np.where(t < 0, np.sin(2 * t), np.sign(np.sin(4 * t)))

    y = jnp.asarray(f(x[:, 0]) + 0.05 * rng.normal(size=n))
    xj = jnp.asarray(x)

    base = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    p0 = base.init_params(xj).at[-1].set(0.1)
    res_rbf = fit_mle(base, p0, xj, y)
    nlml_rbf = float(nlml(base, res_rbf.params, xj, y))

    kern = DeepKernel(base, widths=(16, 1), seed=3)
    # noise off the hostile 1e-4 reference init (house convention)
    p0 = kern.init_params(xj).at[-1].set(0.1)
    fitres = fit_dkl(kern, xj, y, params0=p0, n_steps=400,
                     learning_rate=3e-2)
    nlml_dkl = float(nlml(kern, fitres.params, xj, y))
    assert np.isfinite(fitres.nlml).all()
    assert nlml_dkl < nlml_rbf, (nlml_dkl, nlml_rbf)

    xq = np.linspace(-1.9, 1.9, 80)[:, None]
    st_d = exact_gp.factorize(kern, fitres.params, xj, y)
    m_d, v_d = exact_gp.predict(kern, st_d, jnp.asarray(xq), var="diag")
    st_r = exact_gp.factorize(base, res_rbf.params, xj, y)
    m_r, _ = exact_gp.predict(base, st_r, jnp.asarray(xq), var="diag")
    rmse_d = float(np.sqrt(np.mean((np.asarray(m_d) - f(xq[:, 0])) ** 2)))
    rmse_r = float(np.sqrt(np.mean((np.asarray(m_r) - f(xq[:, 0])) ** 2)))
    assert rmse_d < rmse_r, (rmse_d, rmse_r)
    assert (np.asarray(v_d) > 0).all()
