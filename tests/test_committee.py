"""PoE / gPoE / BCM / rBCM committee family (models/committee.py).

The reference only has grBCM (gr_bcm.py:116-149); these are the
Deisenroth & Ng (ICML 2015) baselines its paper compares against.
Oracles: closed-form identities for identical experts, prior recovery
far from the data (the BCM-family property), masked == removed, and
sharded == batched on the 8-virtual-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pygpr_tpu as gp
from pygpr_tpu.models import committee, exact_gp

COV = gp.Sum((gp.RBF(), gp.WhiteNoise()))


def _make_experts(rng, nc=4, ns=32, dim=2, identical=False, noise=0.1):
    if identical:
        x1 = rng.uniform(0, 4, (ns, dim))
        xl = np.broadcast_to(x1, (nc, ns, dim)).copy()
    else:
        xl = rng.uniform(0, 4, (nc, ns, dim))
    yl = np.sin(2.0 * xl.sum(-1)) + noise * rng.normal(size=(nc, ns))
    if identical:
        yl = np.broadcast_to(yl[0], (nc, ns)).copy()
    return jnp.asarray(xl), jnp.asarray(yl)


def _state(xl, yl, params=None):
    p = (
        jnp.asarray(params)
        if params is not None
        else jnp.array([1.0, 0.7, 0.7, 0.3], xl.dtype)
    )
    return exact_gp.factorize(COV, p, xl, yl), p


def test_gpoe_identical_experts_recovers_exact(rng):
    """gPoE with Σβ = 1 and identical experts == the single exact GP."""
    xl, yl = _make_experts(rng, identical=True)
    state_l, p = _state(xl, yl)
    xs = jnp.asarray(rng.uniform(0, 4, (16, 2)))
    res = committee.predict_committee(COV, state_l, xs, "gpoe")
    s1 = exact_gp.factorize(COV, p, xl[0], yl[0])
    m1, v1 = exact_gp.predict(COV, s1, xs, "diag")
    np.testing.assert_allclose(np.asarray(res.mean), np.asarray(m1), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(res.covar), np.asarray(v1), rtol=1e-9)


def test_poe_identical_experts_nc_times_precision(rng):
    """PoE: same mean, but precision = nc × the single expert's (the
    known overconfidence that motivates the BCM corrections)."""
    xl, yl = _make_experts(rng, identical=True)
    state_l, p = _state(xl, yl)
    xs = jnp.asarray(rng.uniform(0, 4, (16, 2)))
    res = committee.predict_committee(COV, state_l, xs, "poe")
    s1 = exact_gp.factorize(COV, p, xl[0], yl[0])
    m1, v1 = exact_gp.predict(COV, s1, xs, "diag")
    np.testing.assert_allclose(np.asarray(res.mean), np.asarray(m1), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(res.covar), np.asarray(v1) / xl.shape[0], rtol=1e-9
    )


@pytest.mark.parametrize("method", ["bcm", "rbcm"])
def test_bcm_family_recovers_prior_far_from_data(rng, method):
    """Far from every expert's data the BCM/rBCM posterior must fall
    back to the prior (variance AND zero mean) — the property PoE/gPoE
    lack (PoE variance → prior/nc)."""
    xl, yl = _make_experts(rng)
    state_l, p = _state(xl, yl)
    xs_far = jnp.asarray(rng.uniform(100.0, 104.0, (8, 2)))
    res = committee.predict_committee(COV, state_l, xs_far, method)
    pv = np.asarray(COV.diag(p, xs_far))
    np.testing.assert_allclose(np.asarray(res.covar), pv, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(res.mean), 0.0, atol=1e-4)
    # contrast: PoE is nc× overconfident out there
    res_poe = committee.predict_committee(COV, state_l, xs_far, "poe")
    np.testing.assert_allclose(
        np.asarray(res_poe.covar), pv / xl.shape[0], rtol=1e-4
    )


@pytest.mark.parametrize("method", ["poe", "gpoe", "bcm", "rbcm"])
def test_committee_regresses(rng, method):
    """Every method must actually regress partitioned smooth data."""
    nc, ns, dim = 8, 64, 1
    # spatial partition: expert i owns [i/2, (i+1)/2)
    xl = np.stack(
        [rng.uniform(0.5 * i, 0.5 * (i + 1), (ns, dim)) for i in range(nc)]
    )
    yl = np.sin(2.0 * xl.sum(-1)) + 0.05 * rng.normal(size=(nc, ns))
    xl, yl = jnp.asarray(xl), jnp.asarray(yl)
    fit = committee.fit_committee(COV, xl, yl, max_iter=60)
    state_l = exact_gp.factorize(COV, fit.params, xl, yl)
    xs = jnp.asarray(rng.uniform(0, 4, (128, dim)))
    res = committee.predict_committee(COV, state_l, xs, method)
    f_true = np.sin(2.0 * np.asarray(xs).sum(-1))
    rmse = float(np.sqrt(np.mean((np.asarray(res.mean) - f_true) ** 2)))
    assert rmse < 0.1, f"{method} rmse {rmse}"
    assert (np.asarray(res.covar) > 0).all()
    if method in ("gpoe", "bcm", "rbcm"):
        # calibrated-family NLPD sanity (PoE is knowingly overconfident)
        v = np.asarray(res.covar)
        nlpd = float(
            np.mean(
                0.5 * np.log(2 * np.pi * v)
                + (np.asarray(res.mean) - f_true) ** 2 / (2 * v)
            )
        )
        assert nlpd < 1.0, f"{method} nlpd {nlpd}"


@pytest.mark.parametrize("method", ["poe", "gpoe", "bcm", "rbcm"])
def test_masked_expert_equals_removed(rng, method):
    xl, yl = _make_experts(rng, nc=5)
    state_l, p = _state(xl, yl)
    xs = jnp.asarray(rng.uniform(0, 4, (16, 2)))
    mask = jnp.asarray([True, True, False, True, True])
    res_m = committee.predict_committee(COV, state_l, xs, method, mask=mask)
    keep = np.asarray(mask)
    state_k = exact_gp.factorize(COV, p, xl[keep], yl[keep])
    res_k = committee.predict_committee(COV, state_k, xs, method)
    np.testing.assert_allclose(
        np.asarray(res_m.mean), np.asarray(res_k.mean), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(res_m.covar), np.asarray(res_k.covar), rtol=1e-8
    )


def test_method_validation(rng):
    xl, yl = _make_experts(rng)
    state_l, _ = _state(xl, yl)
    xs = jnp.asarray(rng.uniform(0, 4, (4, 2)))
    with pytest.raises(ValueError):
        committee.predict_committee(COV, state_l, xs, "grbcm")


def test_fit_committee_shared_improves(rng):
    xl, yl = _make_experts(rng, nc=4, ns=48, dim=1)
    from pygpr_tpu.models.likelihood import nlml

    p0 = jnp.ones((COV.n_params(1),), xl.dtype)
    before = float(jnp.sum(nlml(COV, p0, xl, yl)))
    fit = committee.fit_committee(COV, xl, yl, max_iter=60)
    after = float(jnp.sum(nlml(COV, fit.params, xl, yl)))
    assert after < before - 1.0
    # independent mode returns per-expert rows
    fit_i = committee.fit_committee(COV, xl, yl, shared=False, max_iter=40)
    assert fit_i.params.shape == (4, COV.n_params(1))


@pytest.mark.parametrize("method", ["poe", "gpoe", "bcm", "rbcm"])
def test_sharded_equals_batched(rng, method):
    """committee_predict_sharded on the 8-device mesh == single-host."""
    from pygpr_tpu.parallel import committee_predict_sharded, make_mesh

    nc, ns, dim = 8, 24, 2
    xl = jnp.asarray(rng.uniform(0, 4, (nc, ns, dim)))
    yl = jnp.sin(xl.sum(-1)) + 0.1 * jnp.asarray(rng.normal(size=(nc, ns)))
    p = jnp.array([1.0, 0.7, 0.7, 0.3], xl.dtype)
    xs = jnp.asarray(rng.uniform(0, 4, (16, dim)))
    mask = jnp.asarray([True] * 6 + [False, True])
    mesh = make_mesh(n_expert=8, n_chain=1)

    mean_s, var_s = committee_predict_sharded(
        COV, p, xl, yl, xs, mesh, method, mask=mask
    )
    state_l = exact_gp.factorize(COV, p, xl, yl)
    res = committee.predict_committee(COV, state_l, xs, method, mask=mask)
    np.testing.assert_allclose(
        np.asarray(mean_s), np.asarray(res.mean), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(var_s), np.asarray(res.covar), rtol=1e-10
    )
