"""grBCM tests: the reference interpolation oracle through the full
committee path (``PyGPR/tests/test_grbcm.py``), aggregation math
invariants, expert masking, and the working train loop."""

from itertools import product

import jax.numpy as jnp
import numpy as np
import pytest

import pygpr_tpu as gp
from pygpr_tpu.models import grbcm

DIMS = (2, 3)
NS = (10, 50)
NCS = (2, 5)
NGS = (10, 50)


def _cov():
    return gp.Sum((gp.RBF(), gp.WhiteNoise()))


@pytest.mark.parametrize(
    "ng,nc,n,dim", list(product(NGS, NCS, NS, DIMS))
)
def test_interpolate(ng, nc, n, dim, rng):
    """Reference end-to-end oracle (``tests/test_grbcm.py:19-37``):
    grBCM reproduces one expert's training targets to atol 1e-4."""
    xl = jnp.asarray(rng.uniform(size=(nc, n, dim)))
    xg = jnp.asarray(rng.uniform(size=(ng, dim)))
    yl = jnp.sin(xl.sum(-1))
    yg = jnp.sin(xg.sum(-1))

    model = grbcm.GRBCM(xl, yl, xg, yg, _cov())
    idx = int(rng.integers(nc))
    xs = xl[idx]
    ys = jnp.sin(xs.sum(-1))

    ys_gpr, var_s = model.predict(xs, var="diag")
    np.testing.assert_allclose(np.asarray(ys_gpr), np.asarray(ys), atol=1e-4)
    assert np.all(np.asarray(var_s) < 1e6)
    # observability parity (gr_bcm.py:135-136)
    assert model.beta.shape == (nc + 1, n)
    assert model.prec.shape == (nc + 1, n)


def test_beta_weights_invariants(rng):
    """β₁ = 1 (gr_bcm.py:132); β₀ = 1 − Σᵢ≥₁ βᵢ (gr_bcm.py:133)."""
    nc, npts = 4, 7
    var_g = jnp.asarray(rng.uniform(0.5, 1.5, size=npts))
    var_l = jnp.asarray(rng.uniform(0.1, 1.0, size=(nc, npts)))
    ys_g = jnp.asarray(rng.normal(size=npts))
    ys_l = jnp.asarray(rng.normal(size=(nc, npts)))
    res = grbcm.aggregate(ys_g, var_g, ys_l, var_l)
    np.testing.assert_allclose(np.asarray(res.beta[1]), 1.0)
    np.testing.assert_allclose(
        np.asarray(res.beta[0]),
        1.0 - np.asarray(res.beta[1:]).sum(0),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(res.prec), 1.0 / np.concatenate(
            [np.asarray(var_g)[None], np.asarray(var_l)], 0
        ),
    )
    # aggregated moments match the closed form
    beta = np.asarray(res.beta)
    prec = np.asarray(res.prec)
    mu = np.concatenate([np.asarray(ys_g)[None], np.asarray(ys_l)], 0)
    cv = 1.0 / (beta * prec).sum(0)
    np.testing.assert_allclose(np.asarray(res.covar), cv, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(res.mean), cv * (mu * beta * prec).sum(0), rtol=1e-12
    )


def test_masked_expert_equals_removed(rng):
    """Masking expert i (≥2nd) equals aggregating without it —
    the failure-isolation property (SURVEY.md §5.3)."""
    nc, npts = 4, 6
    var_g = jnp.asarray(rng.uniform(0.5, 1.5, size=npts))
    var_l = jnp.asarray(rng.uniform(0.1, 1.0, size=(nc, npts)))
    ys_g = jnp.asarray(rng.normal(size=npts))
    ys_l = jnp.asarray(rng.normal(size=(nc, npts)))

    mask = jnp.asarray([True, True, False, True])
    res_masked = grbcm.aggregate(ys_g, var_g, ys_l, var_l, mask=mask)
    res_removed = grbcm.aggregate(
        ys_g, var_g, ys_l[jnp.asarray([0, 1, 3])],
        var_l[jnp.asarray([0, 1, 3])],
    )
    np.testing.assert_allclose(
        np.asarray(res_masked.mean), np.asarray(res_removed.mean), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(res_masked.covar), np.asarray(res_removed.covar), rtol=1e-12
    )


def test_full_covar_aggregation(rng):
    """Full-covariance path: symmetric PSD output; diagonal close to
    the diag-path variance when experts agree."""
    nc, n, dim, ng, npts = 3, 30, 2, 15, 8
    xl = jnp.asarray(rng.uniform(size=(nc, n, dim)))
    xg = jnp.asarray(rng.uniform(size=(ng, dim)))
    yl = jnp.sin(xl.sum(-1))
    yg = jnp.sin(xg.sum(-1))
    model = grbcm.GRBCM(xl, yl, xg, yg, _cov())
    xs = jnp.asarray(rng.uniform(size=(npts, dim)))
    mean_f, cov_f = model.predict(xs, var="full")
    cov_f = np.asarray(cov_f)
    np.testing.assert_allclose(cov_f, cov_f.T, atol=1e-9)
    eig = np.linalg.eigvalsh(cov_f)
    assert np.all(eig > -1e-9)
    mean_d, _ = model.predict(xs, var="diag")
    np.testing.assert_allclose(
        np.asarray(mean_f), np.asarray(mean_d), rtol=1e-10
    )


def test_train_improves_experts(rng):
    """The working train loop (intended gr_bcm.py:52-97 semantics):
    per-expert and global NLML drop, prediction improves."""
    nc, n, dim, ng = 3, 40, 2, 20
    xl = jnp.asarray(rng.uniform(size=(nc, n, dim)))
    xg = jnp.asarray(rng.uniform(size=(ng, dim)))
    noise = 0.05
    yl = jnp.sin(2 * xl.sum(-1)) + noise * jnp.asarray(
        rng.normal(size=(nc, n))
    )
    yg = jnp.sin(2 * xg.sum(-1)) + noise * jnp.asarray(rng.normal(size=ng))

    model = grbcm.GRBCM(xl, yl, xg, yg, _cov())
    from pygpr_tpu.models.likelihood import nlml

    v0_l = np.asarray(
        nlml(model.cov, model.gpl.params, model.gpl.x, model.gpl.y)
    )
    info = model.train(max_iter=100)
    v1_l = np.asarray(info.nlml_l)
    assert np.all(v1_l < v0_l)
    assert bool(np.all(np.asarray(info.ok_l)))

    xs = jnp.asarray(rng.uniform(size=(50, dim)))
    mean, _ = model.predict(xs, var="diag")
    rmse = float(
        np.sqrt(np.mean((np.asarray(mean) - np.sin(2 * np.asarray(xs).sum(-1))) ** 2))
    )
    assert rmse < 3 * noise


def test_augment_shapes(rng):
    nc, nls, ng, dim = 3, 5, 4, 2
    xl = jnp.asarray(rng.uniform(size=(nc, nls, dim)))
    yl = jnp.asarray(rng.normal(size=(nc, nls)))
    xg = jnp.asarray(rng.uniform(size=(ng, dim)))
    yg = jnp.asarray(rng.normal(size=ng))
    x, y = grbcm.augment(xl, yl, xg, yg)
    assert x.shape == (nc, ng + nls, dim)
    assert y.shape == (nc, ng + nls)
    np.testing.assert_allclose(np.asarray(x[1, :ng]), np.asarray(xg))
    np.testing.assert_allclose(np.asarray(x[2, ng:]), np.asarray(xl[2]))


def test_shared_fit_stream_matches_vmapped(rng):
    """``fit(shared=True, stream=True)`` (lax.map experts + nlml_fast
    custom-VJP objective) reaches the same optimum as the vmapped
    shared fit, and streamed predict matches the vmapped predict."""
    from pygpr_tpu.models import exact_gp

    nc, n, ng, dim, noise = 3, 40, 20, 2, 0.05
    xl = jnp.asarray(rng.uniform(size=(nc, n, dim)))
    xg = jnp.asarray(rng.uniform(size=(ng, dim)))
    yl = jnp.sin(2 * xl.sum(-1)) + noise * jnp.asarray(
        rng.normal(size=(nc, n))
    )
    yg = jnp.sin(2 * xg.sum(-1)) + noise * jnp.asarray(
        rng.normal(size=ng)
    )
    cov = _cov()

    info_s, xa, ya = grbcm.fit(
        cov, xl, yl, xg, yg, max_iter=60, shared=True, stream=True
    )
    info_v, _, _ = grbcm.fit(
        cov, xl, yl, xg, yg, max_iter=60, shared=True, stream=False
    )
    np.testing.assert_allclose(
        np.asarray(info_s.params_l),
        np.asarray(info_v.params_l),
        rtol=2e-3,
    )

    sg = exact_gp.factorize(cov, info_s.params_g, xg, yg)
    sl_s = exact_gp.factorize(cov, info_s.params_l, xa, ya, stream=True)
    sl_v = exact_gp.factorize(cov, info_s.params_l, xa, ya)
    xs = jnp.asarray(rng.uniform(size=(30, dim)))
    r_s = grbcm.predict(
        cov, info_s.params_g, info_s.params_l, sg, sl_s, xs, "diag",
        stream=True,
    )
    r_v = grbcm.predict(
        cov, info_s.params_g, info_s.params_l, sg, sl_v, xs, "diag"
    )
    np.testing.assert_allclose(
        np.asarray(r_s.mean), np.asarray(r_v.mean), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(r_s.covar), np.asarray(r_v.covar), rtol=1e-5, atol=1e-6
    )


def test_committee_sample_predictive_moments(rng):
    """Draws from the aggregated committee posterior reproduce the
    aggregate mean and full covariance."""
    import jax

    from pygpr_tpu.models import exact_gp

    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    nc, n, ng, dim = 3, 24, 12, 2
    xl = jnp.asarray(rng.uniform(0, 4, (nc, n, dim)))
    yl = jnp.sin(xl.sum(-1)) + 0.05 * jnp.asarray(
        rng.normal(size=(nc, n))
    )
    xg = jnp.asarray(rng.uniform(0, 4, (ng, dim)))
    yg = jnp.sin(xg.sum(-1))
    x_aug, y_aug = grbcm.augment(xl, yl, xg, yg)
    pg = cov.init_params(xg)
    pl = cov.init_params(x_aug)
    sg = exact_gp.factorize(cov, pg, xg, yg)
    sl = exact_gp.factorize(cov, pl, x_aug, y_aug)
    xs = jnp.asarray(rng.uniform(0, 4, (10, dim)))

    res = grbcm.predict(cov, pg, pl, sg, sl, xs, "full")
    draws = grbcm.sample_predictive(
        cov, pg, pl, sg, sl, xs, jax.random.PRNGKey(0), n_samples=4000
    )
    assert draws.shape == (4000, 10)
    np.testing.assert_allclose(
        np.asarray(jnp.mean(draws, axis=0)), np.asarray(res.mean),
        atol=5e-2,
    )
    np.testing.assert_allclose(
        np.cov(np.asarray(draws).T), np.asarray(res.covar), atol=5e-2
    )


def test_shared_fit_segmented_matches_unsegmented(rng):
    """segment_iters host-syncs the shared L-BFGS without changing the
    optimum (curvature memory restarts per segment — tolerance is on
    the reached objective, not the trajectory)."""
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    nc, n, ng, dim = 3, 40, 16, 2
    xl = jnp.asarray(rng.uniform(0, 4, (nc, n, dim)))
    yl = jnp.sin(xl.sum(-1)) + 0.05 * jnp.asarray(rng.normal(size=(nc, n)))
    xg = jnp.asarray(rng.uniform(0, 4, (ng, dim)))
    yg = jnp.sin(xg.sum(-1))
    info_full, _, _ = grbcm.fit(
        cov, xl, yl, xg, yg, max_iter=60, shared=True
    )
    info_seg, _, _ = grbcm.fit(
        cov, xl, yl, xg, yg, max_iter=60, shared=True, segment_iters=7
    )
    total_full = float(jnp.sum(info_full.nlml_l))
    total_seg = float(jnp.sum(info_seg.nlml_l))
    assert total_seg <= total_full + 0.5, (total_seg, total_full)
    np.testing.assert_allclose(
        np.asarray(info_seg.params_l[0]),
        np.asarray(info_full.params_l[0]),
        rtol=0.2,
    )
