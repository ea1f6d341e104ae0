"""Distributed-layer tests on an 8-virtual-device CPU mesh
(SURVEY.md §4: sharded == batched-single-device, generalized from the
reference's batch-vs-loop invariant ``tests/test_gpr.py:60-76``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pygpr_tpu as gp
from pygpr_tpu.models import grbcm
from pygpr_tpu.parallel import (
    grbcm_fit_sharded,
    grbcm_predict_sharded,
    make_mesh,
    mcmc_sharded,
)


def _committee(rng, nc=8, n=20, dim=2, ng=12):
    xl = jnp.asarray(rng.uniform(size=(nc, n, dim)))
    xg = jnp.asarray(rng.uniform(size=(ng, dim)))
    yl = jnp.sin(xl.sum(-1))
    yg = jnp.sin(xg.sum(-1))
    return xl, yl, xg, yg


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["expert"] == 8
    assert mesh.shape["chain"] == 1
    mesh2 = make_mesh(n_expert=4, n_chain=2)
    assert mesh2.shape == {"expert": 4, "chain": 2}


def test_sharded_predict_equals_batched(rng):
    """THE correctness invariant: psum-aggregated sharded grBCM ==
    single-device batched grBCM."""
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    xl, yl, xg, yg = _committee(rng)
    model = grbcm.GRBCM(xl, yl, xg, yg, cov)
    xs = jnp.asarray(rng.uniform(size=(15, 2)))
    mean_ref, var_ref = model.predict(xs, var="diag")

    mesh = make_mesh(n_expert=8)
    x_aug, y_aug = grbcm.augment(xl, yl, xg, yg)
    mean_sh, var_sh = grbcm_predict_sharded(
        cov,
        model.gpg.params,
        model.gpl.params,
        xg, yg, x_aug, y_aug, xs, mesh,
    )
    np.testing.assert_allclose(
        np.asarray(mean_sh), np.asarray(mean_ref), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(var_sh), np.asarray(var_ref), rtol=1e-10
    )


def test_sharded_predict_with_mask(rng):
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    xl, yl, xg, yg = _committee(rng)
    mask = jnp.asarray([True, True, False, True, True, False, True, True])
    model = grbcm.GRBCM(xl, yl, xg, yg, cov)
    model.mask = mask
    xs = jnp.asarray(rng.uniform(size=(9, 2)))
    mean_ref, var_ref = model.predict(xs, var="diag")

    mesh = make_mesh(n_expert=8)
    x_aug, y_aug = grbcm.augment(xl, yl, xg, yg)
    mean_sh, var_sh = grbcm_predict_sharded(
        cov, model.gpg.params, model.gpl.params,
        xg, yg, x_aug, y_aug, xs, mesh, mask=mask,
    )
    np.testing.assert_allclose(
        np.asarray(mean_sh), np.asarray(mean_ref), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(var_sh), np.asarray(var_ref), rtol=1e-10
    )


def test_sharded_fit_equals_batched(rng):
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    xl, yl, xg, yg = _committee(rng, nc=8, n=16)
    yl = yl + 0.05 * jnp.asarray(rng.normal(size=yl.shape))
    x_aug, y_aug = grbcm.augment(xl, yl, xg, yg)
    p0 = cov.init_params(xg)

    from pygpr_tpu.optimize import fit_mle

    res_ref = fit_mle(cov, jnp.broadcast_to(p0, (8,) + p0.shape),
                      x_aug, y_aug, max_iter=100)

    mesh = make_mesh(n_expert=8)
    params_g, params_l, nlml_g, nlml_l = grbcm_fit_sharded(
        cov, p0, xg, yg, x_aug, y_aug, mesh, max_iter=100, shared=False
    )
    assert params_l.shape == (8, 4)
    # Trajectories are FP-sensitive (line-searched iterations under
    # different XLA fusions); both reach the same optimum.
    np.testing.assert_allclose(
        np.asarray(nlml_l), np.asarray(res_ref.value), rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(params_l), np.asarray(res_ref.params), rtol=2e-2, atol=5e-3
    )


def test_sharded_shared_fit_equals_single_host(rng):
    """The calibrated training mode on the mesh: ONE hyperparameter
    vector optimized on the psum-summed joint committee NLML must reach
    the same optimum as the single-host shared fit
    (``models.grbcm.fit(shared=True)``)."""
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    xl, yl, xg, yg = _committee(rng, nc=8, n=16)
    yl = yl + 0.05 * jnp.asarray(rng.normal(size=yl.shape))
    x_aug, y_aug = grbcm.augment(xl, yl, xg, yg)
    p0 = jnp.ones((cov.n_params(xg.shape[-1]),), xg.dtype)

    info_ref, _, _ = grbcm.fit(
        cov, xl, yl, xg, yg, params0=p0, max_iter=60, shared=True
    )

    mesh = make_mesh(n_expert=8)
    params_g, params_l, nlml_g, nlml_l = grbcm_fit_sharded(
        cov, p0, xg, yg, x_aug, y_aug, mesh, max_iter=60, shared=True
    )
    # all expert rows carry the same shared vector (up to last-bit
    # rank variation of the CPU in-process all-reduce; on TPU the
    # collective is bitwise rank-identical)
    np.testing.assert_allclose(
        np.asarray(params_l),
        np.broadcast_to(np.asarray(params_l[0]), (8, 4)),
        rtol=1e-9,
    )
    # same optimum as the single-host joint fit (value is the tight
    # check; params can wander along flat directions)
    np.testing.assert_allclose(
        np.asarray(nlml_l), np.asarray(info_ref.nlml_l), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(params_l), np.asarray(info_ref.params_l),
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(params_g), np.asarray(info_ref.params_g), rtol=1e-6
    )


def test_sharded_predict_full_covar(rng):
    """Sharded full-covariance aggregation (psum of β-weighted
    precision matrices) == single-host ``aggregate_full_covar``."""
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    xl, yl, xg, yg = _committee(rng)
    model = grbcm.GRBCM(xl, yl, xg, yg, cov)
    xs = jnp.asarray(rng.uniform(size=(7, 2)))
    mean_ref, cov_ref = model.predict(xs, var="full")

    mesh = make_mesh(n_expert=8)
    x_aug, y_aug = grbcm.augment(xl, yl, xg, yg)
    mean_sh, cov_sh = grbcm_predict_sharded(
        cov, model.gpg.params, model.gpl.params,
        xg, yg, x_aug, y_aug, xs, mesh, var="full",
    )
    assert cov_sh.shape == (7, 7)
    np.testing.assert_allclose(
        np.asarray(mean_sh), np.asarray(mean_ref), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(cov_sh), np.asarray(cov_ref), rtol=1e-8, atol=1e-12
    )


def test_mcmc_sharded_chains(rng):
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    n = 20
    x = jnp.asarray(rng.uniform(size=(n, 1)))
    y = jnp.sin(2 * x[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=n))
    mesh = make_mesh(n_expert=1, n_chain=8)
    res = mcmc_sharded(
        cov, x, y, jax.random.PRNGKey(0), mesh,
        n_chains=8, n_samples=30, n_warmup=30,
    )
    assert res.samples.shape == (8, 30, 3)
    assert np.isfinite(np.asarray(res.samples)).all()
    # coordinated adaptation => all chains share one step size
    steps = np.asarray(res.step_size)
    np.testing.assert_allclose(steps, steps[0], rtol=1e-9)


def test_mcmc_uncoordinated_differs(rng):
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    x = jnp.asarray(rng.uniform(size=(15, 1)))
    y = jnp.sin(2 * x[:, 0])
    mesh = make_mesh(n_expert=1, n_chain=8)
    res = mcmc_sharded(
        cov, x, y, jax.random.PRNGKey(0), mesh,
        n_chains=8, n_samples=20, n_warmup=30, coordinate_step_size=False,
    )
    steps = np.asarray(res.step_size)
    assert np.unique(steps).size > 1  # independent adaptation


def test_nuts_sharded_chains_match_single_device_moments(rng):
    """NUTS on the chain-parallel mesh (VERDICT r03 #5): the pmean
    dual-averaging hook coordinates one shared step size across
    shards, and the sharded sampler targets the same posterior as
    single-device NUTS (moment parity within MC error)."""
    from pygpr_tpu.sample.nuts import sample_posterior_nuts

    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    n = 20
    x = jnp.asarray(rng.uniform(size=(n, 1)))
    y = jnp.sin(2 * x[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=n))
    mesh = make_mesh(n_expert=1, n_chain=8)
    res = mcmc_sharded(
        cov, x, y, jax.random.PRNGKey(0), mesh,
        n_chains=8, n_samples=150, n_warmup=150,
        sampler="nuts", max_depth=5,
    )
    assert res.samples.shape == (8, 150, 3)
    assert np.isfinite(np.asarray(res.samples)).all()
    # coordinated dual averaging => one shared adapted step size
    steps = np.asarray(res.step_size)
    np.testing.assert_allclose(steps, steps[0], rtol=1e-9)

    ref = sample_posterior_nuts(
        cov, x, y, jax.random.PRNGKey(7),
        n_chains=8, n_samples=150, n_warmup=150, max_depth=5,
    )
    m_sh = np.asarray(res.samples).reshape(-1, 3).mean(0)
    m_ref = np.asarray(ref.samples).reshape(-1, 3).mean(0)
    s_ref = np.asarray(ref.samples).reshape(-1, 3).std(0)
    # posterior-moment parity within a generous MC band
    assert np.all(np.abs(m_sh - m_ref) < 0.5 * s_ref + 0.15), (
        m_sh, m_ref, s_ref,
    )


# ---------------------------------------------------------------------------
# Distributed Cholesky / NLML (block-row sharded)
# ---------------------------------------------------------------------------


def test_dist_cholesky_matches_lax(rng):
    from pygpr_tpu.parallel.dist_cholesky import dist_cholesky

    n = 256
    A = rng.normal(size=(n, n))
    K = jnp.asarray(A @ A.T + n * np.eye(n))
    mesh = make_mesh(n_expert=8)
    L = np.asarray(dist_cholesky(K, mesh))
    Lref = np.asarray(jax.lax.linalg.cholesky(K))
    np.testing.assert_allclose(L, Lref, rtol=1e-9, atol=1e-9)
    assert np.allclose(np.triu(L, 1), 0.0)


def test_dist_cholesky_solve(rng):
    from pygpr_tpu.parallel.dist_cholesky import (
        dist_cholesky,
        dist_cholesky_solve,
    )

    n = 128
    A = rng.normal(size=(n, n))
    K = jnp.asarray(A @ A.T + n * np.eye(n))
    b = jnp.asarray(rng.normal(size=n))
    mesh = make_mesh(n_expert=8)
    L = dist_cholesky(K, mesh)
    x = np.asarray(dist_cholesky_solve(L, b, mesh))
    np.testing.assert_allclose(
        x, np.linalg.solve(np.asarray(K), np.asarray(b)), rtol=1e-8
    )


def test_dist_nlml_matches_single_device(rng):
    from pygpr_tpu.models.likelihood import nlml
    from pygpr_tpu.parallel.dist_cholesky import dist_nlml

    n, dim = 256, 2
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    x = jnp.asarray(rng.uniform(size=(n, dim)))
    y = jnp.sin(x.sum(-1))
    p = jnp.asarray([1.0, 1.0, 1.0, 0.1])
    mesh = make_mesh(n_expert=8)
    # default schedule is now the block-cyclic factorization; jit —
    # eager shard_map dispatches every collective round separately
    v_dist = float(
        jax.jit(lambda q: dist_nlml(cov, q, x, y, mesh))(p)
    )
    v_ref = float(nlml(cov, p, x, y))
    np.testing.assert_allclose(v_dist, v_ref, rtol=1e-10)


def test_dist_nlml_ladder_rescues_singular(rng):
    """Duplicated points (singular gram) + bare RBF: the distributed
    ladder must still return a finite NLML."""
    from pygpr_tpu.parallel.dist_cholesky import dist_nlml

    x1 = rng.uniform(size=(64, 2))
    x = jnp.asarray(np.concatenate([x1, x1]))   # 128 rows, rank-64 gram
    y = jnp.sin(x.sum(-1))
    mesh = make_mesh(n_expert=8)
    v = float(
        jax.jit(
            lambda q: dist_nlml(gp.RBF(), q, x, y, mesh)
        )(jnp.ones(3))
    )
    assert np.isfinite(v)


def test_dist_cholesky_solve_cols_gives_inverse(rng):
    from pygpr_tpu.parallel.dist_cholesky import (
        dist_cholesky,
        dist_cholesky_solve_cols,
    )

    n = 128
    A = rng.normal(size=(n, n))
    K = jnp.asarray(A @ A.T + n * np.eye(n))
    mesh = make_mesh(n_expert=8)
    L = dist_cholesky(K, mesh)
    Kinv = np.asarray(dist_cholesky_solve_cols(L, mesh))
    np.testing.assert_allclose(
        Kinv, np.linalg.inv(np.asarray(K)), rtol=1e-8, atol=1e-10
    )


def test_dist_nlml_gradient_matches_ad(rng):
    """The distributed NLML is differentiable: its custom-VJP analytic
    gradient (distributed solves, loss.py:84 closed form) must match
    reverse-mode AD through the single-device NLML."""
    from pygpr_tpu.models.likelihood import nlml
    from pygpr_tpu.parallel.dist_cholesky import dist_nlml

    n, dim = 128, 2
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    x = jnp.asarray(rng.uniform(size=(n, dim)))
    y = jnp.sin(x.sum(-1)) + 0.05 * jnp.asarray(rng.normal(size=n))
    p = jnp.asarray([1.2, 0.8, 1.1, 0.3])
    mesh = make_mesh(n_expert=8)

    g_dist = np.asarray(
        jax.jit(jax.grad(lambda q: dist_nlml(cov, q, x, y, mesh)))(p)
    )
    v_dist = float(
        jax.jit(lambda q: dist_nlml(cov, q, x, y, mesh))(p)
    )
    v_ref, g_ref = jax.value_and_grad(lambda q: nlml(cov, q, x, y))(p)
    np.testing.assert_allclose(v_dist, float(v_ref), rtol=1e-10)
    np.testing.assert_allclose(g_dist, np.asarray(g_ref), rtol=1e-7)


@pytest.mark.parametrize("schedule", ["block_row", "cyclic"])
def test_dist_nlml_schedules_agree(rng, schedule):
    """Both factorization schedules drive the SAME differentiable NLML:
    value+grad match single-device reverse-mode AD to round-off (the
    cyclic schedule is the production default — VERDICT r03 #3)."""
    from pygpr_tpu.models.likelihood import nlml
    from pygpr_tpu.parallel.dist_cholesky import dist_nlml

    n, dim = 128, 2
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    x = jnp.asarray(rng.uniform(size=(n, dim)))
    y = jnp.sin(x.sum(-1)) + 0.05 * jnp.asarray(rng.normal(size=n))
    p = jnp.asarray([1.2, 0.8, 1.1, 0.3])
    mesh = make_mesh(n_expert=8)
    vg = jax.jit(
        jax.value_and_grad(
            lambda q: dist_nlml(cov, q, x, y, mesh, schedule=schedule)
        )
    )
    v_dist, g_dist = vg(p)
    v_ref, g_ref = jax.value_and_grad(lambda q: nlml(cov, q, x, y))(p)
    np.testing.assert_allclose(float(v_dist), float(v_ref), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(g_dist), np.asarray(g_ref), rtol=1e-7
    )


def test_cyclic_layout_roundtrip(rng):
    from pygpr_tpu.parallel.dist_cyclic import from_cyclic, to_cyclic

    n = 64
    K = jnp.asarray(rng.normal(size=(n, n)))
    for m in (1, 2, 4):
        Kc = to_cyclic(K, 8, m)
        np.testing.assert_array_equal(
            np.asarray(from_cyclic(Kc, 8, m)), np.asarray(K)
        )


@pytest.mark.parametrize("n,m", [(128, 1), (128, 2), (256, 4)])
def test_dist_cholesky_cyclic_matches_lax(rng, n, m):
    """Block-cyclic schedule == lax Cholesky (through the layout
    permutation), for several blocks-per-device counts."""
    from pygpr_tpu.parallel.dist_cyclic import (
        dist_cholesky_cyclic,
        from_cyclic,
        to_cyclic,
    )

    A = rng.normal(size=(n, n))
    K = jnp.asarray(A @ A.T + n * np.eye(n))
    mesh = make_mesh(n_expert=8)
    Kc = to_cyclic(K, 8, m)
    # always jit: eager shard_map dispatches every collective round
    # separately (minutes at n=512 on the virtual mesh)
    Lc = jax.jit(
        lambda a: dist_cholesky_cyclic(a, mesh, m=m)
    )(Kc)
    L = np.asarray(from_cyclic(Lc, 8, m))
    Lref = np.asarray(jax.lax.linalg.cholesky(K))
    np.testing.assert_allclose(L, Lref, rtol=1e-9, atol=1e-9)
    assert np.allclose(np.triu(L, 1), 0.0)
