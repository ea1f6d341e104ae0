"""Optimizer tests: quadratic oracle (``PyGPR/tests/test_opt.py``),
L-BFGS end-to-end NLML fit, SciPy-driver parity, step-size rule."""

import os
from itertools import product

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pygpr_tpu as gp
from pygpr_tpu.models.likelihood import MLE, Loss, nlml
from pygpr_tpu.optimize import (
    CG,
    BFGSQuad,
    CGQuad,
    NelderMead,
    fit_mle,
    get_learn_rate,
    hessian,
    learn_rate,
    minimize_lbfgs,
)

DIMS = (2, 3, 5, 7)
SEEDS = (23, 443556, 1233)


@pytest.mark.parametrize(
    "dim,optim,seed", list(product(DIMS, (CGQuad, BFGSQuad), SEEDS))
)
def test_opt_quad(dim, optim, seed, tmp_path):
    """Reference oracle (``tests/test_opt.py:21-56``): minimize a random
    SPD quadratic, match ``np.linalg.solve(H, -J)`` to rtol 1e-3."""
    rng = np.random.RandomState(seed)
    L = rng.rand(dim, dim)
    H = L.T @ L
    J = rng.rand(dim)

    def fun(x):
        return np.dot(J, x) + np.dot(x, H @ x)

    def grad(x):
        return J + H @ x

    loss = Loss(None)
    loss.loss = fun
    loss.grad = grad

    xmin_exact = np.linalg.solve(H, -J)
    par = rng.rand(dim)
    opt = optim(loss, trace_path=str(tmp_path / "opt.dat"))
    k = opt.minimize(par=par)
    assert k > 0
    np.testing.assert_allclose(opt.x, xmin_exact, rtol=1e-3)


def test_hessian_fd():
    rng = np.random.RandomState(0)
    L = rng.rand(4, 4)
    H = L.T @ L
    J = rng.rand(4)
    jac = lambda x: J + H @ x
    Hfd = hessian(rng.rand(4), jac, eps=1e-6)
    np.testing.assert_allclose(Hfd, H, atol=1e-5)


def test_lbfgs_quadratic():
    rng = np.random.RandomState(1)
    L = rng.rand(5, 5)
    H = jnp.asarray(L.T @ L + 0.1 * np.eye(5))
    J = jnp.asarray(rng.rand(5))
    fun = lambda x: jnp.dot(J, x) + 0.5 * jnp.dot(x, H @ x)
    res = minimize_lbfgs(fun, jnp.zeros(5), tol=1e-8)
    np.testing.assert_allclose(
        np.asarray(res.params), np.linalg.solve(np.asarray(H), -np.asarray(J)),
        rtol=1e-5,
    )
    assert bool(res.converged)


def _gp_problem(rng, n=60, dim=2):
    x = jnp.asarray(rng.uniform(size=(n, dim)))
    y = jnp.sin(3.0 * x.sum(-1)) + 0.05 * jnp.asarray(rng.normal(size=n))
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    return cov, x, y


def test_fit_mle_decreases_nlml(rng):
    cov, x, y = _gp_problem(rng)
    p0 = cov.init_params(x)
    v0 = float(nlml(cov, p0, x, y))
    res = fit_mle(cov, p0, x, y, max_iter=300)
    v1 = float(res.value)
    assert v1 < v0 - 1.0  # meaningful improvement
    assert np.isfinite(np.asarray(res.params)).all()
    # log-space fit recovers the true noise level 0.05
    sig_n = abs(float(res.params[-1]))
    assert 0.02 < sig_n < 0.15


def test_fit_mle_raw_parity_mode(rng):
    """Raw-parameter mode (reference landscape) still improves NLML."""
    cov, x, y = _gp_problem(rng)
    p0 = cov.init_params(x)
    v0 = float(nlml(cov, p0, x, y))
    res = fit_mle(cov, p0, x, y, max_iter=100, log_space=False)
    assert float(res.value) < v0


def test_fit_mle_batched_equals_stacked(rng):
    """Per-expert vmapped fits == independent fits (the grBCM.train
    intent, SURVEY.md §2.5)."""
    nc, n, dim = 3, 40, 2
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    xb = jnp.asarray(rng.uniform(size=(nc, n, dim)))
    yb = jnp.sin(xb.sum(-1)) + 0.01 * jnp.asarray(rng.normal(size=(nc, n)))
    p0 = cov.init_params(xb)
    res_b = fit_mle(cov, p0, xb, yb, max_iter=50)
    assert res_b.params.shape == (nc, cov.n_params(dim))
    for i in range(nc):
        res_i = fit_mle(cov, p0[i], xb[i], yb[i], max_iter=50)
        np.testing.assert_allclose(
            float(res_b.value[i]), float(res_i.value), rtol=1e-6
        )


def test_scipy_cg_driver(rng, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cov, x, y = _gp_problem(rng, n=40)
    model = gp.ExactGP(x, y, cov)
    # Sane start: the reference noise init 1e-4 makes the raw landscape
    # so ill-scaled that SciPy CG stalls at the start point.
    model.set_params(jnp.asarray([1.0, 1.0, 1.0, 0.1]))
    loss = MLE(model)
    v0 = float(nlml(cov, model.params, x, y))
    opt = CG(loss)
    opt.minimize()
    v1 = float(nlml(cov, model.params, x, y))
    assert v1 < v0
    assert os.path.exists("opt.dat")  # reference trace artifact
    with open("opt.dat") as f:
        assert len(f.readlines()) >= 1


def test_scipy_nelder_mead_driver(rng, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cov, x, y = _gp_problem(rng, n=30)
    model = gp.ExactGP(x, y, cov)
    loss = MLE(model)
    v0 = float(nlml(cov, model.params, x, y))
    NelderMead(loss).minimize()
    v1 = float(nlml(cov, model.params, x, y))
    assert v1 <= v0 + 1e-9


def test_lbfgs_matches_scipy_cg(rng, tmp_path, monkeypatch):
    """On-device L-BFGS reaches an NLML at least as good as the
    reference-style SciPy CG driver on the same problem."""
    monkeypatch.chdir(tmp_path)
    cov, x, y = _gp_problem(rng, n=50)
    p0 = jnp.asarray([1.0, 1.0, 1.0, 0.1])

    model = gp.ExactGP(x, y, cov)
    model.set_params(p0)
    CG(MLE(model)).minimize()
    v_cg = float(nlml(cov, model.params, x, y))

    res = fit_mle(cov, p0, x, y, max_iter=300, tol=1e-5)
    assert float(res.value) <= v_cg + 0.1


def test_learn_rate_parabolic(rng):
    """γ recovers the exact minimizer step for a quadratic: for
    f = ½xᵀHx with H = h·I, θ⁺ = θ − γJ is exact when γ = 1/h."""
    h = 4.0
    fun = lambda p: 0.5 * h * jnp.sum(p**2)
    grad_fun = jax.grad(fun)
    p = jnp.asarray([1.0, -2.0])
    gamma, J = learn_rate(fun, grad_fun, p, eps=1e-4)
    np.testing.assert_allclose(float(gamma), 1.0 / h, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(p - gamma * J), 0.0, atol=1e-4)


def test_get_learn_rate_host_api(rng):
    cov, x, y = _gp_problem(rng, n=30)
    model = gp.ExactGP(x, y, cov)
    loss = MLE(model)
    gamma = get_learn_rate(np.asarray(model.params), loss, eps=1e-5)
    assert np.isfinite(gamma)


def test_fit_mle_resumable(rng, tmp_path):
    """Segmented fit resumes from its checkpoint and lands at (or near)
    the one-shot optimum."""
    from pygpr_tpu.optimize import fit_mle_resumable

    cov, x, y = _gp_problem(rng, n=40)
    p0 = cov.init_params(x)
    ck = str(tmp_path / "fit.npz")

    res_ref = fit_mle(cov, p0, x, y, max_iter=300, tol=1e-5)

    # run 2 segments, simulate a crash, then resume to completion
    res_a = fit_mle_resumable(
        cov, p0, x, y, ck, max_iter=40, segment_iters=20, tol=1e-5
    )
    assert os.path.exists(ck)
    res_b = fit_mle_resumable(
        cov, p0, x, y, ck, max_iter=300, segment_iters=100, tol=1e-5
    )
    assert float(res_b.value) <= float(res_ref.value) + 0.5
    # resuming again from a converged checkpoint is a no-op-ish call
    res_c = fit_mle_resumable(
        cov, p0, x, y, ck, max_iter=300, segment_iters=100, tol=1e-5
    )
    assert float(res_c.value) <= float(res_b.value) + 1e-3
