"""Structural kernel operators: ActiveDims (sub-space restriction /
additive GP structure) and ChangePoint (sigmoid regime switching).

Beyond-reference capability (the reference's kernels always see every
input column, ``covar.py:140``, and its only combinator is the sum,
``covar.py:57-62``); tested with the house patterns — PSD/symmetry,
grads vs jacfwd, batched == stacked, end-to-end fits.
"""

from itertools import product

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pygpr_tpu as gp
from pygpr_tpu import (
    ActiveDims,
    ChangePoint,
    Matern,
    RBF,
    Sum,
    WhiteNoise,
    kernel_and_grad,
    kernel_matrix,
)


def _rand(rng, *shape):
    return jnp.asarray(rng.uniform(size=shape))


STRUCTURED = (
    ActiveDims(RBF(), (0,)),
    ActiveDims(Matern(2.5), (2, 1)),
    Sum((ActiveDims(RBF(), (0,)), ActiveDims(RBF(), (1, 2)), WhiteNoise())),
    ChangePoint(RBF(), Matern(1.5)),
    ChangePoint(Sum((RBF(), WhiteNoise())), RBF(), axis=1),
)


@pytest.mark.parametrize("cov", STRUCTURED, ids=lambda c: repr(c)[:40])
def test_structured_symmetry_and_psd(cov, rng):
    n, dim = 40, 3
    x = _rand(rng, n, dim)
    hp = 0.5 + _rand(rng, cov.n_params(dim))
    krn = np.asarray(kernel_matrix(cov, hp, x))
    np.testing.assert_allclose(krn, krn.T, atol=1e-10)
    eig = np.linalg.eigvalsh(krn + 1e-7 * np.eye(n))
    assert np.all(eig > -1e-7)


@pytest.mark.parametrize("cov", STRUCTURED, ids=lambda c: repr(c)[:40])
def test_structured_grad_matches_autodiff(cov, rng):
    n, dim = 18, 3
    x = _rand(rng, n, dim)
    hp = 0.5 + _rand(rng, cov.n_params(dim))
    _, dkrn = kernel_and_grad(cov, hp, x)
    jac = jax.jacfwd(lambda p: kernel_matrix(cov, p, x))(hp)
    np.testing.assert_allclose(
        np.asarray(dkrn), np.moveaxis(np.asarray(jac), -1, 0), atol=1e-9
    )


@pytest.mark.parametrize("cov", STRUCTURED, ids=lambda c: repr(c)[:40])
def test_structured_diag_cross_batched(cov, rng):
    n, m, dim, nc = 25, 9, 3, 3
    x = _rand(rng, n, dim)
    xp = _rand(rng, m, dim)
    hp = 0.5 + _rand(rng, cov.n_params(dim))
    full = np.asarray(kernel_matrix(cov, hp, x))
    np.testing.assert_allclose(
        np.diag(full), np.asarray(gp.kernel_diag(cov, hp, x)), atol=1e-10
    )
    assert kernel_matrix(cov, hp, x, xp).shape == (m, n)
    # batched == stacked (the expert-sharding invariant)
    xb = _rand(rng, nc, n, dim)
    hpb = 0.5 + _rand(rng, nc, cov.n_params(dim))
    kb, dkb = kernel_and_grad(cov, hpb, xb)
    for i in range(nc):
        k1, dk1 = kernel_and_grad(cov, hpb[i], xb[i])
        np.testing.assert_allclose(np.asarray(kb[i]), np.asarray(k1), atol=1e-12)
        np.testing.assert_allclose(np.asarray(dkb[i]), np.asarray(dk1), atol=1e-12)


def test_active_dims_equals_base_on_sliced_input(rng):
    n, m = 30, 11
    x = _rand(rng, n, 4)
    xp = _rand(rng, m, 4)
    dims = (1, 3)
    base = RBF()
    cov = ActiveDims(base, dims)
    assert cov.n_params(4) == base.n_params(2)
    hp = 0.5 + _rand(rng, cov.n_params(4))
    xs, xps = x[:, dims], xp[:, dims]
    np.testing.assert_allclose(
        np.asarray(kernel_matrix(cov, hp, x, xp)),
        np.asarray(kernel_matrix(base, hp, xs, xps)),
        atol=1e-13,
    )
    k, dk = kernel_and_grad(cov, hp, x)
    kb, dkb = kernel_and_grad(base, hp, xs)
    np.testing.assert_allclose(np.asarray(k), np.asarray(kb), atol=1e-13)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dkb), atol=1e-13)
    # init_params comes from the sliced input
    assert cov.init_params(x).shape == (3,)
    assert cov.init_params(_rand(rng, 5, n, 4)).shape == (5, 3)


def test_additive_structure_recovers_additive_function(rng):
    """f(x) = sin(3·x₀) + 0.5·x₁² is additive: the ActiveDims additive
    kernel must generalize to test points at *unseen coordinate
    combinations*, where the joint RBF has no data support."""
    n = 160
    x = np.asarray(rng.uniform(0, 3, (n, 2)))
    # training data only sees the band x0+x1 < 3.7 of the square
    x = x[x.sum(1) < 3.7][:96]
    y = np.sin(3 * x[:, 0]) + 0.5 * x[:, 1] ** 2
    xq = np.asarray(rng.uniform(1.8, 3.0, (64, 2)))  # mostly unseen corner
    fq = np.sin(3 * xq[:, 0]) + 0.5 * xq[:, 1] ** 2

    def fit_predict(cov):
        res = gp.fit_mle(
            cov, cov.init_params(jnp.asarray(x)), jnp.asarray(x),
            jnp.asarray(y), max_iter=150,
        )
        st = gp.factorize(cov, res.params, jnp.asarray(x), jnp.asarray(y))
        mean, _ = gp.predict(cov, st, jnp.asarray(xq), var="diag")
        return float(np.sqrt(np.mean((np.asarray(mean) - fq) ** 2)))

    add = Sum(
        (ActiveDims(RBF(), (0,)), ActiveDims(RBF(), (1,)), WhiteNoise())
    )
    joint = Sum((RBF(), WhiteNoise()))
    rmse_add = fit_predict(add)
    rmse_joint = fit_predict(joint)
    assert rmse_add < 0.15, rmse_add
    assert rmse_add < 0.7 * rmse_joint, (rmse_add, rmse_joint)


def test_changepoint_limits_and_gate(rng):
    """Far from the changepoint the kernel reduces to the active
    regime's kernel; the diagonal matches the matrix diagonal."""
    n = 20
    cp = ChangePoint(RBF(), Matern(1.5))
    # steep gate at c=1: points at x0 ≈ 3 are pure k1, x0 ≈ -1 pure k2
    hp = jnp.concatenate([
        jnp.asarray([1.0, 10.0]),       # c=1, a²=100
        jnp.asarray([1.3, 0.7]),        # k1: σ, ℓ
        jnp.asarray([0.8, 1.1]),        # k2
    ])
    x_hi = jnp.asarray(2.5 + rng.uniform(size=(n, 1)))
    x_lo = jnp.asarray(-1.5 + rng.uniform(size=(n, 1)) * 0.4)
    k_hi = np.asarray(kernel_matrix(cp, hp, x_hi))
    k_lo = np.asarray(kernel_matrix(cp, hp, x_lo))
    np.testing.assert_allclose(
        k_hi, np.asarray(kernel_matrix(RBF(), hp[2:4], x_hi)), atol=1e-8
    )
    np.testing.assert_allclose(
        k_lo, np.asarray(kernel_matrix(Matern(1.5), hp[4:], x_lo)), atol=1e-8
    )
    # cross block between regimes vanishes for a steep gate
    cross = np.asarray(kernel_matrix(cp, hp, x_lo, x_hi))
    assert np.abs(cross).max() < 1e-8
    # init: gate [1, 1] then sub-kernel inits
    p0 = np.asarray(cp.init_params(x_hi))
    np.testing.assert_allclose(p0, np.ones(6))
    # data-driven init: gate location at the axis median
    pd = np.asarray(cp.init_from_data(x_hi))
    np.testing.assert_allclose(pd[0], np.median(np.asarray(x_hi)[:, 0]))
    assert pd.shape == (6,) and (pd[1] > 0)
    np.testing.assert_allclose(pd[2:], np.ones(4))


def test_changepoint_fit_finds_regime_switch(rng):
    """Data that is smooth left of x=2 and noisy-flat right of it:
    the fitted changepoint model must beat a single stationary kernel
    on held-out NLPD, and place the gate transition near x=2."""
    n = 192
    x = np.sort(rng.uniform(0, 4, (n, 1)), axis=0)
    left = x[:, 0] < 2.0
    y = np.where(left, np.sin(3 * x[:, 0]), 0.0)
    y = y + rng.normal(size=n) * np.where(left, 0.02, 0.4)
    xq = np.asarray(rng.uniform(0, 4, (160, 1)))
    fq = np.where(xq[:, 0] < 2.0, np.sin(3 * xq[:, 0]), 0.0)

    cp = ChangePoint(Sum((RBF(), WhiteNoise())), Sum((RBF(), WhiteNoise())))
    p0 = np.ones(cp.n_params(1), dtype=np.float64)
    p0[0] = 1.0     # gate location starts at 1, must travel to ~2
    res = gp.fit_mle(cp, jnp.asarray(p0), jnp.asarray(x), jnp.asarray(y),
                     max_iter=200)
    c_hat = float(res.params[0])
    assert 1.5 < c_hat < 2.5, c_hat

    st = gp.factorize(cp, res.params, jnp.asarray(x), jnp.asarray(y))
    mean, var = gp.predict(cp, st, jnp.asarray(xq), var="diag")
    nlpd_cp = float(np.mean(
        0.5 * np.log(2 * np.pi * np.asarray(var))
        + (np.asarray(mean) - fq) ** 2 / (2 * np.asarray(var))
    ))

    plain = Sum((RBF(), WhiteNoise()))
    res_p = gp.fit_mle(plain, plain.init_params(jnp.asarray(x)),
                       jnp.asarray(x), jnp.asarray(y), max_iter=200)
    st_p = gp.factorize(plain, res_p.params, jnp.asarray(x), jnp.asarray(y))
    mean_p, var_p = gp.predict(plain, st_p, jnp.asarray(xq), var="diag")
    nlpd_plain = float(np.mean(
        0.5 * np.log(2 * np.pi * np.asarray(var_p))
        + (np.asarray(mean_p) - fq) ** 2 / (2 * np.asarray(var_p))
    ))
    assert nlpd_cp < nlpd_plain - 0.1, (nlpd_cp, nlpd_plain)


def test_changepoint_init_clamps_nonpositive_gate(rng):
    """Data spanning non-positive gate-axis values: init_from_data
    must warn AND return a positive gate location, so the documented
    default log-space fit_mle stays finite (ADVICE r04)."""
    cp = ChangePoint(RBF(), RBF())
    x = jnp.asarray(rng.uniform(-2.0, -1.0, size=(32, 1)))
    with pytest.warns(UserWarning, match="clamped"):
        p = np.asarray(cp.init_from_data(x))
    assert p[0] > 0.0
    assert np.isfinite(np.log(p[: 2])).all()
