"""Kernel-layer tests, mirroring the reference test strategy
(``PyGPR/tests/test_covar.py``, SURVEY.md §4 patterns 1, 3, 4, 5, 6)."""

from itertools import product

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pygpr_tpu import RBF, Sum, WhiteNoise, kernel_and_grad, kernel_matrix
from pygpr_tpu.ops.kernels import sq_distance

COMPOSES = (
    (RBF(), RBF()),
    (RBF(), WhiteNoise()),
    (RBF(), RBF(), WhiteNoise()),
)

NS = (10, 100)
MS = (5, 50)
DIMS = (2, 5)


def _rand(rng, *shape):
    return jnp.asarray(rng.uniform(size=shape))


def test_sq_distance_matches_naive(rng):
    x = _rand(rng, 20, 3)
    xp = _rand(rng, 7, 3)
    d = sq_distance(x, xp)
    naive = np.sum((np.asarray(xp)[:, None] - np.asarray(x)[None]) ** 2, -1)
    np.testing.assert_allclose(np.asarray(d), naive, atol=1e-10)
    # self-distance: zero diagonal, symmetric
    ds = sq_distance(x)
    np.testing.assert_allclose(np.diag(np.asarray(ds)), 0.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ds), np.asarray(ds).T, atol=1e-12)


@pytest.mark.parametrize(
    "kernels,n,m,dim", list(product(COMPOSES, NS, MS, DIMS))
)
def test_compose_is_sum_of_parts(kernels, n, m, dim, rng):
    """Reference ``test_compose_covar`` (``tests/test_covar.py:24-45``)."""
    x = _rand(rng, n, dim)
    xp = _rand(rng, m, dim)
    cov = Sum(kernels)
    hp = _rand(rng, cov.n_params(dim))
    krn_c = kernel_matrix(cov, hp, x, xp)

    krn = jnp.zeros_like(krn_c)
    off = 0
    for k in kernels:
        nh = k.n_params(dim)
        krn = krn + kernel_matrix(k, hp[off : off + nh], x, xp)
        off += nh
    np.testing.assert_allclose(np.asarray(krn_c), np.asarray(krn), atol=1e-7)


@pytest.mark.parametrize("kernels,n,dim", list(product(COMPOSES, NS, DIMS)))
def test_compose_grad_is_concat_of_parts(kernels, n, dim, rng):
    """Reference ``test_compose_deriv_covar`` (``tests/test_covar.py:52-77``)."""
    x = _rand(rng, n, dim)
    cov = Sum(kernels)
    hp = _rand(rng, cov.n_params(dim))
    krn_c, dkrn_c = kernel_and_grad(cov, hp, x)

    krn = jnp.zeros_like(krn_c)
    dkrns = []
    off = 0
    for k in kernels:
        nh = k.n_params(dim)
        km, dk = kernel_and_grad(k, hp[off : off + nh], x)
        krn = krn + km
        dkrns.append(dk)
        off += nh
    dkrn = jnp.concatenate(dkrns, axis=0)
    np.testing.assert_allclose(np.asarray(krn_c), np.asarray(krn), atol=1e-7)
    np.testing.assert_allclose(np.asarray(dkrn_c), np.asarray(dkrn), atol=1e-7)


@pytest.mark.parametrize("n,dim", list(product(NS, DIMS)))
def test_symmetry_and_psd(n, dim, rng):
    """Reference ``test_covar_symmetric`` + PSD-after-jitter
    (``tests/test_covar.py:91-115``)."""
    x = _rand(rng, n, dim)
    for cov in (RBF(), WhiteNoise(), Sum((RBF(), RBF(), WhiteNoise()))):
        hp = _rand(rng, cov.n_params(dim))
        krn = np.asarray(kernel_matrix(cov, hp, x))
        np.testing.assert_allclose(krn, krn.T, atol=1e-7)
        eig = np.linalg.eigvalsh(krn + 1e-7 * np.eye(n))
        assert np.all(eig > -1e-7)


@pytest.mark.parametrize("nc", (2, 4))
def test_batched_equals_stacked(nc, rng):
    """Reference batch-vs-loop invariant (``tests/test_covar.py:119-137``)
    — the invariant that makes expert sharding correct."""
    n, dim = 30, 3
    cov = Sum((RBF(), WhiteNoise()))
    xb = _rand(rng, nc, n, dim)
    hpb = _rand(rng, nc, cov.n_params(dim))
    krn_b, dkrn_b = kernel_and_grad(cov, hpb, xb)
    for i in range(nc):
        k1, dk1 = kernel_and_grad(cov, hpb[i], xb[i])
        np.testing.assert_allclose(np.asarray(krn_b[i]), np.asarray(k1), atol=1e-12)
        np.testing.assert_allclose(np.asarray(dkrn_b[i]), np.asarray(dk1), atol=1e-12)


@pytest.mark.parametrize("n,dim", [(15, 2), (40, 3)])
def test_analytic_grad_matches_autodiff(n, dim, rng):
    """Cross-check hand-derived dK against jax.jacfwd (the build's
    equivalent of the reference FD check, ``tests/test_covar.py:141-163``)."""
    x = _rand(rng, n, dim)
    cov = Sum((RBF(), WhiteNoise()))
    hp = 0.5 + _rand(rng, cov.n_params(dim))
    _, dkrn = kernel_and_grad(cov, hp, x)
    jac = jax.jacfwd(lambda p: kernel_matrix(cov, p, x))(hp)  # [n,n,nhp]
    np.testing.assert_allclose(
        np.asarray(dkrn), np.moveaxis(np.asarray(jac), -1, 0), atol=1e-9
    )


def test_diag_matches_matrix(rng):
    x = _rand(rng, 25, 4)
    cov = Sum((RBF(), WhiteNoise()))
    hp = _rand(rng, cov.n_params(4))
    full = np.asarray(kernel_matrix(cov, hp, x))
    from pygpr_tpu import kernel_diag

    np.testing.assert_allclose(
        np.diag(full), np.asarray(kernel_diag(cov, hp, x)), atol=1e-12
    )


def test_init_params_parity(rng):
    """SE init all-ones (covar.py:96-100); noise init 1e-4 (covar.py:224);
    batched shape [nc, nhp] (covar.py:36-42)."""
    x = _rand(rng, 10, 3)
    cov = Sum((RBF(), WhiteNoise()))
    p = np.asarray(cov.init_params(x))
    np.testing.assert_allclose(p[:4], 1.0)
    np.testing.assert_allclose(p[4], 1e-4)
    xb = _rand(rng, 5, 10, 3)
    pb = cov.init_params(xb)
    assert pb.shape == (5, 5)
