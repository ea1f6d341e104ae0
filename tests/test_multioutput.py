"""Multi-output / coregionalized GPs (ops/coregion.py).

Oracles: explicit block structure of the ICM gram, PSD/symmetry,
analytic == jacfwd == FD gradients, and the defining end-to-end
property — cross-task transfer: observing task 0 in a region improves
task 1's prediction there through the learned B.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pygpr_tpu as gp
from pygpr_tpu.models import exact_gp
from pygpr_tpu.models.likelihood import nlml
from pygpr_tpu.ops.coregion import ICM, TaskNoise, stack_outputs, with_task
from pygpr_tpu.optimize.lbfgs import fit_mle


def _aug_data(rng, n_per=24, dim=1, t=2):
    xs = [rng.uniform(0, 4, (n_per, dim)) for _ in range(t)]
    ys = [np.sin(2 * x.sum(-1)) * (0.5 + k) for k, x in enumerate(xs)]
    xa, ya = stack_outputs(xs, ys)
    return jnp.asarray(xa), jnp.asarray(ya)


def _params(kern, x, rng):
    p = np.array(kern.init_params(x))
    p += 0.1 * rng.uniform(size=p.shape)  # break symmetry
    return jnp.asarray(p)


def test_icm_block_structure(rng):
    """K[(task i block), (task j block)] == B[i, j] · k_base."""
    kern = ICM(gp.RBF(), n_outputs=2, rank=2)
    x, y = _aug_data(rng)
    p = _params(kern, x, rng)
    K = np.asarray(kern.matrix(p, x))
    B = np.asarray(kern.coregion_matrix(p, x.shape[-1]))
    theta_b = p[: gp.RBF().n_params(x.shape[-1] - 1)]
    kb = np.asarray(gp.RBF().matrix(theta_b, x[:, :-1]))
    ti = np.asarray(x[:, -1]).astype(int)
    np.testing.assert_allclose(K, B[ti[:, None], ti[None, :]] * kb,
                               rtol=1e-12)
    np.testing.assert_allclose(K, K.T, rtol=1e-12)
    ev = np.linalg.eigvalsh(K + 1e-9 * np.eye(len(K)))
    assert (ev > 0).all()
    np.testing.assert_allclose(
        np.asarray(kern.diag(p, x)), np.diag(K), rtol=1e-12
    )


def test_icm_cross_block_orientation(rng):
    """matrix(p, x, xp) rows index xp (house convention) with the
    right task pairing."""
    kern = ICM(gp.RBF(), n_outputs=3, rank=1)
    x, _ = _aug_data(rng, t=3)
    xp = jnp.asarray(
        np.c_[rng.uniform(0, 4, (5, 1)), np.array([0, 1, 2, 1, 0.0])]
    )
    p = _params(kern, x, rng)
    Kc = np.asarray(kern.matrix(p, x, xp))
    assert Kc.shape == (5, x.shape[0])
    Kfull = np.asarray(
        kern.matrix(p, jnp.concatenate([x, xp], 0))
    )
    np.testing.assert_allclose(Kc, Kfull[x.shape[0]:, : x.shape[0]],
                               rtol=1e-12)


@pytest.mark.parametrize("kern_f", [
    lambda: ICM(gp.RBF(), 2, rank=2),
    lambda: TaskNoise(2),
])
def test_grads_match_jacfwd_and_fd(rng, kern_f):
    kern = kern_f()
    x, _ = _aug_data(rng, n_per=8)
    p = _params(kern, x, rng)
    K, dK = kern.matrix_and_grad(p, x)
    jac = jnp.moveaxis(
        jax.jacfwd(lambda q: kern.matrix(q, x))(p), -1, 0
    )
    np.testing.assert_allclose(np.asarray(dK), np.asarray(jac),
                               rtol=1e-9, atol=1e-12)
    eps = 1e-6
    for j in range(p.shape[0]):
        pp = p.at[j].add(eps)
        pm = p.at[j].add(-eps)
        fd = (kern.matrix(pp, x) - kern.matrix(pm, x)) / (2 * eps)
        np.testing.assert_allclose(
            np.asarray(dK[j]), np.asarray(fd), rtol=1e-4, atol=1e-7
        )


def test_task_noise_zero_cross_block(rng):
    kern = TaskNoise(2)
    x, _ = _aug_data(rng, n_per=6)
    p = jnp.asarray([0.3, 0.7])
    xp = with_task(rng.uniform(0, 4, (4, 1)), 1)
    assert float(jnp.abs(kern.matrix(p, x, xp)).max()) == 0.0
    K = np.asarray(kern.matrix(p, x))
    ti = np.asarray(x[:, -1]).astype(int)
    np.testing.assert_allclose(
        np.diag(K), np.where(ti == 0, 0.09, 0.49), rtol=1e-12
    )


def test_multioutput_transfer(rng):
    """Cross-task transfer: task 1 = 0.8 · task 0.  Where task 1 has NO
    data, the ICM posterior for task 1 must still track it (through B
    and task 0's observations); an independent task-1-only GP cannot."""
    n = 96
    x0 = rng.uniform(0, 4, (n, 1))
    # task 1 observed ONLY on [0, 2]
    x1 = rng.uniform(0, 2, (n // 2, 1))
    f = lambda x: np.sin(2 * x.sum(-1))
    y0 = f(x0) + 0.05 * rng.normal(size=n)
    y1 = 0.8 * f(x1) + 0.05 * rng.normal(size=n // 2)
    xa, ya = stack_outputs([x0, x1], [y0, y1])
    xa, ya = jnp.asarray(xa), jnp.asarray(ya)

    kern = ICM(gp.RBF(), n_outputs=2, rank=1) + TaskNoise(2)
    p0 = kern.init_params(xa)
    res = fit_mle(kern, p0, xa, ya, max_iter=150)
    state = exact_gp.factorize(kern, res.params, xa, ya)
    # query task 1 in the UNOBSERVED region (2, 4)
    xq = with_task(np.linspace(2.2, 3.8, 40)[:, None], 1)
    mean, var = exact_gp.predict(kern, state, xq, "diag")
    want = 0.8 * np.sin(2 * np.asarray(xq)[:, 0])
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - want) ** 2)))
    assert rmse < 0.15, rmse

    # baseline: task-1 data alone, same budget
    cov1 = gp.RBF() + gp.WhiteNoise()
    x1j = jnp.asarray(x1)
    y1j = jnp.asarray(y1)
    res1 = fit_mle(cov1, cov1.init_params(x1j), x1j, y1j, max_iter=150)
    st1 = exact_gp.factorize(cov1, res1.params, x1j, y1j)
    m1, _ = exact_gp.predict(kern=cov1, state=st1,
                             xp=jnp.asarray(np.linspace(2.2, 3.8, 40)[:, None]),
                             var="diag")
    rmse1 = float(np.sqrt(np.mean((np.asarray(m1) - want) ** 2)))
    assert rmse < 0.5 * rmse1, (rmse, rmse1)


def test_icm_nlml_fd_gradient(rng):
    """End-to-end FD check of the NLML gradient through the ICM path
    (the AD/jitter-ladder pipeline on augmented inputs)."""
    kern = ICM(gp.RBF(), 2, rank=1) + TaskNoise(2)
    x, y = _aug_data(rng, n_per=10)
    p = jnp.asarray(
        np.abs(np.asarray(kern.init_params(x)))
        + 0.2 * rng.uniform(size=kern.n_params(x.shape[-1]))
    )
    val, grad = jax.value_and_grad(
        lambda q: nlml(kern, q, x, y)
    )(p)
    eps = 1e-6
    for j in range(p.shape[0]):
        fp = float(nlml(kern, p.at[j].add(eps), x, y))
        fm = float(nlml(kern, p.at[j].add(-eps), x, y))
        np.testing.assert_allclose(
            float(grad[j]), (fp - fm) / (2 * eps), rtol=2e-3, atol=1e-6
        )
