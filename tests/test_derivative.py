"""Gradient-enhanced GP (derivative observations) tests.

Oracles: FD of the kernel function pins every autodiff block of the
joint gram; the posterior-mean gradient must equal the derivative of
the posterior mean (both are the same linear functional); information
limits (useless gradients == value-only GP); and the classic win —
few values + gradients beat the same few values alone.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pygpr_tpu import RBF, RationalQuadratic, Sum
from pygpr_tpu.models import derivative
from pygpr_tpu.models import exact_gp, likelihood
from pygpr_tpu.ops.kernels import WhiteNoise


def _f(x):
    return np.sin(2.0 * x[:, 0]) + 0.3 * np.cos(3.0 * x[:, 1])


def _df(x):
    return np.stack(
        [2.0 * np.cos(2.0 * x[:, 0]), -0.9 * np.sin(3.0 * x[:, 1])], -1
    )


@pytest.mark.parametrize(
    "kern", [RBF(), RationalQuadratic(), Sum((RBF(), RBF()))],
    ids=lambda k: type(k).__name__,
)
def test_joint_gram_symmetric_psd_and_fd(kern, rng):
    n, ng, d = 7, 5, 2
    x = jnp.asarray(rng.uniform(size=(n, d)))
    xg = jnp.asarray(rng.uniform(size=(ng, d)))
    p = 0.6 + jnp.asarray(rng.uniform(size=kern.n_params(d)))
    K = np.asarray(derivative.joint_gram(kern, p, x, xg))
    M = n + ng * d
    assert K.shape == (M, M)
    np.testing.assert_allclose(K, K.T, atol=1e-9)
    eig = np.linalg.eigvalsh(K + 1e-9 * np.eye(M))
    assert np.all(eig > -1e-8)

    # FD oracle for the value–gradient and gradient–gradient blocks
    h = 1e-6
    kmat = lambda a, b: np.asarray(
        kern.matrix(p, jnp.asarray(b), jnp.asarray(a))
    )  # rows index a
    i, j, m, l = 2, 1, 0, 1
    a = np.asarray(x[i: i + 1])
    b = np.asarray(xg[j: j + 1])
    bp, bm = b.copy(), b.copy()
    bp[0, m] += h
    bm[0, m] -= h
    fd_fg = (kmat(a, bp) - kmat(a, bm))[0, 0] / (2 * h)
    np.testing.assert_allclose(K[i, n + j * d + m], fd_fg, rtol=1e-5)

    h2 = 1e-4  # double difference: larger h to beat cancellation
    a = np.asarray(xg[i: i + 1])
    ap, am = a.copy(), a.copy()
    ap[0, l] += h2
    am[0, l] -= h2
    bp, bm = b.copy(), b.copy()
    bp[0, m] += h2
    bm[0, m] -= h2
    fd_gg = (
        kmat(ap, bp)[0, 0] - kmat(ap, bm)[0, 0]
        - kmat(am, bp)[0, 0] + kmat(am, bm)[0, 0]
    ) / (4 * h2 * h2)
    np.testing.assert_allclose(
        K[n + i * d + l, n + j * d + m], fd_gg, rtol=1e-4, atol=1e-8
    )


def test_useless_gradients_reduce_to_value_only(rng):
    """σ_g → huge: the gradient rows carry no information and the
    posterior at query points equals the plain exact GP's."""
    n, d = 12, 2
    x = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.asarray(_f(np.asarray(x)))
    xg = jnp.asarray(rng.uniform(size=(4, d)))
    g = jnp.asarray(_df(np.asarray(xg)))
    xq = jnp.asarray(rng.uniform(size=(9, d)))
    p = jnp.asarray([1.0, 1.0, 1.0])
    sf = 1e-2

    st = derivative.factorize(
        RBF(), p, x, y, xg, g, sigma_f=sf, sigma_g=1e6
    )
    mean, var = derivative.predict(RBF(), p, st, x, xg, xq)

    cov = Sum((RBF(), WhiteNoise()))
    pe = jnp.asarray([1.0, 1.0, 1.0, sf])
    ste = exact_gp.factorize(cov, pe, x, y)
    mean_e, var_e = exact_gp.predict(cov, ste, xq, var="diag")
    np.testing.assert_allclose(
        np.asarray(mean), np.asarray(mean_e), atol=1e-6
    )
    # the exact-GP baseline's WhiteNoise adds σ_f² observation noise
    # to the predictive variance; the derivative GP reports latent-f
    # variance — subtract it for a like-for-like comparison
    np.testing.assert_allclose(
        np.asarray(var), np.asarray(var_e) - sf**2, rtol=1e-4, atol=1e-8
    )


def test_posterior_grad_mean_is_derivative_of_mean(rng):
    n, d = 10, 2
    x = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.asarray(_f(np.asarray(x)))
    xg = x[:5]
    g = jnp.asarray(_df(np.asarray(xg)))
    p = jnp.asarray([1.0, 1.3, 0.8])
    st = derivative.factorize(RBF(), p, x, y, xg, g)
    xq = jnp.asarray(rng.uniform(size=(6, d)))
    mean, var, gmean = derivative.predict(
        RBF(), p, st, x, xg, xq, grad_out=True
    )
    assert gmean.shape == (6, d)

    def mean_at(q):
        m, _ = derivative.predict(RBF(), p, st, x, xg, q[None, :])
        return m[0]

    jac = jax.vmap(jax.grad(mean_at))(xq)
    np.testing.assert_allclose(
        np.asarray(gmean), np.asarray(jac), rtol=1e-7, atol=1e-10
    )


def test_gradients_improve_fit(rng):
    """8 values alone vs 8 values + 8 gradients of sin(2x): the
    derivative-conditioned posterior must clearly win."""
    n = 8
    x = np.linspace(0.2, 3.8, n)[:, None]
    y = np.sin(2 * x[:, 0])
    g = (2 * np.cos(2 * x[:, 0]))[:, None]
    xq = np.linspace(0.3, 3.7, 101)[:, None]
    fq = np.sin(2 * xq[:, 0])

    model = derivative.DerivativeGP(x, y, x, g)
    model.train(max_iter=120)
    mean, var, gmean = model.predict(xq, grad_out=True)
    rmse_d = float(np.sqrt(np.mean((np.asarray(mean) - fq) ** 2)))
    grmse = float(np.sqrt(np.mean(
        (np.asarray(gmean)[:, 0] - 2 * np.cos(2 * xq[:, 0])) ** 2
    )))

    cov = Sum((RBF(), WhiteNoise()))
    from pygpr_tpu import fit_mle

    res = fit_mle(
        cov, cov.init_params(jnp.asarray(x)), jnp.asarray(x),
        jnp.asarray(y), max_iter=120,
    )
    ste = exact_gp.factorize(cov, res.params, jnp.asarray(x), jnp.asarray(y))
    mean_e, _ = exact_gp.predict(cov, ste, jnp.asarray(xq), var="diag")
    rmse_v = float(np.sqrt(np.mean((np.asarray(mean_e) - fq) ** 2)))

    assert rmse_d < 0.05, rmse_d
    assert rmse_d < 0.5 * rmse_v, (rmse_d, rmse_v)
    assert grmse < 0.2, grmse
    assert np.isfinite(np.asarray(var)).all()


def test_nlml_fd_gradient(rng):
    """FD check of the joint-system NLML hyperparameter gradient."""
    n, d = 9, 1
    x = jnp.asarray(rng.uniform(0, 3, size=(n, d)))
    y = jnp.asarray(np.sin(2 * np.asarray(x)[:, 0]))
    xg = x[:4]
    g = jnp.asarray(2 * np.cos(2 * np.asarray(xg)))
    p = jnp.asarray([1.1, 0.9])

    f = lambda q: derivative.nlml(RBF(), q, x, y, xg, g)
    grad = np.asarray(jax.grad(f)(p))
    eps = 1e-6
    for k in range(2):
        dp = np.zeros(2)
        dp[k] = eps
        fd = (float(f(p + dp)) - float(f(p - dp))) / (2 * eps)
        np.testing.assert_allclose(grad[k], fd, rtol=1e-4, atol=1e-7)


def test_rejects_noise_kernel():
    with pytest.raises(ValueError):
        derivative.DerivativeGP(
            np.zeros((3, 1)), np.zeros(3), np.zeros((2, 1)),
            np.zeros((2, 1)), kern=Sum((RBF(), WhiteNoise())),
        )
