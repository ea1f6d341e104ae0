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


# ---------------------------------------------------------------------------
# Extended kernel family (beyond-reference: Product, RQ, Periodic, Linear)
# ---------------------------------------------------------------------------

from pygpr_tpu import Linear, Periodic, Product, RationalQuadratic


EXTENDED = (
    RationalQuadratic(),
    Periodic(),
    Linear(),
    Product((RBF(), RBF())),
    Product((Linear(), Periodic())),
    Sum((Product((RBF(), Periodic())), WhiteNoise())),
)


@pytest.mark.parametrize("cov", EXTENDED, ids=lambda c: type(c).__name__)
def test_extended_symmetry_and_psd(cov, rng):
    n, dim = 40, 3
    x = _rand(rng, n, dim)
    hp = 0.5 + _rand(rng, cov.n_params(dim))
    krn = np.asarray(kernel_matrix(cov, hp, x))
    np.testing.assert_allclose(krn, krn.T, atol=1e-10)
    eig = np.linalg.eigvalsh(krn + 1e-7 * np.eye(n))
    assert np.all(eig > -1e-7)


@pytest.mark.parametrize("cov", EXTENDED, ids=lambda c: type(c).__name__)
def test_extended_grad_matches_autodiff(cov, rng):
    n, dim = 20, 2
    x = _rand(rng, n, dim)
    hp = 0.5 + _rand(rng, cov.n_params(dim))
    _, dkrn = kernel_and_grad(cov, hp, x)
    jac = jax.jacfwd(lambda p: kernel_matrix(cov, p, x))(hp)
    np.testing.assert_allclose(
        np.asarray(dkrn), np.moveaxis(np.asarray(jac), -1, 0), atol=1e-9
    )


@pytest.mark.parametrize("cov", EXTENDED, ids=lambda c: type(c).__name__)
def test_extended_diag_and_cross(cov, rng):
    n, m, dim = 25, 9, 3
    x = _rand(rng, n, dim)
    xp = _rand(rng, m, dim)
    hp = 0.5 + _rand(rng, cov.n_params(dim))
    full = np.asarray(kernel_matrix(cov, hp, x))
    from pygpr_tpu import kernel_diag

    np.testing.assert_allclose(
        np.diag(full), np.asarray(kernel_diag(cov, hp, x)), atol=1e-10
    )
    cross = kernel_matrix(cov, hp, x, xp)
    assert cross.shape == (m, n)


def test_product_is_elementwise_product(rng):
    n, dim = 30, 2
    x = _rand(rng, n, dim)
    parts = (RBF(), Periodic())
    cov = Product(parts)
    hp = 0.5 + _rand(rng, cov.n_params(dim))
    krn = np.asarray(kernel_matrix(cov, hp, x))
    expect = np.ones_like(krn)
    off = 0
    for k in parts:
        nh = k.n_params(dim)
        expect = expect * np.asarray(kernel_matrix(k, hp[off:off + nh], x))
        off += nh
    np.testing.assert_allclose(krn, expect, atol=1e-12)
    # operator sugar builds the same object
    assert RBF() * Periodic() == Product((RBF(), Periodic()))
    assert RBF() + Periodic() == Sum((RBF(), Periodic()))


def test_periodic_feature_map_matches_naive(rng):
    """The MXU feature-map form equals the textbook exp-sine-squared."""
    n, m, dim = 22, 7, 3
    x = _rand(rng, n, dim)
    xp = _rand(rng, m, dim)
    cov = Periodic()
    hp = 0.5 + _rand(rng, cov.n_params(dim))
    sig, ls, om = hp[0], hp[1:1 + dim], hp[1 + dim:]
    diff = np.asarray(xp)[:, None, :] - np.asarray(x)[None, :, :]
    s2 = np.sin(np.pi * np.asarray(om) * diff) ** 2
    naive = float(sig) ** 2 * np.exp(
        -2.0 * np.sum(np.asarray(ls) ** 2 * s2, axis=-1)
    )
    krn = np.asarray(kernel_matrix(cov, hp, x, xp))
    np.testing.assert_allclose(krn, naive, atol=1e-10)
    # exactly periodic: shifting x by a whole period changes nothing
    shift = np.zeros(dim); shift[0] = 1.0 / float(om[0])
    krn_shift = np.asarray(
        kernel_matrix(cov, hp, x, xp + jnp.asarray(shift))
    )
    np.testing.assert_allclose(krn_shift, krn, atol=1e-8)


def test_rq_approaches_rbf_at_large_alpha(rng):
    n, dim = 30, 2
    x = _rand(rng, n, dim)
    sig, ls = 1.3, np.asarray([0.7, 1.4])
    hp_rq = jnp.asarray(np.concatenate([[sig, 30.0], ls]))
    hp_rbf = jnp.asarray(np.concatenate([[sig], ls]))
    krq = np.asarray(kernel_matrix(RationalQuadratic(), hp_rq, x))
    krbf = np.asarray(kernel_matrix(RBF(), hp_rbf, x))
    np.testing.assert_allclose(krq, krbf, atol=2e-3)


def test_extended_batched_equals_stacked(rng):
    nc, n, dim = 3, 18, 2
    cov = Sum((Product((RBF(), Periodic())), WhiteNoise()))
    xb = _rand(rng, nc, n, dim)
    hpb = 0.5 + _rand(rng, nc, cov.n_params(dim))
    krn_b, dkrn_b = kernel_and_grad(cov, hpb, xb)
    for i in range(nc):
        k1, dk1 = kernel_and_grad(cov, hpb[i], xb[i])
        np.testing.assert_allclose(np.asarray(krn_b[i]), np.asarray(k1), atol=1e-12)
        np.testing.assert_allclose(np.asarray(dkrn_b[i]), np.asarray(dk1), atol=1e-12)


def test_extended_end_to_end_fit(rng):
    """A periodic signal fit with Periodic beats RBF on extrapolation,
    and the full fit_mle pipeline runs on every extended kernel."""
    from pygpr_tpu import fit_mle, fit_predict

    # 8 observed periods at noise 0.05: enough to identify the
    # frequency (shorter signals admit spiky ℓ local optima where the
    # MLE is honestly ambiguous)
    n = 200
    x = np.sort(rng.uniform(0, 8, (n, 1)), axis=0)
    y = np.sin(2 * np.pi * x[:, 0]) + 0.05 * rng.normal(size=n)
    xs = np.linspace(8.2, 10.0, 40)[:, None]  # extrapolation region
    ys = np.sin(2 * np.pi * xs[:, 0])

    def fit_rmse(cov):
        p0 = cov.init_params(jnp.asarray(x))
        res = fit_mle(
            cov, p0, jnp.asarray(x), jnp.asarray(y), max_iter=100
        )
        mean, _ = fit_predict(
            cov, res.params, jnp.asarray(x), jnp.asarray(y),
            jnp.asarray(xs), var="diag",
        )
        return float(np.sqrt(np.mean((np.asarray(mean) - ys) ** 2)))

    rmse_per = fit_rmse(Sum((Periodic(), WhiteNoise())))
    rmse_rbf = fit_rmse(Sum((RBF(), WhiteNoise())))
    assert rmse_per < 0.1, rmse_per
    assert rmse_per < rmse_rbf


def test_rq_extreme_alpha_finite(rng):
    """α² under/overflow (log-space line searches probe these) must
    saturate smoothly, not NaN (f32 TPU failure mode)."""
    x = jnp.asarray(rng.uniform(size=(30, 2)).astype(np.float32))
    cov = RationalQuadratic()
    for alpha in (1e-15, 1e-3, 1.0, 1e3, 1e15):
        hp = jnp.asarray(np.array([1.0, alpha, 0.8, 1.2], np.float32))
        krn = np.asarray(kernel_matrix(cov, hp, x))
        assert np.isfinite(krn).all(), alpha
        jac = jax.jacfwd(lambda p: kernel_matrix(cov, p, x))(hp)
        assert np.isfinite(np.asarray(jac)).all(), alpha
    # saturation limits: constant at a2→0, RBF at a2→inf
    hp_lo = jnp.asarray(np.array([1.0, 1e-15, 0.8, 1.2], np.float32))
    np.testing.assert_allclose(
        np.asarray(kernel_matrix(cov, hp_lo, x)), 1.0, atol=1e-5
    )
    hp_hi = jnp.asarray(np.array([1.0, 1e15, 0.8, 1.2], np.float32))
    krbf = np.asarray(
        kernel_matrix(RBF(), jnp.asarray(np.array([1.0, 0.8, 1.2], np.float32)), x)
    )
    np.testing.assert_allclose(
        np.asarray(kernel_matrix(cov, hp_hi, x)), krbf, atol=1e-5
    )


def test_arccosine_family():
    """Arc-cosine kernel (Cho & Saul 2009): symmetry, PSD, diagonal
    closed forms, analytic-vs-FD gradients, batched==stacked, and the
    defining Monte-Carlo identity — order-1 equals the infinite-width
    ReLU feature expectation 2·E[relu(wᵀx̃)·relu(wᵀx̃′)]."""
    from pygpr_tpu.ops.kernels import ArcCosine, kernel_matrix

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(30, 3)))
    p = jnp.asarray([1.1, 1.0, 0.8, 1.2])

    for order in (0, 1, 2):
        k = ArcCosine(order)
        K = np.asarray(k.matrix(p, x))
        np.testing.assert_allclose(K, K.T, atol=1e-12)
        assert np.linalg.eigvalsh(K).min() > -1e-9
        np.testing.assert_allclose(
            np.diag(K), np.asarray(k.diag(p, x)), rtol=1e-6
        )
        _, dk = k.matrix_and_grad(p, x)
        eps = 1e-6
        for i in range(4):
            e = jnp.zeros(4).at[i].set(eps)
            fd = (
                np.asarray(k.matrix(p + e, x))
                - np.asarray(k.matrix(p - e, x))
            ) / (2 * eps)
            np.testing.assert_allclose(
                np.asarray(dk[i]), fd, atol=1e-5
            )

    # batched == stacked through the generic vmap path
    xb = jnp.asarray(rng.normal(size=(3, 20, 2)))
    pb = jnp.asarray([[1.0, 1.0, 1.0]] * 3)
    k1 = ArcCosine(1)
    Kb = np.asarray(kernel_matrix(k1, pb, xb))
    for c in range(3):
        np.testing.assert_allclose(
            Kb[c], np.asarray(k1.matrix(pb[c], xb[c])), rtol=1e-12
        )

    # MC identity: k₁(x,x') = 2σ²·E_w[relu(wᵀx̃)relu(wᵀx̃')], w~N(0,I)
    xs = jnp.asarray(rng.normal(size=(6, 3)))
    ls = np.array([1.0, 0.8, 1.2])
    xt = np.asarray(xs) * ls
    w = rng.standard_normal((400_000, 3))
    a = np.maximum(w @ xt.T, 0.0)                 # [S, 6]
    k_mc = 2.0 * 1.1**2 * (a.T @ a) / w.shape[0]
    K = np.asarray(ArcCosine(1).matrix(jnp.asarray([1.1, *ls]), xs))
    np.testing.assert_allclose(K, k_mc, rtol=0.05, atol=0.01)


from pygpr_tpu import Constant, Matern, RationalQuadratic
from pygpr_tpu.ops.kernels import SpectralMixture


@pytest.mark.parametrize(
    "kern",
    [
        RBF(),
        Matern(0.5),
        Matern(1.5),
        Matern(2.5),
        WhiteNoise(),
        Sum((RBF(), WhiteNoise())),
        Sum((Matern(1.5), WhiteNoise())),
        RationalQuadratic(),
        Sum((RationalQuadratic(), WhiteNoise())),
        Product((RBF(), Matern(1.5))),
        Sum((Product((RBF(), RBF())), WhiteNoise())),
        Periodic(),
        Product((RBF(), Periodic())),
        Linear(),
        Sum((RBF(), Constant(), WhiteNoise())),
        Product((Linear(), Periodic())),
        SpectralMixture(2),
        Sum((SpectralMixture(3), WhiteNoise())),
    ],
)
def test_gram_adjoint_matches_vjp(kern, rng):
    """The matvec-shaped analytic gram contraction (the fast-gradient
    tail) equals AD through the gram build for any symmetric adjoint
    — including data WITH coincident points (the clamped-singular
    Matérn-½ regime the zeroed-m diagonal exists for)."""
    from pygpr_tpu.ops.kernels import train_gram

    n, d = 40, 3
    x = rng.uniform(0.0, 2.0, (n, d))
    x[7] = x[3]  # coincident pair
    x = jnp.asarray(x)
    a = rng.standard_normal((n, n))
    abar = jnp.asarray(0.5 * (a + a.T))
    p = jnp.asarray(
        np.abs(rng.uniform(0.5, 1.5, kern.n_params(d)))
    )

    ga = kern.gram_adjoint(p, x, abar)
    assert ga is not None
    _, vjp = jax.vjp(lambda q: train_gram(kern, q, x), p)
    (ref,) = vjp(abar)
    # Matérn-½'s AD reference carries ~1e-8 of ITS OWN noise: the
    # gram diagonal is 0 + fp residue (≤4e-15), so AD multiplies a
    # clamped-singular 1/(2r) ≈ 1e7 by the three-term cancellation noise
    # of d(sqd_ii)/dℓ — the analytic contraction zeroes that diagonal
    # exactly and is the MORE accurate of the two.
    tol = 1e-6 if getattr(kern, "nu", None) == 0.5 or (
        hasattr(kern, "kernels")
        and any(getattr(k, "nu", None) == 0.5 for k in kern.kernels)
    ) else 1e-9
    np.testing.assert_allclose(
        np.asarray(ga), np.asarray(ref), rtol=tol, atol=tol
    )


def test_gram_adjoint_unsupported_returns_none(rng):
    """Kernels without a specialization fall back (None) — including
    combinators with one unsupported child."""
    from pygpr_tpu.ops.kernels import ChangePoint

    x = jnp.asarray(rng.uniform(0, 1, (8, 2)))
    abar = jnp.eye(8)
    cp = ChangePoint(RBF(), RBF())
    assert cp.gram_adjoint(cp.init_params(x), x, abar) is None
    mixed = Sum((RBF(), ChangePoint(RBF(), RBF())))
    assert mixed.gram_adjoint(mixed.init_params(x), x, abar) is None
    prodmix = Product((RBF(), ChangePoint(RBF(), RBF())))
    assert (
        prodmix.gram_adjoint(prodmix.init_params(x), x, abar) is None
    )
