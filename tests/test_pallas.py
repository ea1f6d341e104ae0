"""Pallas fused-gram kernel tests (interpret mode on CPU — the
"sanitizer" for hand-written tiles, SURVEY.md §5.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import pygpr_tpu as gp
import pygpr_tpu.ops.pallas_kernels as pk


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    orig = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pk.pl, "pallas_call", interp_call)


def _setup(rng, n=300, dim=3):
    x = jnp.asarray(rng.uniform(0, 2, size=(n, dim)), jnp.float32)
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    p = jnp.asarray([1.2, 0.8, 1.1, 0.9, 0.1], jnp.float32)[: dim + 2]
    return cov, x, p


@pytest.mark.parametrize("n", (256, 300, 513))
def test_fused_matches_xla(n, rng):
    """Fused gram == XLA path, including ragged (non-tile-multiple) n."""
    cov, x, p = _setup(rng, n=n)
    Kr = np.asarray(gp.kernel_matrix(cov, p, x))
    Kf = np.asarray(pk.rbf_noise_gram(p, x))
    np.testing.assert_allclose(Kf, Kr, atol=1e-6)


def test_fused_custom_vjp(rng):
    cov, x, p = _setup(rng)
    gr = jax.grad(lambda q: jnp.sum(jnp.sin(gp.kernel_matrix(cov, q, x))))(p)
    gf = jax.grad(lambda q: jnp.sum(jnp.sin(pk.rbf_noise_gram(q, x))))(p)
    np.testing.assert_allclose(
        np.asarray(gf), np.asarray(gr), rtol=1e-4, atol=1e-3
    )
    # x cotangent too
    xr = jax.grad(
        lambda z: jnp.sum(jnp.cos(gp.kernel_matrix(cov, p, z)))
    )(x)
    xf = jax.grad(lambda z: jnp.sum(jnp.cos(pk.rbf_noise_gram(p, z))))(x)
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xr), rtol=1e-3, atol=1e-3
    )


def test_matcher():
    assert pk.matches_rbf_noise(gp.Sum((gp.RBF(), gp.WhiteNoise())))
    assert not pk.matches_rbf_noise(gp.RBF())
    assert not pk.matches_rbf_noise(gp.Sum((gp.RBF(), gp.RBF())))
    assert not pk.matches_rbf_noise(
        gp.Sum((gp.WhiteNoise(), gp.RBF()))
    )


def test_train_gram_dispatch(rng, monkeypatch):
    """config.use_pallas routes the train gram through the fused kernel
    (forced on for the test via an on_tpu monkeypatch)."""
    from pygpr_tpu.config import Config
    from pygpr_tpu.ops.kernels import train_gram

    monkeypatch.setattr(pk, "on_tpu", lambda: True)
    cov, x, p = _setup(rng)
    cfg = Config(use_pallas=True)
    K1 = np.asarray(train_gram(cov, p, x, cfg))
    K2 = np.asarray(gp.kernel_matrix(cov, p, x))
    np.testing.assert_allclose(K1, K2, atol=1e-6)


# ---------------------------------------------------------------------------
# Blocked Cholesky kernel
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", (64, 128, 300, 512))
def test_cholesky_pallas_matches_lax(n, rng):
    from pygpr_tpu.ops.pallas_cholesky import cholesky_pallas

    A = rng.normal(size=(n, n)).astype(np.float32)
    K = (A @ A.T + n * np.eye(n)).astype(np.float32)
    L = np.asarray(cholesky_pallas(jnp.asarray(K), interpret=True))
    Lref = np.linalg.cholesky(K)
    np.testing.assert_allclose(L, Lref, atol=2e-4 * n)
    # strictly lower-triangular output
    assert np.allclose(np.triu(L, 1), 0.0)


def test_cholesky_pallas_batched(rng):
    from pygpr_tpu.ops.pallas_cholesky import cholesky_pallas

    Ks = []
    for _ in range(3):
        A = rng.normal(size=(96, 96)).astype(np.float32)
        Ks.append(A @ A.T + 96 * np.eye(96, dtype=np.float32))
    Ks = np.stack(Ks)
    Lb = np.asarray(cholesky_pallas(jnp.asarray(Ks), interpret=True))
    for i in range(3):
        np.testing.assert_allclose(
            Lb[i], np.linalg.cholesky(Ks[i]), atol=1e-3
        )


def test_cholesky_pallas_indefinite_nan(rng):
    """Indefinite input must yield NaNs (the jitter-ladder signal)."""
    from pygpr_tpu.ops.pallas_cholesky import cholesky_pallas

    K = -np.eye(128, dtype=np.float32)
    L = np.asarray(cholesky_pallas(jnp.asarray(K), interpret=True))
    assert np.isnan(L).any()


def test_cholesky_pallas_batched_hbm(rng):
    """HBM-streaming batched variant (pivot chain amortized across the
    batch) matches the reference factorization, incl. batch chunking."""
    from pygpr_tpu.ops.pallas_cholesky import cholesky_pallas_batched

    n, nb = 256, 5  # chunking path: chunk size < nb at this n
    Ks = []
    for _ in range(nb):
        A = rng.normal(size=(n, n)).astype(np.float32)
        Ks.append(A @ A.T + n * np.eye(n, dtype=np.float32))
    Ks = np.stack(Ks)
    Lb = np.asarray(
        cholesky_pallas_batched(jnp.asarray(Ks), interpret=True)
    )
    for i in range(nb):
        np.testing.assert_allclose(
            Lb[i], np.linalg.cholesky(Ks[i]), atol=5e-3
        )
        assert np.allclose(np.triu(Lb[i], 1), 0.0)


def test_factorize_batched_pallas_path(rng, monkeypatch):
    """use_pallas committee factorize routes through the batched
    Cholesky (interpret mode) and matches the vmapped default."""
    from pygpr_tpu.config import Config
    from pygpr_tpu.models.exact_gp import factorize

    monkeypatch.setattr(pk, "on_tpu", lambda: True)
    nc, n, dim = 3, 256, 2
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    x = jnp.asarray(rng.uniform(size=(nc, n, dim)), jnp.float32)
    y = jnp.sin(x.sum(-1))
    p = jnp.asarray(np.tile([1.0, 1.0, 1.0, 0.1], (nc, 1)), jnp.float32)

    st_ref = factorize(cov, p, x, y)                    # default vmap
    st_pal = factorize(cov, p, x, y, Config(use_pallas=True))
    np.testing.assert_allclose(
        np.asarray(st_pal.chol), np.asarray(st_ref.chol), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(st_pal.weights), np.asarray(st_ref.weights),
        atol=1e-2, rtol=1e-3,
    )
    assert st_pal.ok.shape == (nc,)


@pytest.mark.parametrize("n", [256, 384, 512])
def test_cholesky_inverse_pallas_interpret(n, rng):
    """Fused (L, T=L⁻¹) kernel vs NumPy, interpret mode (left-looking
    schedule: original-K panels, streamed update, one-DMA T bands)."""
    from pygpr_tpu.ops.pallas_cholesky import cholesky_inverse_pallas

    A = rng.standard_normal((n, n)).astype(np.float32)
    K = (A @ A.T + n * np.eye(n)).astype(np.float32)
    L, T = cholesky_inverse_pallas(jnp.asarray(K), interpret=True)
    L, T = np.asarray(L), np.asarray(T)
    Lr = np.linalg.cholesky(K.astype(np.float64))
    np.testing.assert_allclose(L, Lr, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(T @ Lr, np.eye(n), atol=5e-3)
    assert np.all(np.triu(L, 1) == 0.0)
    assert np.all(np.triu(T, 1) == 0.0)


def test_cholesky_inverse_pallas_indefinite_nan(rng):
    """Indefinite input must surface NaNs — the ladder's retry signal."""
    from pygpr_tpu.ops.pallas_cholesky import cholesky_inverse_pallas

    K = -np.eye(256, dtype=np.float32)
    L, _ = cholesky_inverse_pallas(jnp.asarray(K), interpret=True)
    assert not np.isfinite(np.asarray(L)).all()


@pytest.mark.parametrize("n", [1024, 1536])
def test_cholesky_inverse_rolled_interpret(n, rng):
    """Rolled-loop fused (L, T=L⁻¹) kernel (traced panel fori_loop,
    absolute-grid streams, masked junk lanes) vs NumPy, interpret
    mode — the large-n variant whose Mosaic compile is flat in n."""
    from pygpr_tpu.ops.pallas_cholesky import (
        cholesky_inverse_pallas_rolled,
    )

    A = rng.standard_normal((n, n)).astype(np.float32)
    K = (A @ A.T + n * np.eye(n)).astype(np.float32)
    L, T = cholesky_inverse_pallas_rolled(jnp.asarray(K), interpret=True)
    L, T = np.asarray(L), np.asarray(T)
    Lr = np.linalg.cholesky(K.astype(np.float64))
    np.testing.assert_allclose(L, Lr, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(T @ Lr, np.eye(n), atol=5e-3)
    assert np.all(np.triu(L, 1) == 0.0)
    assert np.all(np.triu(T, 1) == 0.0)


def test_cholesky_inverse_rolled_indefinite_nan(rng):
    """Indefinite input must surface NaNs through the rolled kernel —
    the jitter ladder's retry signal."""
    from pygpr_tpu.ops.pallas_cholesky import (
        cholesky_inverse_pallas_rolled,
    )

    K = -np.eye(1024, dtype=np.float32)
    L, _ = cholesky_inverse_pallas_rolled(jnp.asarray(K), interpret=True)
    assert not np.isfinite(np.asarray(L)).all()


def test_rolled_dispatch_boundaries():
    """Dispatch contract: unrolled kernel ≤ MAX_FUSED_N; rolled for
    larger 512-multiples up to MAX_ROLLED_N; anything else → the XLA
    fallback in ops/linalg (which requires no kernel support)."""
    from pygpr_tpu.ops.pallas_cholesky import (
        MAX_FUSED_N,
        MAX_ROLLED_N,
        _rolled_supported,
    )

    assert not _rolled_supported(MAX_FUSED_N)          # unrolled regime
    assert _rolled_supported(6144)
    assert _rolled_supported(8192)
    assert _rolled_supported(MAX_ROLLED_N)
    assert not _rolled_supported(5760)                 # not 512-aligned
    assert not _rolled_supported(MAX_ROLLED_N + 512)   # VMEM cap
