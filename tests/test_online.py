"""Online state extension (``exact_gp.extend_state``).

The reference refactorizes from scratch on any data change
(``PyGPR/gpr.py:65-74``); the block-Cholesky extension must be
refactorize-equivalent: same factor, same weights, same predictions —
including through the serving (T = L⁻¹) layout and the jitter-ladder
rescue.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pygpr_tpu import RBF, Sum, WhiteNoise, extend_state, factorize, predict
from pygpr_tpu.models import exact_gp

COV = Sum((RBF(), WhiteNoise()))


def _data(rng, n, dim=2, scale=1.0):
    x = jnp.asarray(scale * rng.uniform(size=(n, dim)))
    y = jnp.sin(2.0 * x.sum(-1))
    return x, y


@pytest.mark.parametrize("n,k", [(40, 1), (40, 8), (96, 32)])
def test_extend_equals_refactorize(n, k, rng):
    x, y = _data(rng, n + k)
    params = COV.init_params(x)
    st = factorize(COV, params, x[:n], y[:n])
    ext = extend_state(COV, st, x[n:], y[n:])
    ref = factorize(COV, params, x, y)

    # tolerances are f64 roundoff accumulated through the Schur
    # complement (observed max ~6e-12 absolute)
    np.testing.assert_allclose(
        np.asarray(ext.chol), np.asarray(ref.chol), rtol=1e-6, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(ext.weights), np.asarray(ref.weights),
        rtol=1e-6, atol=1e-9,
    )
    assert float(ext.jitter) == float(ref.jitter)

    xq = jnp.asarray(np.random.default_rng(1).uniform(size=(16, 2)))
    mu_e, var_e = predict(COV, ext, xq, "diag")
    mu_r, var_r = predict(COV, ref, xq, "diag")
    np.testing.assert_allclose(
        np.asarray(mu_e), np.asarray(mu_r), rtol=1e-8, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(var_e), np.asarray(var_r), rtol=1e-8, atol=1e-12
    )


def test_sequential_extends(rng):
    """Three successive extensions == one refactorize."""
    x, y = _data(rng, 64)
    params = COV.init_params(x)
    st = factorize(COV, params, x[:16], y[:16])
    for lo, hi in ((16, 32), (32, 48), (48, 64)):
        st = extend_state(COV, st, x[lo:hi], y[lo:hi])
    ref = factorize(COV, params, x, y)
    np.testing.assert_allclose(
        np.asarray(st.chol), np.asarray(ref.chol), rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(st.weights), np.asarray(ref.weights),
        rtol=1e-5, atol=1e-8,
    )


def test_extend_serving_state(rng):
    """A tinv-carrying (serving) state extends GEMM-only and matches a
    freshly prepared serving state."""
    x, y = _data(rng, 72)
    params = COV.init_params(x)
    st = exact_gp.precompute_tinv(factorize(COV, params, x[:48], y[:48]))
    ext = extend_state(COV, st, x[48:], y[48:])
    assert ext.tinv is not None
    # contract is functional (raw T entries amplify the gram's ~1e8
    # condition number): T is a true inverse of the extended factor...
    eye = np.eye(72)
    err = np.abs(np.asarray(ext.tinv @ ext.chol) - eye).max()
    assert err < 1e-8, err
    # ...and the GEMM-only serving predict equals the solve path
    xq = jnp.asarray(np.random.default_rng(3).uniform(size=(16, 2)))
    mu_s, var_s = predict(COV, ext, xq, "diag")
    mu_r, var_r = predict(COV, ext._replace(tinv=None), xq, "diag")
    np.testing.assert_allclose(
        np.asarray(mu_s), np.asarray(mu_r), rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(var_s), np.asarray(var_r), rtol=1e-5, atol=1e-8
    )


def test_extend_batched_committee(rng):
    """Batched extension == per-expert stacked extensions; shared and
    per-expert new blocks both work."""
    nc, n, k, dim = 3, 24, 4, 2
    x = jnp.asarray(rng.uniform(size=(nc, n + k, dim)))
    y = jnp.sin(x.sum(-1))
    params = COV.init_params(x)
    st = factorize(COV, params, x[:, :n], y[:, :n])
    ext = extend_state(COV, st, x[:, n:], y[:, n:])
    for i in range(nc):
        st_i = factorize(COV, params[i], x[i, :n], y[i, :n])
        ext_i = extend_state(COV, st_i, x[i, n:], y[i, n:])
        np.testing.assert_allclose(
            np.asarray(ext.chol[i]), np.asarray(ext_i.chol),
            rtol=1e-9, atol=1e-12,
        )
    # shared [k, d] new block broadcast to every expert
    x_sh = jnp.asarray(rng.uniform(size=(k, dim)))
    y_sh = jnp.sin(x_sh.sum(-1))
    ext_sh = extend_state(COV, st, x_sh, y_sh)
    assert ext_sh.x.shape == (nc, n + k, dim)


def test_extend_duplicate_point_ladder_rescue(rng):
    """Appending an exact duplicate of a training point with a bare RBF
    (singular Schur complement) must go through the ladder, not NaN."""
    cov = RBF()
    x, y = _data(rng, 32)
    params = cov.init_params(x)
    st = factorize(cov, params, x, y)
    ext = extend_state(cov, st, x[:1], y[:1])
    # the 1x1 Schur block collapses to ~jitter: no NaN, no blow-up —
    # finite factor/weights and a sane predict are the contract
    assert np.isfinite(np.asarray(ext.chol)).all()
    assert np.isfinite(np.asarray(ext.weights)).all()
    mu, var = predict(cov, ext, x[:4], "diag")
    assert np.isfinite(np.asarray(mu)).all()
    assert np.all(np.asarray(var) >= 0)


def test_extend_jits(rng):
    x, y = _data(rng, 48)
    params = COV.init_params(x)

    @jax.jit
    def step(x1, y1, x2, y2):
        st = factorize(COV, params, x1, y1)
        return extend_state(COV, st, x2, y2).weights

    w = step(x[:40], y[:40], x[40:], y[40:])
    assert np.isfinite(np.asarray(w)).all()


def test_exactgp_add_data_wrapper(rng):
    """OO path: add_data on a live state == refit on the full data."""
    from pygpr_tpu import ExactGP

    x, y = _data(rng, 60)
    gp = ExactGP(x[:40], y[:40], COV)
    gp.update()
    gp.add_data(x[40:], y[40:])
    mu, var = gp.predict(x, var="diag")

    gp_full = ExactGP(x, y, COV)
    mu_f, var_f = gp_full.predict(x, var="diag")
    np.testing.assert_allclose(
        np.asarray(mu), np.asarray(mu_f), rtol=1e-8, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(var), np.asarray(var_f), rtol=1e-7, atol=1e-10
    )
