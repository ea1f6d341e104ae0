"""Unit tests for the structured-linalg building blocks in
``ops/linalg.py`` (triangular inverse, triangular syrk) that back the
solve-free NLML gradient.  Reference call sites they replace:
``PyGPR/loss.py:97-116`` (potrf + cholesky_solve pipeline)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pygpr_tpu.ops import linalg


@pytest.mark.parametrize("n", [8, 100, 128, 500, 512, 777, 1024])
def test_syrk_from_tril_matches_dense(n, rng):
    """C = TᵀT for lower-triangular T, any size (even/odd splits)."""
    T = np.tril(rng.standard_normal((n, n)))
    C = np.asarray(linalg.syrk_from_tril(jnp.asarray(T), base=128))
    ref = T.T @ T
    np.testing.assert_allclose(C, ref, rtol=0, atol=1e-10 * np.abs(ref).max())


def test_syrk_from_tril_base_larger_than_n(rng):
    """Tiles ≤ base short-circuit to the dense product."""
    T = np.tril(rng.standard_normal((33, 33)))
    C = np.asarray(linalg.syrk_from_tril(jnp.asarray(T), base=512))
    np.testing.assert_allclose(C, T.T @ T, atol=1e-12)


@pytest.mark.parametrize("n", [64, 300, 512])
def test_tri_inverse_doubling(n, rng):
    A = rng.standard_normal((n, n))
    L = np.linalg.cholesky(A @ A.T + n * np.eye(n))
    T = np.asarray(linalg.tri_inverse_doubling(jnp.asarray(L)))
    np.testing.assert_allclose(T @ L, np.eye(n), atol=1e-9)
