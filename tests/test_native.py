"""Native (C++/ctypes) data-layer tests: build, correctness vs the
NumPy fallbacks, and the designs integration."""

import numpy as np
import pytest

from pygpr_tpu import native


def test_native_lib_builds():
    lib = native.get_lib()
    assert lib is not None, "g++ build of data_layer.cpp failed"


def _np_hard_core(cand, min_dist, tol=1e-5):
    m = cand.shape[0]
    mask = np.zeros((m,), bool)
    acc = np.empty_like(cand)
    k = 0
    for i in range(m):
        c = cand[i]
        if k == 0:
            acc[0] = c
            mask[0] = True
            k = 1
            continue
        d = np.sqrt(np.sum((acc[:k] - c) ** 2, axis=-1))
        if np.all(d - min_dist > tol):
            acc[k] = c
            mask[i] = True
            k += 1
    return mask, k


def test_hard_core_matches_numpy(rng):
    cand = rng.uniform(size=(500, 3))
    mask_n, k_n = native.hard_core_accept(cand, 0.15)
    mask_p, k_p = _np_hard_core(cand, 0.15)
    assert k_n == k_p
    np.testing.assert_array_equal(mask_n, mask_p)
    # hard-core property holds
    pts = cand[mask_n]
    d = np.sqrt(
        np.sum((pts[:, None] - pts[None]) ** 2, -1)
    )
    np.fill_diagonal(d, np.inf)
    assert d.min() > 0.15


def test_nearest_center_matches_numpy(rng):
    x = rng.uniform(size=(200, 2))
    xc = rng.uniform(size=(7, 2))
    idx_n = native.nearest_center(x, xc)
    d = (
        np.sum(x**2, -1)[:, None]
        + np.sum(xc**2, -1)[None, :]
        - 2.0 * (x @ xc.T)
    )
    np.testing.assert_array_equal(idx_n, np.argmin(d, 1).astype(np.int32))


def test_sq_dist_matches_numpy(rng):
    x = rng.uniform(size=(50, 4))
    y = rng.uniform(size=(30, 4))
    out = native.sq_dist_matrix(x, y)
    ref = np.sum((x[:, None] - y[None]) ** 2, -1)
    np.testing.assert_allclose(out, ref, atol=1e-12)


def test_designs_use_native(rng):
    """Matern1 through the native path keeps the hard-core property."""
    import jax.numpy as jnp

    from pygpr_tpu.sample import Matern1, euclidean_dist

    s = Matern1(seed=0, max_count=2000)
    x = s.sample(50, jnp.zeros(2), jnp.ones(2))
    d = np.sqrt(np.maximum(np.asarray(euclidean_dist(x, x)), 0))
    np.fill_diagonal(d, np.inf)
    assert d.min() > s.min_dist


def test_native_speedup(rng):
    """The C++ scan should beat the Python loop by a wide margin at
    reference-scale max_count."""
    import time

    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    cand = rng.uniform(size=(5000, 3))
    t0 = time.perf_counter()
    native.hard_core_accept(cand, 0.08)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    _np_hard_core(cand, 0.08)
    t_py = time.perf_counter() - t0
    assert t_native < t_py  # typically 100-1000x
