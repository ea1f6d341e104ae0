"""Data-parallel SKI statistics (``parallel/ski_dp.py``).

Invariant: sharded == single-device (SURVEY.md §4 pattern 5
generalized), including ragged n (zero-weight padding), and the full
direct-path fit on sharded statistics reproduces the single-device
fit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pygpr_tpu.models import ski
from pygpr_tpu.parallel.mesh import make_mesh
from pygpr_tpu.parallel.ski_dp import compute_stats_dp

KERN = None


def setup_module(module):
    global KERN
    from pygpr_tpu.ops.kernels import RBF

    module.KERN = RBF()


@pytest.mark.parametrize("n", [1024, 1000])  # even and ragged
def test_stats_sharded_equals_single(n, rng):
    x = rng.uniform(0.0, 4.0, size=(n, 1))
    y = jnp.asarray(np.sin(2.0 * x[:, 0]) + 0.1 * rng.normal(size=n))
    grid = ski.make_grid(x, 64)
    ref = ski.compute_stats(x, y, grid)
    mesh = make_mesh(n_expert=8, n_chain=1)
    got = compute_stats_dp(x, y, grid, mesh)
    assert got.n == ref.n == n
    np.testing.assert_allclose(np.asarray(got.z), np.asarray(ref.z),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.wty),
                               np.asarray(ref.wty),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(float(got.yty), float(ref.yty),
                               rtol=1e-12)


def test_fit_direct_on_sharded_stats(rng):
    """End to end: the O(G³) replicated solve on psum'd statistics
    lands on the single-device optimum."""
    n = 2000
    x = np.sort(rng.uniform(0.0, 4.0, size=(n, 1)), axis=0)
    y = jnp.asarray(np.sin(2.0 * x[:, 0]) + 0.1 * rng.normal(size=n))
    grid = ski.make_grid(x, 128)
    mesh = make_mesh(n_expert=8, n_chain=1)
    stats_dp = compute_stats_dp(x, y, grid, mesh)
    res_dp = ski.fit_direct(KERN, jnp.ones(3), x, y, grid,
                            stats=stats_dp)
    res_1 = ski.fit_direct(KERN, jnp.ones(3), x, y, grid)
    np.testing.assert_allclose(np.asarray(res_dp.params),
                               np.asarray(res_1.params), rtol=1e-5)
    np.testing.assert_allclose(float(res_dp.value),
                               float(res_1.value), rtol=1e-8)
