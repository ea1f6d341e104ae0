"""Data-parallel SGPR (GSPMD path): sharded == single-device, and the
wire traffic is O(m²) independent of n (the weak-scaling property).

Unlike the shard_map committee layer, the SGPR data-parallel path has
no hand-written collectives — XLA partitions the [m, n] statistics
GEMMs from sharding annotations alone.  These tests pin down that (a)
the partitioned program computes the same value/gradient/fit/predict
as the single-device one, and (b) the compiled all-reduce volume does
not grow with n.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pygpr_tpu as gp
from pygpr_tpu.models import sgpr
from pygpr_tpu.parallel import (
    make_mesh,
    sgpr_fit_dp,
    sgpr_neg_elbo_dp,
    sgpr_predict_dp,
)

from tests.test_comm_volume import _collective_bytes


def _data(rng, n=512, dim=2, m=16):
    x = rng.uniform(0.0, 3.0, (n, dim))
    y = np.sin(2.0 * x.sum(-1)) + 0.1 * rng.normal(size=n)
    z = jnp.asarray(sgpr.init_inducing(x, m, seed=1))
    params = jnp.asarray(np.r_[rng.uniform(0.5, 1.5, dim + 1), 0.3])
    return jnp.asarray(x), jnp.asarray(y), z, params


def test_dp_value_and_grad_equal_single_device(rng):
    x, y, z, params = _data(rng)
    mesh = make_mesh(n_expert=8, n_chain=1)

    ref = sgpr.neg_elbo(gp.RBF(), params, x, y, z)
    val = sgpr_neg_elbo_dp(gp.RBF(), params, x, y, z, mesh)
    np.testing.assert_allclose(val, ref, rtol=1e-12)

    # gradient w.r.t. replicated params through the sharded data axis:
    # XLA transposes its own collectives — no custom_vjp plumbing.
    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(x, NamedSharding(mesh, P("expert")))
    ys = jax.device_put(y, NamedSharding(mesh, P("expert")))
    g_ref = jax.grad(
        lambda p: sgpr.neg_elbo(gp.RBF(), p, x, y, z)
    )(params)
    g_dp = jax.jit(
        jax.grad(lambda p, xx, yy: sgpr.neg_elbo(gp.RBF(), p, xx, yy, z))
    )(params, xs, ys)
    np.testing.assert_allclose(g_dp, g_ref, rtol=1e-9, atol=1e-12)


def test_dp_fit_matches_single_device(rng):
    x, y, z, _ = _data(rng, n=512, m=12)
    p0 = sgpr.init_params(gp.RBF(), x)
    mesh = make_mesh(n_expert=8, n_chain=1)

    res_1, _ = sgpr.fit(gp.RBF(), p0, x, y, z, max_iter=80)
    res_dp, _ = sgpr_fit_dp(gp.RBF(), p0, x, y, z, mesh, max_iter=80)
    # identical optimum; trajectories may differ microscopically from
    # all-reduce summation order
    np.testing.assert_allclose(
        res_dp.value, res_1.value, rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        np.abs(res_dp.params), np.abs(res_1.params), rtol=1e-3
    )


def test_dp_predict_matches_single_device(rng):
    x, y, z, params = _data(rng)
    xs = jnp.asarray(rng.uniform(0.0, 3.0, (64, 2)))
    mesh = make_mesh(n_expert=8, n_chain=1)

    st = sgpr.factorize(gp.RBF(), params, x, y, z)
    mean_1, var_1 = sgpr.predict(gp.RBF(), st, xs, var="diag")
    mean_dp, var_dp = sgpr_predict_dp(gp.RBF(), st, xs, mesh)
    np.testing.assert_allclose(mean_dp, mean_1, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(var_dp, var_1, rtol=1e-10, atol=1e-12)

    with pytest.raises(ValueError):
        sgpr_predict_dp(gp.RBF(), st, xs, mesh, var="full")


def test_dp_collective_volume_independent_of_n(rng):
    """Weak-scaling evidence: the all-reduced tensors are the [m, m]
    statistic + m/scalar sums — growing n (per-device work) must not
    grow the bytes on the wire."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(n_expert=8, n_chain=1)
    m = 16

    def compiled_bytes(n):
        x, y, z, params = _data(rng, n=n, m=m)
        xs = jax.device_put(x, NamedSharding(mesh, P("expert")))
        ys = jax.device_put(y, NamedSharding(mesh, P("expert")))
        f = jax.jit(
            jax.value_and_grad(
                lambda p, xx, yy: sgpr.neg_elbo(gp.RBF(), p, xx, yy, z)
            )
        )
        hlo = f.lower(params, xs, ys).compile().as_text()
        return _collective_bytes(hlo)

    b_small, b_large = compiled_bytes(256), compiled_bytes(1024)
    assert b_small > 0  # the statistics really are all-reduced
    assert b_large <= b_small * 1.05  # O(m²), not O(n)
