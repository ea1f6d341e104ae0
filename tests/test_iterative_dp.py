"""Row-parallel iterative exact GP: sharded == single-device.

The mesh matvec from ``parallel/iterative_dp.py`` must be numerically
identical to the single-device blocked matvec, and everything built on
top of it (CG inside the NLML estimator, the SLQ logdet, the Hutchinson
gradient, the Adam fit) must reproduce the single-device results —
pattern 5 of the reference test strategy (SURVEY.md §4) generalized to
the mesh, as in tests/test_parallel.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

import pygpr_tpu as gp
from pygpr_tpu.models import iterative
from pygpr_tpu.parallel import make_mesh
from pygpr_tpu.parallel.iterative_dp import (
    fit_dp,
    make_matvec_dp,
    nlml_value_and_grad_dp,
)


def make_data(rng, n, dim=2, noise=0.1):
    x = rng.uniform(0.0, 3.0, (n, dim))
    y = np.sin(2.0 * x.sum(-1)) + noise * rng.normal(size=n)
    return jnp.asarray(x), jnp.asarray(y)


def test_matvec_dp_equals_single(rng):
    mesh = make_mesh(n_expert=8)
    # n deliberately NOT divisible by 8 to exercise row padding
    n = 403
    x, _ = make_data(rng, n)
    params = jnp.asarray([1.2, 0.8, 1.1, 0.3])
    v = jnp.asarray(rng.normal(size=(n, 3)))

    mv = make_matvec_dp(gp.RBF(), x, mesh, block=64)
    ref = iterative.gram_matvec(gp.RBF(), params, x, v, block=64)
    np.testing.assert_allclose(mv(params, v), ref, rtol=1e-12, atol=1e-12)
    # vector form through the same path
    np.testing.assert_allclose(
        mv(params, v[:, 0]), ref[:, 0], rtol=1e-12, atol=1e-12
    )


def test_matvec_dp_is_differentiable(rng):
    mesh = make_mesh(n_expert=8)
    n = 96
    x, _ = make_data(rng, n)
    params = jnp.asarray([1.1, 0.9, 1.0, 0.25])
    v = jnp.asarray(rng.normal(size=n))
    mv = make_matvec_dp(gp.RBF(), x, mesh, block=32)

    f_dp = lambda p: jnp.sum(mv(p, v) * v)
    f_1d = lambda p: jnp.sum(
        iterative.gram_matvec(gp.RBF(), p, x, v, block=32) * v
    )
    np.testing.assert_allclose(
        jax.grad(f_dp)(params), jax.grad(f_1d)(params),
        rtol=1e-10, atol=1e-12,
    )


def test_nlml_dp_equals_single(rng):
    mesh = make_mesh(n_expert=8)
    n = 240
    x, y = make_data(rng, n)
    params = jnp.asarray([1.1, 0.9, 1.2, 0.25])
    probes = jnp.asarray(iterative.make_probes(n, 16, seed=5), x.dtype)

    kw = dict(rank=40, num_lanczos=15, cg_tol=1e-10, max_cg=400, block=64)
    v_dp, g_dp = nlml_value_and_grad_dp(
        gp.RBF(), params, x, y, probes, mesh, **kw
    )
    v_1, g_1 = iterative.nlml_value_and_grad(
        gp.RBF(), params, x, y, probes, **kw
    )
    np.testing.assert_allclose(float(v_dp), float(v_1), rtol=1e-9)
    np.testing.assert_allclose(g_dp, g_1, rtol=1e-7, atol=1e-10)


def test_fit_dp_equals_single(rng):
    mesh = make_mesh(n_expert=8)
    n = 160
    x, y = make_data(rng, n, dim=1)
    probes = jnp.asarray(iterative.make_probes(n, 8, seed=2), x.dtype)
    p0 = iterative.init_params(gp.RBF(), x)

    kw = dict(
        rank=32, cg_tol=1e-8, max_cg=300, block=32,
        learning_rate=0.1, iters=25,
    )
    params_dp, trace_dp = fit_dp(gp.RBF(), p0, x, y, probes, mesh, **kw)
    params_1, trace_1 = iterative.fit(gp.RBF(), p0, x, y, probes, **kw)
    np.testing.assert_allclose(params_dp, params_1, rtol=1e-6)
    np.testing.assert_allclose(trace_dp, trace_1, rtol=1e-6, atol=1e-8)
    assert float(trace_dp[-1]) < float(trace_dp[0])
