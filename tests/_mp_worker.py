"""Worker process for the real multi-process distributed test.

Run as:  python tests/_mp_worker.py <process_id> <port>

Two coordinated processes × 2 CPU devices each form a 4-device global
mesh (gloo collectives standing in for DCN).  Each process builds the
same committee from a shared seed, forms global expert-sharded arrays,
and runs the sharded shared fit + psum-aggregated predict.  Process 0
checks the result against the single-host vmapped committee computed
locally — the sharded==batched invariant, now across PROCESS
boundaries (SURVEY.md §5.8: the reference has no distributed layer at
all; this is the multi-host path the TPU build adds).
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pygpr_tpu.parallel.mesh import is_coordinator, make_mesh, multihost_init


def main() -> None:
    pid, port = int(sys.argv[1]), sys.argv[2]
    multihost_init(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2
    assert is_coordinator() == (pid == 0)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import pygpr_tpu as gp
    from pygpr_tpu.models import grbcm
    from pygpr_tpu.parallel import grbcm_fit_sharded, grbcm_predict_sharded

    rng = np.random.default_rng(0)
    nc, n, ng, dim, nq = 4, 16, 12, 2, 15
    xl = jnp.asarray(rng.uniform(size=(nc, n, dim)))
    xg = jnp.asarray(rng.uniform(size=(ng, dim)))
    yl = jnp.sin(xl.sum(-1)) + 0.05 * jnp.asarray(rng.normal(size=(nc, n)))
    yg = jnp.sin(xg.sum(-1)) + 0.05 * jnp.asarray(rng.normal(size=(ng,)))
    xs = jnp.asarray(rng.uniform(size=(nq, dim)))
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    x_aug, y_aug = grbcm.augment(xl, yl, xg, yg)
    p0 = jnp.ones((cov.n_params(dim),), xg.dtype)

    mesh = make_mesh(n_expert=4, n_chain=1)  # 4 global devices, 2 hosts

    def make_global(a, spec):
        sh = NamedSharding(mesh, spec)
        host = np.asarray(a)
        return jax.make_array_from_callback(host.shape, sh, lambda i: host[i])

    g_xa = make_global(x_aug, P("expert"))
    g_ya = make_global(y_aug, P("expert"))
    g_p0l = make_global(
        jnp.broadcast_to(p0, (nc,) + p0.shape), P("expert")
    )
    g_xg, g_yg, g_xs = (make_global(a, P()) for a in (xg, yg, xs))
    g_p0 = make_global(p0, P())

    @jax.jit
    def run(p0, xg, yg, xa, ya, xs):
        params_g, params_l, nlml_g, nlml_l = grbcm_fit_sharded(
            cov, p0, xg, yg, xa, ya, mesh, max_iter=30, shared=True
        )
        mean, var = grbcm_predict_sharded(
            cov, params_g, params_l, xg, yg, xa, ya, xs, mesh
        )
        return mean, var, nlml_l

    mean, var, nlml_l = run(g_p0, g_xg, g_yg, g_xa, g_ya, g_xs)
    mean = np.asarray(mean.addressable_data(0))
    var = np.asarray(var.addressable_data(0))
    assert np.isfinite(mean).all() and (var > 0).all()

    # reference: identical computation single-host (vmapped)
    info, _, _ = grbcm.fit(
        cov, xl, yl, xg, yg, params0=p0, max_iter=30, shared=True
    )
    model = grbcm.GRBCM(xl, yl, xg, yg, cov)
    model.gpg.set_params(info.params_g)
    model.gpl.set_params(info.params_l)
    mean_ref, var_ref = model.predict(xs, var="diag")

    np.testing.assert_allclose(mean, np.asarray(mean_ref), rtol=1e-8)
    np.testing.assert_allclose(var, np.asarray(var_ref), rtol=1e-8)
    print(f"[{pid}] MP-OK", flush=True)


if __name__ == "__main__":
    main()
