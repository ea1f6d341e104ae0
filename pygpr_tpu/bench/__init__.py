"""Benchmark harness (BASELINE.md metrics).

Measures the three headline quantities on whatever devices are
attached:

  * :func:`bench_lml_grad` — LML-gradient evaluations/s (the optimizer
    inner loop, reference stack SURVEY.md §3.2).
  * :func:`bench_predictions` — grBCM predictions/s (committee predict
    + β-aggregation throughput).
  * :func:`weak_scaling` — weak-scaling efficiency of expert-sharded
    grBCM prediction over a mesh: per-device work held constant while
    devices grow; efficiency = t(1) / t(D).

``python -m pygpr_tpu.bench`` prints all three as JSON lines.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _timeit(f, *args, reps: int = 20) -> float:
    """Median-free steady-state seconds/call (compile excluded)."""
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def _synth(n: int, dim: int, dtype, seed: int = 42):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.0, 2.0, size=(n, dim)).astype(dtype)
    y = (np.sin(2.0 * x.sum(-1)) + 0.1 * rng.normal(size=n)).astype(dtype)
    return jnp.asarray(x), jnp.asarray(y)


def bench_lml_grad(
    n: int = 2048, dim: int = 3, reps: int = 30, dtype=np.float32
) -> float:
    """LML-gradient evals/s on the default backend."""
    import pygpr_tpu as gp

    x, y = _synth(n, dim, dtype)
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    p = jnp.asarray(
        np.concatenate([np.ones(dim + 1), [0.1]]).astype(dtype)
    )
    vg = jax.jit(lambda p: gp.nlml_value_and_grad(cov, p, x, y))
    return 1.0 / _timeit(vg, p, reps=reps)


def bench_predictions(
    nc: int = 16,
    nls: int = 512,
    ng: int = 256,
    n_query: int = 4096,
    dim: int = 2,
    reps: int = 10,
    dtype=np.float32,
) -> float:
    """grBCM predictions/s (diag) through the batched committee path."""
    import pygpr_tpu as gp
    from pygpr_tpu.models import exact_gp, grbcm

    rng = np.random.default_rng(0)
    xl = rng.uniform(0, 4, (nc, nls, dim)).astype(dtype)
    yl = np.sin(xl.sum(-1)).astype(dtype)
    xg = rng.uniform(0, 4, (ng, dim)).astype(dtype)
    yg = np.sin(xg.sum(-1)).astype(dtype)
    xs = rng.uniform(0, 4, (n_query, dim)).astype(dtype)
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    x_aug, y_aug = grbcm.augment(
        jnp.asarray(xl), jnp.asarray(yl), jnp.asarray(xg), jnp.asarray(yg)
    )
    pg = cov.init_params(jnp.asarray(xg))
    pl_ = cov.init_params(x_aug)

    def run(xs):
        sg = exact_gp.factorize(cov, pg, jnp.asarray(xg), jnp.asarray(yg))
        sl = exact_gp.factorize(cov, pl_, x_aug, y_aug)
        res = grbcm.predict(cov, pg, pl_, sg, sl, xs, "diag")
        return res.mean

    f = jax.jit(run)
    return n_query / _timeit(f, jnp.asarray(xs), reps=reps)


def weak_scaling(
    device_counts: Sequence[int] = (1, 2, 4, 8),
    per_device_experts: int = 2,
    nls: int = 256,
    ng: int = 128,
    n_query: int = 1024,
    dim: int = 2,
    dtype=np.float32,
) -> dict:
    """Weak-scaling efficiency of expert-sharded grBCM predict.

    Per-device work is fixed (``per_device_experts`` experts each);
    ideal scaling keeps wall time flat as devices grow.  Returns
    ``{D: {"time_s", "efficiency"}}``.

    Only meaningful on real multi-device hardware: on
    ``xla_force_host_platform_device_count`` *virtual* devices all
    shards share one CPU, so efficiency trends to 1/D by construction.
    """
    import pygpr_tpu as gp
    from pygpr_tpu.models import grbcm
    from pygpr_tpu.parallel import grbcm_predict_sharded, make_mesh

    rng = np.random.default_rng(0)
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    xg = rng.uniform(0, 4, (ng, dim)).astype(dtype)
    yg = np.sin(xg.sum(-1)).astype(dtype)
    xs = rng.uniform(0, 4, (n_query, dim)).astype(dtype)

    out = {}
    t1 = None
    for d in device_counts:
        if d > len(jax.devices()):
            break
        nc = d * per_device_experts
        xl = rng.uniform(0, 4, (nc, nls, dim)).astype(dtype)
        yl = np.sin(xl.sum(-1)).astype(dtype)
        x_aug, y_aug = grbcm.augment(
            jnp.asarray(xl), jnp.asarray(yl),
            jnp.asarray(xg), jnp.asarray(yg),
        )
        pg = cov.init_params(jnp.asarray(xg))
        pl_ = cov.init_params(x_aug)
        mesh = make_mesh(n_expert=d, n_chain=1)
        f = jax.jit(
            lambda pl__, xa, ya, q: grbcm_predict_sharded(
                cov, pg, pl__, jnp.asarray(xg), jnp.asarray(yg),
                xa, ya, q, mesh,
            )
        )
        t = _timeit(f, pl_, x_aug, y_aug, jnp.asarray(xs), reps=5)
        if t1 is None:
            t1 = t
        out[d] = {"time_s": t, "efficiency": t1 / t}
    return out


def main():
    import json

    print(
        json.dumps(
            {
                "metric": "lml_grad_evals_per_s_n2048",
                "value": round(bench_lml_grad(), 2),
                "unit": "evals/s",
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "grbcm_predictions_per_s_16x512",
                "value": round(bench_predictions(), 1),
                "unit": "predictions/s",
            }
        )
    )
    ws = weak_scaling()
    print(
        json.dumps(
            {
                "metric": "weak_scaling_efficiency",
                "value": {str(k): round(v["efficiency"], 3) for k, v in ws.items()},
                "unit": "t1/tD",
            }
        )
    )


if __name__ == "__main__":
    main()
