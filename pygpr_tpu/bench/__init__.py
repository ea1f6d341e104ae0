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


# ---------------------------------------------------------------------------
# BASELINE-scale artifacts (configs 4 and 5)
# ---------------------------------------------------------------------------


def bench_large_n(
    nc: int = 16,
    nls: int = 6144,
    ng: int = 256,
    n_query: int = 8192,
    dim: int = 2,
    fit_iters: int = 15,
    seed: int = 0,
) -> dict:
    """BASELINE config 4: grBCM at N≈100k (16 experts) on ONE chip.

    Streams experts (``lax.map``) so peak memory is one 6.4k² gram;
    the shared joint fit uses the ``nlml_fast`` custom-VJP objective so
    reverse-mode through the stream stores only nhp floats per expert.
    Returns factorize time, predictions/s, RMSE and NLPD vs held-out
    noisy targets as a dict (printed as JSON by ``__main__``).
    """
    import time

    import pygpr_tpu as gp
    from pygpr_tpu.models import exact_gp, grbcm

    rng = np.random.default_rng(seed)
    n_total = nc * nls

    def f(x):
        return np.sin(2.0 * x.sum(-1)) + 0.5 * np.cos(5.0 * x[..., 0])

    xl = rng.uniform(0, 4, (nc, nls, dim)).astype(np.float32)
    yl = (f(xl) + 0.1 * rng.normal(size=(nc, nls))).astype(np.float32)
    xg = rng.uniform(0, 4, (ng, dim)).astype(np.float32)
    yg = (f(xg) + 0.1 * rng.normal(size=ng)).astype(np.float32)
    xs = rng.uniform(0, 4, (n_query, dim)).astype(np.float32)
    ys_true = f(xs)
    ys_noisy = (ys_true + 0.1 * rng.normal(size=n_query)).astype(
        np.float32
    )
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))

    # --- shared joint fit (streamed) --------------------------------
    t0 = time.perf_counter()
    # segment_iters: a remote-tunnel watchdog kills single device
    # executions past ~200 s; 3 iters ≈ 40 s keeps 5× margin
    info, x_aug, y_aug = grbcm.fit(
        cov,
        jnp.asarray(xl), jnp.asarray(yl),
        jnp.asarray(xg), jnp.asarray(yg),
        max_iter=fit_iters, shared=True, stream=True, segment_iters=3,
    )
    params_g = np.asarray(info.params_g)
    params_l = np.asarray(info.params_l)
    fit_s = time.perf_counter() - t0

    # --- factorize (streamed) ---------------------------------------
    def factorize_all(pg, pl, xa, ya, xg_, yg_):
        sg = exact_gp.factorize(cov, pg, xg_, yg_)
        sl = exact_gp.factorize(cov, pl, xa, ya, stream=True)
        return sg, sl

    fac = jax.jit(factorize_all)
    sg, sl = fac(
        jnp.asarray(params_g), jnp.asarray(params_l),
        x_aug, y_aug, jnp.asarray(xg), jnp.asarray(yg),
    )
    jnp.sum(sl.chol[..., 0, 0]).item()  # compiled + done
    t0 = time.perf_counter()
    sg, sl = fac(
        jnp.asarray(params_g), jnp.asarray(params_l),
        x_aug, y_aug, jnp.asarray(xg), jnp.asarray(yg),
    )
    jnp.sum(sl.chol[..., 0, 0]).item()
    factorize_s = time.perf_counter() - t0

    # --- predict (streamed, diag) -----------------------------------
    # the states hold the 16x6400^2 Cholesky stack (2.6 GB) — they must
    # be jit ARGUMENTS; closing over them embeds them as compile-time
    # constants and stalls lowering over the remote tunnel
    def predict_q(pg, pl, sg_, sl_, q):
        res = grbcm.predict(
            cov, pg, pl, sg_, sl_, q, "diag", stream=True,
        )
        return res.mean, res.covar

    pq = jax.jit(predict_q)
    pg_j, pl_j = jnp.asarray(params_g), jnp.asarray(params_l)
    xs_j = jnp.asarray(xs)
    mean, var = pq(pg_j, pl_j, sg, sl, xs_j)
    jnp.sum(mean).item()
    t0 = time.perf_counter()
    mean, var = pq(pg_j, pl_j, sg, sl, xs_j)
    jnp.sum(mean).item()
    predict_s = time.perf_counter() - t0

    # --- serving mode: one-time T = L⁻¹, then GEMM-only predicts ----
    prep = jax.jit(
        lambda s: exact_gp.precompute_tinv(s, stream=True)
    )
    sg_t = jax.block_until_ready(jax.jit(exact_gp.precompute_tinv)(sg))
    t0 = time.perf_counter()
    sl_t = prep(sl)
    jnp.sum(sl_t.tinv[..., 0, 0]).item()
    precompute_s = time.perf_counter() - t0
    mean_t, var_t = pq(pg_j, pl_j, sg_t, sl_t, xs_j)
    jnp.sum(mean_t).item()
    t0 = time.perf_counter()
    mean_t, var_t = pq(pg_j, pl_j, sg_t, sl_t, xs_j)
    jnp.sum(mean_t).item()
    serve_predict_s = time.perf_counter() - t0

    mean, var = np.asarray(mean), np.asarray(var)
    err = mean - ys_noisy
    rmse_true = float(np.sqrt(np.mean((mean - ys_true) ** 2)))
    nlpd = float(
        np.mean(0.5 * np.log(2 * np.pi * var) + err**2 / (2 * var))
    )
    # per-query flop math for the README row: each query costs, per
    # expert, one kernel row (n_aug·d) + the amortized share of the
    # n_aug²·n_query solve pair => ~2·(nc·n_aug² + ng²) flops/query.
    n_aug = nls + ng
    flops_per_query = 2.0 * (nc * n_aug**2 + ng**2)
    return {
        "metric": "grbcm_large_n_single_chip",
        "n_total": n_total,
        "experts": nc,
        "n_aug": n_aug,
        "fit_s": round(fit_s, 2),
        "fit_iters": fit_iters,
        "factorize_s": round(factorize_s, 3),
        "predict_s": round(predict_s, 3),
        "predictions_per_s": round(n_query / predict_s, 1),
        "serving_precompute_s": round(precompute_s, 3),
        "serving_predict_s": round(serve_predict_s, 3),
        "serving_predictions_per_s": round(n_query / serve_predict_s, 1),
        "flops_per_query": flops_per_query,
        "rmse_vs_true": round(rmse_true, 4),
        "nlpd": round(nlpd, 3),
        "params_shared": [round(float(v), 4) for v in params_l[0]],
    }


def million_point_mesh_run(
    nc: int = 2000,
    nls: int = 500,
    ng: int = 128,
    n_query: int = 256,
    dim: int = 2,
    fit_iters: int = 3,
    seed: int = 0,
) -> dict:
    """BASELINE config 5 correctness artifact: grBCM at N=1,000,000
    with experts sharded over the available device mesh (8 virtual CPU
    devices in the committed run), exercising the sharded shared fit +
    psum aggregation end-to-end on a tiny query set.

    This is a CORRECTNESS run (the code path at scale), not a perf
    claim: virtual devices share one CPU.  On a real pod the same call
    runs unchanged with experts over ICI.
    """
    import pygpr_tpu as gp
    from pygpr_tpu.models import grbcm
    from pygpr_tpu.parallel import (
        grbcm_fit_sharded,
        grbcm_predict_sharded,
        make_mesh,
    )

    n_dev = len(jax.devices())
    assert nc % n_dev == 0
    rng = np.random.default_rng(seed)
    n_total = nc * nls

    def f(x):
        return np.sin(2.0 * x.sum(-1))

    xl = rng.uniform(0, 4, (nc, nls, dim)).astype(np.float32)
    yl = (f(xl) + 0.1 * rng.normal(size=(nc, nls))).astype(np.float32)
    xg = rng.uniform(0, 4, (ng, dim)).astype(np.float32)
    yg = (f(xg) + 0.1 * rng.normal(size=ng)).astype(np.float32)
    xs = rng.uniform(0, 4, (n_query, dim)).astype(np.float32)
    ys_true = f(xs)
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))

    x_aug, y_aug = grbcm.augment(
        jnp.asarray(xl), jnp.asarray(yl), jnp.asarray(xg), jnp.asarray(yg)
    )
    p0 = jnp.ones((cov.n_params(dim),), jnp.float32)
    mesh = make_mesh(n_expert=n_dev, n_chain=1)

    import time

    t0 = time.perf_counter()
    params_g, params_l, nlml_g, nlml_l = jax.jit(
        lambda *a: grbcm_fit_sharded(
            cov, *a, mesh, max_iter=fit_iters, shared=True
        )
    )(p0, jnp.asarray(xg), jnp.asarray(yg), x_aug, y_aug)
    mean, var = jax.jit(
        lambda *a: grbcm_predict_sharded(cov, *a, mesh)
    )(params_g, params_l, jnp.asarray(xg), jnp.asarray(yg),
      x_aug, y_aug, jnp.asarray(xs))
    mean, var = np.asarray(mean), np.asarray(var)
    wall = time.perf_counter() - t0

    assert np.isfinite(mean).all() and np.isfinite(var).all()
    assert (var > 0).all()
    rmse = float(np.sqrt(np.mean((mean - ys_true) ** 2)))
    return {
        "metric": "grbcm_million_point_mesh",
        "n_total": n_total,
        "experts": nc,
        "devices": n_dev,
        "fit_iters": fit_iters,
        "wall_s": round(wall, 1),
        "rmse_vs_true": round(rmse, 4),
        "all_finite": True,
        "nlml_sum": round(float(np.sum(np.asarray(nlml_l))), 1),
    }


def bench_grbcm_million_serving(
    nc: int = 2000,
    nls: int = 500,
    ng: int = 128,
    nq: int = 4096,
    dim: int = 2,
    chunk: int = 100,
    reps: int = 3,
    rounds: int = 4,
    seed: int = 0,
    return_posterior: bool = False,
) -> dict:
    """BASELINE config 5, single-chip half: grBCM serving throughput at
    N = nc·nls = 1,000,000 training points on ONE chip.

    The reference's dense path cannot hold N=1M at all (8 TB gram); the
    committee splits it into ``nc`` augmented experts of
    ``n_aug = ng + nls`` each.  Serving layout (``exact_gp.GPState``
    with ``tinv``): every expert's ``T = L⁻¹`` and ``w = K⁻¹y`` are
    precomputed ONCE in chunks (the one-time factorization sweep), then
    each query batch is GEMM-only — per expert one cross-gram
    ``[nq, n_aug]`` + one ``T·K*ᵀ`` MXU GEMM — streamed over expert
    chunks with ``lax.scan`` so the transient is one chunk's
    ``[chunk, nq, n_aug]`` and the β-precision aggregation
    (``models/grbcm.aggregate`` semantics, ``gr_bcm.py:116-149``
    incl. the pinned communication expert β₁=1) accumulates in
    O(nq) carries.

    Device-resident state between batches: ``T`` for all experts
    (nc·n_aug² f32 ≈ 3.2 GB at the defaults) + weights + inputs —
    sized for a 16 GB chip.  Every per-call device execution is well
    under remote-runtime watchdogs (~0.5 s).
    """
    import pygpr_tpu as gp
    from pygpr_tpu.models import exact_gp
    from pygpr_tpu.ops import linalg
    from pygpr_tpu.ops.kernels import train_gram

    assert nc % chunk == 0
    n_aug = ng + nls
    nch = nc // chunk
    rng = np.random.default_rng(seed)

    def f(x):
        return np.sin(2.0 * x.sum(-1))

    xl = rng.uniform(0, 4, (nc, nls, dim)).astype(np.float32)
    yl = (f(xl) + 0.1 * rng.normal(size=(nc, nls))).astype(np.float32)
    xg = rng.uniform(0, 4, (ng, dim)).astype(np.float32)
    yg = (f(xg) + 0.1 * rng.normal(size=ng)).astype(np.float32)
    xs = rng.uniform(0, 4, (nq, dim)).astype(np.float32)
    ys_true = f(xs)

    # augmentation on the HOST (data prep stays in NumPy)
    x_aug = np.concatenate(
        [np.broadcast_to(xg, (nc, ng, dim)), xl], axis=1
    )
    y_aug = np.concatenate(
        [np.broadcast_to(yg, (nc, ng)), yl], axis=1
    )

    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    nhp = cov.n_params(dim)
    params = np.ones((nhp,), np.float32)
    params[-1] = 0.3
    p_j = jnp.asarray(params)

    # ---- one-time factorization sweep, chunked ----------------------
    t0 = time.perf_counter()

    @jax.jit
    def factorize_chunk(p, xc, yc):
        grams = jax.vmap(lambda xx: train_gram(cov, p, xx))(xc)
        res = linalg.safe_cholesky(grams)
        w = linalg.cholesky_solve(res.chol, yc)
        tinv = jax.vmap(linalg.tri_inverse_doubling)(res.chol)
        return tinv, w

    # donated in-place writes into the persistent [nc, n_aug, n_aug]
    # buffer — a host round-trip of the 3.2 GB T stack over a remote
    # tunnel would dominate the whole benchmark
    place = jax.jit(
        lambda buf, tc, i0: jax.lax.dynamic_update_slice(
            buf, tc,
            (i0, jnp.zeros((), i0.dtype), jnp.zeros((), i0.dtype)),
        ),
        donate_argnums=(0,),
    )

    t_all = jnp.zeros((nc, n_aug, n_aug), jnp.float32)
    w_parts = []
    for i in range(nch):
        sl = slice(i * chunk, (i + 1) * chunk)
        tc, wc = factorize_chunk(
            p_j, jnp.asarray(x_aug[sl]), jnp.asarray(y_aug[sl])
        )
        t_all = place(t_all, tc, jnp.int32(i * chunk))
        w_parts.append(wc)
    w_all = jnp.concatenate(w_parts, axis=0)
    x_all = jnp.asarray(x_aug)

    sg = exact_gp.precompute_tinv(
        exact_gp.factorize(cov, p_j, jnp.asarray(xg), jnp.asarray(yg))
    )
    jnp.sum(w_all).item()  # sync
    setup_s = time.perf_counter() - t0

    # ---- the measured serving step ----------------------------------
    floor = jnp.float32(1e-7)

    def step(q, x_a, w_a, t_a):
        mu_g, var_g = exact_gp.predict(cov, sg, q, "diag")
        prec_g = 1.0 / var_g
        lg = jnp.log(prec_g)

        xr = x_a.reshape(nch, chunk, n_aug, dim)
        wr = w_a.reshape(nch, chunk, n_aug)
        tr = t_a.reshape(nch, chunk, n_aug, n_aug)
        i0s = jnp.arange(nch, dtype=jnp.int32) * chunk

        def body(carry, ch):
            s1, s2, sb = carry
            xc, wc, tc, i0 = ch
            st = exact_gp.GPState(
                x=xc, y=wc, params=jnp.broadcast_to(p_j, (chunk, nhp)),
                chol=tc, weights=wc,
                jitter=jnp.zeros((chunk,), jnp.float32),
                ok=jnp.ones((chunk,), bool), tinv=tc,
            )
            mu, var = exact_gp.predict(cov, st, q, "diag")
            prec = 1.0 / jnp.maximum(var, floor)          # [chunk, nq]
            beta = 0.5 * (jnp.log(prec) - lg[None])
            gidx = i0 + jnp.arange(chunk, dtype=jnp.int32)
            beta = jnp.where(gidx[:, None] == 0, 1.0, beta)
            return (
                s1 + jnp.sum(beta * prec, axis=0),
                s2 + jnp.sum(beta * prec * mu, axis=0),
                sb + jnp.sum(beta, axis=0),
            ), None

        z = jnp.zeros((nq,), jnp.float32)
        (s1, s2, sb), _ = jax.lax.scan(
            body, (z, z, z), (xr, wr, tr, i0s)
        )
        beta0 = 1.0 - sb
        covar = 1.0 / (beta0 * prec_g + s1)
        mean = covar * (beta0 * prec_g * mu_g + s2)
        return q + 0.0 * (mean + covar)[:, None], mean, covar

    stepj = jax.jit(step)
    q = jnp.asarray(xs)
    _, mean, covar = stepj(q, x_all, w_all, t_all)
    mean_h, var_h = np.asarray(mean), np.asarray(covar)
    assert np.isfinite(mean_h).all() and (var_h > 0).all()
    rmse = float(np.sqrt(np.mean((mean_h - ys_true) ** 2)))

    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        s = q
        for _ in range(reps):
            s, mean, covar = stepj(s, x_all, w_all, t_all)
        jnp.sum(mean).item()
        best = min(best, (time.perf_counter() - t0) / reps)

    rec = {
        "metric": "grbcm_1m_predictions_per_s_single_chip",
        "value": round(nq / best, 1),
        "unit": "predictions/s",
        "n_total": nc * nls,
        "experts": nc,
        "n_aug": n_aug,
        "queries_per_batch": nq,
        "batch_seconds": round(best, 4),
        "setup_seconds": round(setup_s, 1),
        "rmse_vs_true": round(rmse, 4),
        "path": (
            "serving: per-expert T=L^-1 + weights precomputed once "
            "(3.2 GB resident), query batches GEMM-only, experts "
            "streamed in lax.scan chunks with in-scan beta-precision "
            "aggregation (pinned communication expert)"
        ),
        "vs_baseline": None,
        "baseline": (
            "reference dense pipeline cannot run at N=1e6 (8 TB "
            "gram); BASELINE config 5's single-chip half"
        ),
    }
    if return_posterior:
        # parity-test hook (tests/test_bench_units.py): the streamed
        # in-scan aggregation must equal models/grbcm.predict
        return rec, mean_h, var_h
    return rec


def bench_iterative_large_n(
    n: int = 32768,
    dim: int = 2,
    num_probes: int = 8,
    rank: int = 64,
    block: int = 4096,
    max_cg: int = 64,
    n_query: int = 2048,
    seed: int = 0,
) -> dict:
    """Matrix-free exact-GP NLML value+grad at N=32k on ONE chip.

    The dense pipeline at this n needs a 4.3 GB gram + 1.2e13 FLOPs of
    Cholesky per eval (reference ``loss.py:96-97``); the Krylov path
    (``models/iterative.py``) replaces it with ~(cg + lanczos + 2)
    blocked matvecs of 2n²·cols FLOPs each and no n×n array.
    """
    import time

    import pygpr_tpu as gp
    from pygpr_tpu.models import iterative

    rng = np.random.default_rng(seed)

    def f(x):
        return np.sin(2.0 * x.sum(-1))

    x = rng.uniform(0, 4, (n, dim)).astype(np.float32)
    y = (f(x) + 0.1 * rng.normal(size=n)).astype(np.float32)
    xs = rng.uniform(0, 4, (n_query, dim)).astype(np.float32)
    probes = jnp.asarray(iterative.make_probes(n, num_probes, seed))
    cov = gp.RBF()
    params = jnp.asarray(np.r_[np.ones(dim + 1), 0.1].astype(np.float32))
    x_j, y_j = jnp.asarray(x), jnp.asarray(y)

    num_lanczos = 16
    vg = jax.jit(
        lambda p, xx, yy, zz: iterative.nlml_value_and_grad(
            cov, p, xx, yy, zz,
            rank=rank, num_lanczos=num_lanczos,
            cg_tol=1e-4, max_cg=max_cg, block=block,
        )
    )
    v, g = vg(params, x_j, y_j, probes)
    v0 = float(v)  # fetch = sync
    t0 = time.perf_counter()
    v, g = vg(params, x_j, y_j, probes)
    float(v)
    eval_s = time.perf_counter() - t0

    # matvec passes: CG (≤max_cg its × (1+p) cols is one [n,1+p]
    # matvec each), Lanczos (num_lanczos × p cols), surrogate fwd+vjp
    # (2 × (1+p)); each col-pass costs ~2n²(d+1) FLOPs of distance+GEMM
    cols_cg = max_cg * (1 + num_probes)
    cols_slq = num_lanczos * num_probes
    cols_grad = 4 * (1 + num_probes)
    flops = 2.0 * n * n * (dim + 1) * (cols_cg + cols_slq + cols_grad) / (
        1 + num_probes
    )  # ÷(1+p): the [n, k] GEMM shares one distance tile across cols

    mean_f = jax.jit(
        lambda p, q: iterative.predict(
            cov, p, x_j, y_j, q,
            var="none", rank=rank, cg_tol=1e-4, max_cg=max_cg,
            block=block,
        )[0]
    )
    m0 = mean_f(params, jnp.asarray(xs))
    np.asarray(m0)
    t0 = time.perf_counter()
    mean = np.asarray(mean_f(params, jnp.asarray(xs)))
    predict_s = time.perf_counter() - t0
    rmse = float(np.sqrt(np.mean((mean - f(xs)) ** 2)))

    return {
        "metric": "iterative_exact_gp_n32768_single_chip",
        "n_total": n,
        "eval_s": round(eval_s, 3),
        "evals_per_s": round(1.0 / eval_s, 3),
        "nlml": round(v0, 1),
        "grad_finite": bool(np.isfinite(np.asarray(g)).all()),
        "approx_tflops": round(flops / eval_s / 1e12, 2),
        "mean_predict_s": round(predict_s, 3),
        "rmse_vs_true": round(rmse, 4),
        "note": "no n×n array exists; dense gram would be "
        f"{round(4.0 * n * n / 2**30, 1)} GiB",
    }


def bench_statespace_large(
    n: int = 1_000_000,
    nu: float = 1.5,
    nq: int = 4096,
    reps: int = 3,
    seed: int = 3,
    include_posterior: bool = True,
) -> dict:
    """Exact 1-D Matérn-3/2 GP at n=10⁶ on ONE chip via the
    state-space parallel-scan path (``models/statespace``).

    Two timings (the README perf-table row cites this command:
    ``python -m pygpr_tpu.bench --statespace`` /
    ``python bench.py --stage statespace``):

      * NLML value+grad seconds/eval — AD through the associative
        filter scan, O(n) work / O(log n) depth.  The reference dense
        pipeline at n=10⁶ needs an 8 TB gram; it cannot run at all.
      * smoothed posterior at ``nq`` query times — the committed
        two-program host path (``_posterior_stage_a/_b``; fusing the
        two scans into one XLA program makes the TPU compile linear
        in n, see the module docstring).
    """
    import time

    from pygpr_tpu.models import statespace

    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0.0, 2000.0, n)).astype(np.float32)
    y = (np.sin(0.3 * t) + 0.1 * rng.normal(size=n)).astype(np.float32)
    t_j, y_j = jnp.asarray(t), jnp.asarray(y)
    p0 = jnp.asarray([1.0, 1.0, 0.1], jnp.float32)

    import sys

    def mark(msg, t0=[time.perf_counter()]):
        print(
            f"[statespace +{time.perf_counter()-t0[0]:.0f}s] {msg}",
            file=sys.stderr, flush=True,
        )

    # EXACT value+grad at the FULL n via the adjoint scan
    # (``statespace.nlml_ss_adjoint_value_and_grad``): three
    # host-composed programs whose compiles are all flat in n —
    # reverse-mode AD *through* the scan cannot compile at n=1e6
    # (>30 min; see the module's section comment), which is why four
    # rounds of this bench could only ever time the gradient at n/8.
    # A failure here must not cost the round's statespace line: fall
    # back to the r04 shape (value program only) and say so.
    try:
        va, ga = statespace.nlml_ss_adjoint_value_and_grad(
            nu, p0, t_j, y_j
        )
        v0 = float(va)
        ga_h = np.asarray(ga)
        assert np.isfinite(v0) and np.isfinite(ga_h).all()
        mark(f"adjoint value+grad programs compiled, value {v0:.1f}")
        pa = p0
        t0 = time.perf_counter()
        for _ in range(reps):
            va, ga = statespace.nlml_ss_adjoint_value_and_grad(
                nu, pa, t_j, y_j
            )
            pa = pa + 0.0 * ga + 0.0 * va
        pv = float(pa[0])
        grad_eval_s = (time.perf_counter() - t0) / reps
        assert np.isfinite(pv), "non-finite state-space adjoint grad"
        mark(
            f"adjoint value+grad timed: {grad_eval_s:.2f}s/eval "
            f"at n={n}"
        )

        rec = {
            "metric": "statespace_exact_nlml_grad_n1e6_single_chip",
            "value": round(1.0 / grad_eval_s, 3),
            "unit": "evals/s",
            "n_total": n,
            "nu": nu,
            "nlml_at_init": round(v0, 1),
            "adjoint_grad_seconds_per_eval": round(grad_eval_s, 3),
            "adjoint_grad_n": n,
            "grad_note": (
                "EXACT value+gradient at the FULL n=1e6 via the "
                "adjoint-scan formulation (models/statespace.py) — "
                "reverse-mode AD through the associative scan cannot "
                "even compile at this n (>30 min)"
            ),
            "vs_baseline": None,
            "baseline": (
                "reference dense pipeline cannot run at n=1e6 (8 TB "
                "gram); this is the EXACT Matern NLML via the O(n) "
                "associative-scan state-space form"
            ),
        }
    except Exception as e:  # adjoint path failed: keep the line alive
        mark(f"adjoint path failed ({type(e).__name__}: {e}); "
             "falling back to the value-only timing")

        def vstep(c, tt, yy):
            p, _ = c
            v = statespace.nlml_ss(nu, p, tt, yy)
            return p + 0.0 * v, v

        vstepj = jax.jit(vstep)
        c = vstepj((p0, jnp.float32(0.0)), t_j, y_j)
        v0 = float(c[1])
        t0 = time.perf_counter()
        c = (p0, jnp.float32(0.0))
        for _ in range(reps):
            c = vstepj(c, t_j, y_j)
        float(c[0][0])
        val_s = (time.perf_counter() - t0) / reps
        rec = {
            "metric": "statespace_exact_nlml_n1e6_single_chip",
            "value": round(1.0 / val_s, 3),
            "unit": "evals/s",
            "n_total": n,
            "nu": nu,
            "nlml_value_seconds_per_eval": round(val_s, 3),
            "nlml_at_init": round(v0, 1),
            "grad_note": (
                "adjoint grad path failed this run "
                f"({type(e).__name__}); value-only fallback"
            ),
            "vs_baseline": None,
            "baseline": (
                "reference dense pipeline cannot run at n=1e6 "
                "(8 TB gram)"
            ),
        }
        return rec

    if not include_posterior:
        # slim mode for the driver bench (VERDICT r04 #2: the full
        # stage's extra compiles pushed it past its own scheduling
        # window in every round) — the value-only timing, the AD
        # cross-check and the posterior run under
        # `python -m pygpr_tpu.bench --statespace` instead
        return rec

    # NLML VALUE-only program at the full n (one forward associative
    # scan, ~2.5 min tunnel compile, ~0.4 s/eval measured r04)
    def step(c, tt, yy):
        p, _ = c
        v = statespace.nlml_ss(nu, p, tt, yy)
        return p + 0.0 * v, v

    stepj = jax.jit(step)
    c = stepj((p0, jnp.float32(0.0)), t_j, y_j)
    float(c[1])  # compile + warm
    mark("nlml value program compiled")
    t0 = time.perf_counter()
    c = (p0, jnp.float32(0.0))
    for _ in range(reps):
        c = stepj(c, t_j, y_j)
    pv = float(c[0][0]) + float(c[1])
    eval_s = (time.perf_counter() - t0) / reps
    assert np.isfinite(pv), "non-finite state-space NLML"
    mark(f"nlml value timed: {eval_s:.2f}s/eval")
    rec["nlml_value_seconds_per_eval"] = round(eval_s, 3)

    n_grad = n // 8
    tg, yg_ = t_j[:n_grad], y_j[:n_grad]

    def gstep(c, tt, yy):
        p, _ = c
        v, g = jax.value_and_grad(
            lambda q: statespace.nlml_ss(nu, q, tt, yy)
        )(p)
        return p + 0.0 * g, v

    gstepj = jax.jit(gstep)
    cg = gstepj((p0, jnp.float32(0.0)), tg, yg_)
    float(cg[1])
    mark("AD value+grad program compiled")
    t0 = time.perf_counter()
    cg = (p0, jnp.float32(0.0))
    for _ in range(reps):
        cg = gstepj(cg, tg, yg_)
    gv = float(cg[0][0]) + float(cg[1])
    ad_grad_s = (time.perf_counter() - t0) / reps
    assert np.isfinite(gv), "non-finite state-space NLML grad"
    mark(f"AD value+grad timed: {ad_grad_s:.2f}s/eval at n={n_grad}")
    rec["ad_grad_n"] = n_grad
    rec["ad_grad_seconds_per_eval"] = round(ad_grad_s, 3)

    # smoothed posterior: two-program host path, timed end-to-end
    # (includes the host-side query merge — that IS the committed path)
    tq = np.linspace(0.0, 2000.0, nq).astype(np.float32)
    tq_j = jnp.asarray(tq)
    mq, vq = statespace.posterior_ss(nu, p0, t_j, y_j, tq_j)
    mq_h = np.asarray(mq)  # compile both stages + sync
    mark("posterior programs compiled")
    t0 = time.perf_counter()
    mq, vq = statespace.posterior_ss(nu, p0, t_j, y_j, tq_j)
    mq_h, vq_h = np.asarray(mq), np.asarray(vq)
    post_s = time.perf_counter() - t0
    assert np.isfinite(mq_h).all() and (vq_h > 0).all()
    rmse = float(np.sqrt(np.mean((mq_h - np.sin(0.3 * tq)) ** 2)))
    rec.update(
        posterior_nq=nq,
        posterior_seconds=round(post_s, 3),
        posterior_rmse_vs_true=round(rmse, 4),
    )
    return rec


def bench_sgpr_large_n(
    n: int = 98304,
    m: int = 1024,
    n_query: int = 8192,
    dim: int = 2,
    fit_iters: int = 60,
    seed: int = 0,
) -> dict:
    """SGPR at N≈100k on ONE chip — the low-rank counterpart of
    ``bench_large_n`` (same generative function, same N and query set,
    so the two JSON lines are directly comparable).

    The whole fit is ONE XLA while_loop: each ELBO eval is two tall
    [m, n] GEMM/TRSMs (O(n·m²)), far under the remote-tunnel watchdog
    even at 60 iterations.  Serving state is m-sized — no n-sized
    arrays survive the fit.
    """
    import time

    import pygpr_tpu as gp
    from pygpr_tpu.models import sgpr

    rng = np.random.default_rng(seed)

    def f(x):
        return np.sin(2.0 * x.sum(-1)) + 0.5 * np.cos(5.0 * x[..., 0])

    x = rng.uniform(0, 4, (n, dim)).astype(np.float32)
    y = (f(x) + 0.1 * rng.normal(size=n)).astype(np.float32)
    xs = rng.uniform(0, 4, (n_query, dim)).astype(np.float32)
    ys_true = f(xs)
    ys_noisy = (ys_true + 0.1 * rng.normal(size=n_query)).astype(
        np.float32
    )

    cov = gp.RBF()
    z = jnp.asarray(sgpr.init_inducing(x, m, seed=seed))
    x_j, y_j = jnp.asarray(x), jnp.asarray(y)
    p0 = sgpr.init_params(cov, x_j)

    fitf = jax.jit(
        lambda p, xx, yy: sgpr.fit(
            cov, p, xx, yy, z, max_iter=fit_iters
        )[0]
    )
    t0 = time.perf_counter()
    res = fitf(p0, x_j, y_j)
    params = np.asarray(res.params)  # fetch = device sync
    fit_s = time.perf_counter() - t0
    iters = int(res.iters)

    fac = jax.jit(lambda p, xx, yy: sgpr.factorize(cov, p, xx, yy, z))
    st = fac(jnp.asarray(params), x_j, y_j)
    np.asarray(st.c)  # compiled + done
    t0 = time.perf_counter()
    st = fac(jnp.asarray(params), x_j, y_j)
    np.asarray(st.c)
    factorize_s = time.perf_counter() - t0

    pq = jax.jit(lambda s, q: sgpr.predict(cov, s, q, "diag"))
    xs_j = jnp.asarray(xs)
    mean, var = pq(st, xs_j)
    np.asarray(mean)
    t0 = time.perf_counter()
    mean, var = pq(st, xs_j)
    mean, var = np.asarray(mean), np.asarray(var)
    predict_s = time.perf_counter() - t0

    err = mean - ys_noisy
    rmse_true = float(np.sqrt(np.mean((mean - ys_true) ** 2)))
    nlpd = float(
        np.mean(0.5 * np.log(2 * np.pi * var) + err**2 / (2 * var))
    )
    return {
        "metric": "sgpr_large_n_single_chip",
        "n_total": n,
        "inducing": m,
        "fit_s": round(fit_s, 2),
        "fit_iters_taken": iters,
        "neg_elbo": round(float(res.value), 1),
        "factorize_s": round(factorize_s, 3),
        "predict_s": round(predict_s, 4),
        "predictions_per_s": round(n_query / predict_s, 1),
        "rmse_vs_true": round(rmse_true, 4),
        "nlpd": round(nlpd, 3),
        "params": [round(float(v), 4) for v in params],
    }
