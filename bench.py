"""Driver benchmark: BASELINE metrics with explicit FLOP accounting.

Prints one JSON line per metric (first line = the flagship
LML-gradient evals/s, BASELINE.md config 2):

  1. ``lml_grad_evals_per_s_n2048`` — the optimizer inner loop
     (reference stack SURVEY.md §3.2) on the production path:
     ``grad_mode="fast"`` (solve-free closed-form gradient,
     ``models/likelihood.py::_nlml_vg_fast_one``) with the fused
     Pallas Cholesky+inverse kernel (``use_pallas=True``).  Includes
     measured TFLOP/s and fraction of the f32 matmul ceiling.
  2. ``grbcm_predictions_per_s_16x512`` — committee predict +
     β-aggregation throughput (BASELINE config 4 shape, scaled).

``vs_baseline`` on line 1 times the ACTUAL torch reference
(``/root/reference`` PyGPR, f64 LAPACK ``MLE.loss_and_grad``,
``loss.py:92-128``) on this host's CPU; if the reference checkout or
torch is unavailable it falls back to an equivalent NumPy/LAPACK
pipeline and says so in the ``baseline`` field.

Timing methodology: each measured step is CHAINED on its inputs
(iteration k+1 consumes a value derived from iteration k) and only the
final scalar is fetched.  On the remote-TPU tunnel `block_until_ready`
does not guarantee device completion and a host fetch costs ~25 ms, so
unchained loops measure dispatch throughput, not compute — chaining
forces serial device execution and one fetch amortizes over all reps.
"""

import json
import time

import numpy as np

N = 2048
DIM = 3
REPS = 30

# f32 matmul roofline for the %-of-peak figures: MEASURED each run
# (dense 4096³ f32 matmul at precision=HIGHEST — the fairest
# denominator for a Cholesky/GEMM pipeline).  The theoretical model
# (v5e bf16 peak 197 TFLOP/s ÷ 6 MXU passes ≈ 32.8) underestimates the
# chip: measured dense HIGHEST throughput is ~38 TFLOP/s, so the
# model's pass count is pessimistic; percentages below use the
# measurement, falling back to the model if it cannot run.
F32_HIGHEST_CEILING_TFLOPS = 197.0 / 6.0


def measure_roofline(latency):
    """Dense [4096,4096]² f32-HIGHEST matmul TFLOP/s on this chip."""
    import jax
    import jax.numpy as jnp

    try:
        n = 4096
        a = jnp.asarray(
            np.random.default_rng(0)
            .standard_normal((n, n))
            .astype(np.float32)
        )

        def step(x):
            return (
                jnp.matmul(
                    x, a, precision=jax.lax.Precision.HIGHEST
                )
                * 1e-3
            )

        t, val = _chained_seconds(jax.jit(step), a, 10, latency)
        assert np.isfinite(val)
        return 2.0 * n**3 / t / 1e12
    except Exception:
        return F32_HIGHEST_CEILING_TFLOPS


def make_data(n=N, dim=DIM, seed=42):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.0, 2.0, size=(n, dim)).astype(np.float32)
    y = (np.sin(2.0 * x.sum(-1)) + 0.1 * rng.normal(size=n)).astype(
        np.float32
    )
    params = np.ones(dim + 2, np.float32)
    params[-1] = 0.1
    return x, y, params


def _fetch_latency():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda s: s + 1.0)
    s = jnp.float32(0.0)
    float(f(s))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(f(s))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _chained_seconds(stepf, init, reps, latency, rounds=8):
    """Steady-state seconds/step with serialized device execution.

    Best of ``rounds`` measurement rounds: both the host-side tunnel
    jitter AND the device-level throughput fluctuation (the shared chip
    runs up to ~2× slower under contention) are one-sided slowdowns, so
    min over rounds is the robust estimator of uncontended speed.

    Returns ``(seconds_per_step, final_chained_scalar)`` — the scalar
    doubles as the finiteness sanity check (NaN anywhere in the chain
    propagates to it), so callers need no second compiled program.
    """
    import jax.numpy as jnp

    jnp.sum(stepf(init)).item()  # compile + warm
    best = float("inf")
    val = float("nan")
    for _ in range(rounds):
        t0 = time.perf_counter()
        s = init
        for _ in range(reps):
            s = stepf(s)
        val = jnp.sum(s).item()
        best = min(best, (time.perf_counter() - t0 - latency) / reps)
    return best, val


def bench_tpu(latency, n=N, reps=REPS):
    import jax
    import jax.numpy as jnp

    import pygpr_tpu as gp
    from pygpr_tpu.config import Config

    x_h, y_h, p_h = make_data(n=n)
    x = jnp.asarray(x_h)
    y = jnp.asarray(y_h)
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    cfg = Config(grad_mode="fast", use_pallas=True)

    def step(p):
        v, g = gp.nlml_value_and_grad(cov, p, x, y, cfg)
        return p + 0.0 * g + 0.0 * v

    t, val = _chained_seconds(jax.jit(step), jnp.asarray(p_h), reps, latency)
    # sanity: a NaN value/grad anywhere in the chain poisons the
    # carried parameter vector, so this one fetched scalar guards all
    # reps with no second compiled program
    assert np.isfinite(val), "non-finite NLML value/grad in bench"
    return 1.0 / t, t


def eval_flops(n=N, dim=DIM):
    """FLOPs of one fast-path value+grad eval (the measured program):
    Cholesky n³/3 + block-inverse n³/3 + K⁻¹=TᵀT via the triangular
    syrk recursion ⅔n³ (``ops/linalg.py::syrk_from_tril``) + gram
    build/VJP distance GEMMs 4n²d + O(n²) elementwise."""
    return (4.0 / 3.0) * n**3 + 4.0 * n**2 * dim + 20.0 * n**2


def bench_reference_cpu():
    """Time the ACTUAL torch reference (f64, LAPACK) if importable."""
    import sys

    x, y, p = make_data()
    try:
        sys.path.insert(0, "/root/reference")
        import torch as tc
        import PyGPR

        model = PyGPR.Exact_GP(
            tc.from_numpy(x.astype(np.float64)),
            tc.from_numpy(y.astype(np.float64)),
            PyGPR.Compose(
                [PyGPR.Squared_exponential(), PyGPR.White_noise()]
            ),
        )
        loss = PyGPR.MLE(model)
        loss.loss_and_grad(p.astype(np.float64))  # warm
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            loss.loss_and_grad(p.astype(np.float64))
        return reps / (time.perf_counter() - t0), "torch-reference-f64-cpu"
    except Exception:
        return _bench_numpy_equivalent(x, y, p), "numpy-lapack-f64-cpu"


def _bench_numpy_equivalent(x, y, p):
    """Reference-equivalent analytic pipeline (loss.py:92-128)."""
    import scipy.linalg as sla

    x = x.astype(np.float64)
    y = y.astype(np.float64)
    p = p.astype(np.float64)
    n, dim = x.shape

    def loss_and_grad(params):
        sig, ls, sig_n = params[0], params[1:-1], params[-1]
        xl = x * ls
        x2 = np.sum(xl * xl, -1)
        sqd = x2[:, None] + x2[None, :] - 2.0 * (xl @ xl.T)
        krn = sig**2 * np.exp(-sqd)
        krn[np.diag_indices(n)] += sig_n**2 + 1e-7
        L = sla.cholesky(krn, lower=True)
        w = sla.cho_solve((L, True), y)
        val = (
            0.5 * w @ y
            + np.sum(np.log(np.diag(L)))
            + 0.5 * n * np.log(2 * np.pi)
        )
        nhp = dim + 2
        dk = np.empty((nhp, n, n))
        dk[0] = 2.0 / sig * krn
        diff = x.T[:, :, None] - x.T[:, None, :]
        for j in range(dim):
            dk[1 + j] = -2.0 * ls[j] * diff[j] ** 2 * krn
        dk[-1] = np.zeros((n, n))
        dk[-1][np.diag_indices(n)] = 2.0 * sig_n
        tr1 = np.einsum("i,kij,j->k", w, dk, w)
        kk = np.stack([sla.cho_solve((L, True), d) for d in dk])
        tr2 = np.trace(kk, axis1=-2, axis2=-1)
        return val, -0.5 * (tr1 - tr2)

    loss_and_grad(p)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        loss_and_grad(p)
    return reps / (time.perf_counter() - t0)


def bench_predictions(latency, nc=16, nls=512, ng=256, nq=4096, dim=2):
    """Serving throughput: states factorized + T=L⁻¹ precomputed ONCE
    (``exact_gp.precompute_tinv``), then diag predict chained over query
    batches — every per-batch op is an MXU GEMM, no triangular solves."""
    import jax
    import jax.numpy as jnp

    import pygpr_tpu as gp
    from pygpr_tpu.models import exact_gp, grbcm

    rng = np.random.default_rng(0)
    xl = rng.uniform(0, 4, (nc, nls, dim)).astype(np.float32)
    yl = np.sin(xl.sum(-1)).astype(np.float32)
    xg = rng.uniform(0, 4, (ng, dim)).astype(np.float32)
    yg = np.sin(xg.sum(-1)).astype(np.float32)
    xs = rng.uniform(0, 4, (nq, dim)).astype(np.float32)
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
    x_aug, y_aug = grbcm.augment(
        jnp.asarray(xl), jnp.asarray(yl), jnp.asarray(xg), jnp.asarray(yg)
    )
    pg = cov.init_params(jnp.asarray(xg))
    pl_ = cov.init_params(x_aug)
    xg_, yg_ = jnp.asarray(xg), jnp.asarray(yg)

    @jax.jit
    def prepare():
        sg = exact_gp.factorize(cov, pg, xg_, yg_)
        sl = exact_gp.factorize(cov, pl_, x_aug, y_aug)
        return exact_gp.precompute_tinv(sg), exact_gp.precompute_tinv(sl)

    sg, sl = jax.block_until_ready(prepare())

    def step(q):
        res = grbcm.predict(cov, pg, pl_, sg, sl, q, "diag")
        return q + 0.0 * res.mean[:, None]

    t, val = _chained_seconds(
        jax.jit(step), jnp.asarray(xs), 10, latency
    )
    assert np.isfinite(val), "non-finite committee predict in bench"
    return nq / t, t


def bench_ski_direct(latency, n=1_000_000, g=512, reps=20):
    """SKI direct-path NLML value+grad at n=10⁶ on ONE chip.

    The per-eval program touches only the G-sized statistics (Z = WᵀW,
    Wᵀy, yᵀy — one-time O(n) pass), so each value+grad is O(G³)
    *independent of n*; the reference's dense pipeline at n=10⁶ would
    need an 8 TB gram and ~3·10¹⁸ FLOPs per eval — it cannot run at
    all.  Returns ``(evals/s, seconds/eval, stats_seconds)``.
    """
    import jax
    import jax.numpy as jnp

    import pygpr_tpu as gp
    from pygpr_tpu.models import ski

    rng = np.random.default_rng(7)
    x = np.sort(
        rng.uniform(0.0, 8.0, (n, 1)).astype(np.float32), axis=0
    )
    y = (np.sin(2.0 * x[:, 0]) + 0.1 * rng.normal(size=n)).astype(
        np.float32
    )
    grid = ski.make_grid(x, g)
    t0 = time.perf_counter()
    # C++ streamed accumulator (native/data_layer.cpp::ski_stats_accum):
    # f64 host accumulation, ~180x faster than the device scatter at n=1e6
    stats = ski.compute_stats_streamed((x, y), grid)
    jnp.sum(stats.z).item()
    t_stats = time.perf_counter() - t0

    kern = gp.RBF()
    vg = jax.value_and_grad(
        lambda p: ski.nlml_direct(kern, p, stats, grid)
    )

    def step(p):
        v, gr = vg(p)
        return p + 0.0 * gr + 0.0 * v

    t, val = _chained_seconds(
        jax.jit(step), jnp.asarray([1.0, 1.0, 0.1], jnp.float32),
        reps, latency,
    )
    assert np.isfinite(val), "non-finite SKI NLML in bench"
    return 1.0 / t, t, t_stats


def bench_kron(latency, g=512, reps=20):
    """Exact grid-GP NLML value+grad at N = g² on ONE chip
    (``models/kronecker``).  The dense pipeline at N=262k would need a
    550 GB gram and ~6·10¹⁵ Cholesky FLOPs per eval; the Kronecker
    factorization does it exactly with two g³ eigensolves + O(N) work.
    """
    import jax
    import jax.numpy as jnp

    import pygpr_tpu as gp
    from pygpr_tpu.models import kronecker

    rng = np.random.default_rng(11)
    ax = np.linspace(0.0, 8.0, g, dtype=np.float32)
    x1, x2 = np.meshgrid(ax, ax, indexing="ij")
    y = (
        np.sin(2.0 * x1) * np.cos(x2)
        + 0.05 * rng.normal(size=x1.shape)
    ).astype(np.float32)
    kern = gp.Separable("rbf")
    axj = jnp.asarray(ax)
    yj = jnp.asarray(y)
    vg = jax.value_and_grad(
        lambda p: kronecker.nlml_kron(kern, p, [axj, axj], yj)
    )

    def step(p):
        v, gr = vg(p)
        return p + 0.0 * gr + 0.0 * v

    t, val = _chained_seconds(
        jax.jit(step),
        jnp.asarray([1.0, 1.0, 1.0, 0.2], jnp.float32),
        reps,
        latency,
    )
    assert np.isfinite(val), "non-finite Kronecker NLML in bench"
    return 1.0 / t, t


def main():
    latency = _fetch_latency()
    roofline = measure_roofline(latency)

    evals_per_s, t_eval = bench_tpu(latency)
    ref_evals, baseline_kind = bench_reference_cpu()
    fl = eval_flops()
    tflops = fl / t_eval / 1e12
    print(
        json.dumps(
            {
                "metric": "lml_grad_evals_per_s_n2048",
                "value": round(evals_per_s, 2),
                "unit": "evals/s",
                "vs_baseline": round(evals_per_s / ref_evals, 2),
                "baseline": baseline_kind,
                "flops_per_eval": fl,
                "tflops": round(tflops, 2),
                "roofline_tflops_measured": round(roofline, 1),
                "pct_f32_roofline": round(
                    100.0 * tflops / roofline, 1
                ),
            }
        ),
        flush=True,
    )

    # n=4096: the same path where the panel GEMMs amortize the
    # sequential factorization core — the %-of-peak headline
    evals4, t4 = bench_tpu(latency, n=4096, reps=12)
    fl4 = eval_flops(n=4096)
    tf4 = fl4 / t4 / 1e12
    print(
        json.dumps(
            {
                "metric": "lml_grad_evals_per_s_n4096",
                "value": round(evals4, 2),
                "unit": "evals/s",
                "flops_per_eval": fl4,
                "tflops": round(tf4, 2),
                "pct_f32_roofline": round(100.0 * tf4 / roofline, 1),
            }
        ),
        flush=True,
    )

    ski_evals, t_ski, t_stats = bench_ski_direct(latency)
    print(
        json.dumps(
            {
                "metric": "ski_direct_nlml_grad_evals_per_s_n1e6_g512",
                "value": round(ski_evals, 2),
                "unit": "evals/s",
                "vs_baseline": None,
                "baseline": (
                    "reference dense O(n^3) pipeline cannot run at "
                    "n=1e6 (8 TB gram); per-eval cost here is O(G^3), "
                    "independent of n after the one-time stats pass"
                ),
                "stats_setup_seconds": round(t_stats, 1),
                "seconds_per_eval": round(t_ski, 5),
            }
        ),
        flush=True,
    )

    kron_evals, t_kron = bench_kron(latency)
    print(
        json.dumps(
            {
                "metric": "kron_exact_nlml_grad_evals_per_s_n262144",
                "value": round(kron_evals, 2),
                "unit": "evals/s",
                "vs_baseline": None,
                "baseline": (
                    "reference dense pipeline cannot run at N=262k "
                    "(550 GB gram, ~6e15 FLOPs/eval); this is the "
                    "EXACT NLML+grad via Kronecker eigensolves"
                ),
                "seconds_per_eval": round(t_kron, 5),
            }
        ),
        flush=True,
    )

    preds_per_s, t_pred = bench_predictions(latency)
    # per-query flop math (README perf table cites this): 16 experts of
    # n_aug=768 + global 256; diag predict per query point costs one
    # n-length kernel row + one n² triangular-solve pair per expert —
    # but the solve is amortized over the query batch: per query
    # ≈ Σ_experts 2·n_aug² / nq + O(n_aug·d).
    print(
        json.dumps(
            {
                "metric": "grbcm_predictions_per_s_16x512",
                "value": round(preds_per_s, 1),
                "unit": "predictions/s",
                "path": "serving: T=L^-1 precomputed once, GEMM-only",
                "queries_per_batch": 4096,
                "batch_seconds": round(t_pred, 5),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
