"""Benchmark: LML-gradient evaluations per second (BASELINE metric).

Runs the jitted NLML value-and-gradient (the optimizer inner loop,
reference call stack SURVEY.md §3.2) on the flagship single-chip
config — ARD RBF + white noise, N=2048 — and reports evals/s.

``vs_baseline`` compares against a faithful NumPy/LAPACK f64
re-implementation of the reference's analytic gradient pipeline
(``PyGPR/loss.py:92-128``: kernel+grad build, Cholesky, cho_solve of
y and of every dK, trace terms) timed on this host's CPU — the same
BLAS/LAPACK substrate the torch-based reference delegates to.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


N = 2048
DIM = 3
REPS = 30


def make_data(n=N, dim=DIM, seed=42):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.0, 2.0, size=(n, dim))
    y = np.sin(2.0 * x.sum(-1)) + 0.1 * rng.normal(size=n)
    params = np.ones(dim + 2)
    params[-1] = 0.1
    return x, y, params


def bench_tpu():
    import jax
    import jax.numpy as jnp

    import pygpr_tpu as gp

    x_h, y_h, p_h = make_data()
    dtype = jnp.float32
    x = jnp.asarray(x_h, dtype)
    y = jnp.asarray(y_h, dtype)
    p = jnp.asarray(p_h, dtype)
    cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))

    vg = jax.jit(lambda p: gp.nlml_value_and_grad(cov, p, x, y))
    v, g = vg(p)
    v.block_until_ready()  # compile
    # timed loop
    t0 = time.perf_counter()
    for _ in range(REPS):
        v, g = vg(p)
    v.block_until_ready()
    dt = time.perf_counter() - t0
    assert bool(jnp.isfinite(v)), "non-finite NLML in bench"
    return REPS / dt


def bench_reference_cpu():
    """Reference-equivalent analytic pipeline (loss.py:92-128) in
    NumPy/LAPACK f64."""
    import scipy.linalg as sla

    x, y, p = make_data()
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
        # dK stack [nhp, n, n]
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
        grad = -0.5 * (tr1 - tr2)
        return val, grad

    loss_and_grad(p)  # warm caches
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        loss_and_grad(p)
    dt = time.perf_counter() - t0
    return reps / dt


def main():
    tpu_evals = bench_tpu()
    ref_evals = bench_reference_cpu()
    print(
        json.dumps(
            {
                "metric": "lml_grad_evals_per_s_n2048",
                "value": round(tpu_evals, 2),
                "unit": "evals/s",
                "vs_baseline": round(tpu_evals / ref_evals, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
