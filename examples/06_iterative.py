"""Matrix-free iterative exact GP — Krylov methods on a gram operator
that is never materialized (the third large-N path, next to the grBCM
committee of example 02 and the SGPR of example 05).

At n = 30,000 the dense gram is 3.6 GB f32 and the reference's LAPACK
Cholesky (PyGPR/loss.py:96-97) does 9e12 FLOPs per NLML eval; here the
NLML value+gradient are estimated with NO O(n³) step: blocked MXU
matvec tiles + preconditioned CG + stochastic Lanczos quadrature.

Run: python examples/06_iterative.py          (TPU or CPU)
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import jax
import jax.numpy as jnp
import numpy as np

import pygpr_tpu as gp
from pygpr_tpu.models import iterative

rng = np.random.default_rng(0)
# O(n²) matvecs: 30k is interactive on a TPU chip; scale down for a
# CPU smoke run (the math is size-independent)
on_accel = jax.default_backend() not in ("cpu",)
n, noise = (30_000 if on_accel else 4_000), 0.1
x = rng.uniform(0, 4, (n, 1)).astype(np.float32)
y = (np.sin(2 * x[:, 0]) + noise * rng.normal(size=n)).astype(np.float32)
xs = np.linspace(0.1, 3.9, 400, dtype=np.float32)[:, None]

model = iterative.IterativeGP(
    x, y, gp.RBF(), num_probes=8, rank=64,
    block=4096 if on_accel else 1024, seed=0,
)

t0 = time.perf_counter()
trace = model.train(iters=30, learning_rate=0.1, max_cg=64, cg_tol=1e-3)
print(
    f"fit: {time.perf_counter() - t0:.1f} s, 30 Adam steps, "
    f"NLML {float(trace[0]):.0f} → {float(trace[-1]):.0f}, "
    f"σₙ={abs(float(model.params[-1])):.3f} (true {noise})"
)

t0 = time.perf_counter()
mean, _ = model.predict(xs, var="none")
mean = np.asarray(mean)
rmse = float(np.sqrt(np.mean((mean - np.sin(2 * xs[:, 0])) ** 2)))
print(
    f"mean predict ({len(xs)} queries): {time.perf_counter() - t0:.1f} s,"
    f" RMSE vs truth {rmse:.4f}"
)
assert rmse < 0.05, "iterative GP failed to recover the function"

# diagonal variance costs one batched CG per query chunk — keep the
# uncertainty demo to a small set so the example also runs on CPU
xv = xs[::16]
t0 = time.perf_counter()
mean_v, var = iterative.predict(
    model.cov, model.params, model.x, model.y, jnp.asarray(xv),
    rank=64, max_cg=64, cg_tol=1e-3, block=4096, query_chunk=32,
)
mean_v, var = np.asarray(mean_v), np.asarray(var)
nlpd = float(
    np.mean(
        0.5 * np.log(2 * np.pi * var)
        + (mean_v - np.sin(2 * xv[:, 0])) ** 2 / (2 * var)
    )
)
print(
    f"mean+var predict ({len(xv)} queries): "
    f"{time.perf_counter() - t0:.1f} s, NLPD {nlpd:.3f}"
)
