"""Sparse variational GP (SGPR, Titsias collapsed bound) — the
low-rank large-N path, complementing the grBCM committee (example 02).

m inducing points summarize all n observations in one coherent model:
the fit is O(n·m²) of tall [m, n] MXU GEMMs inside ONE on-device
L-BFGS while_loop (inducing locations optimized jointly with the
hyperparameters), and the serving state is m-sized — predicts cost
O(m²) per query with no n-sized arrays in sight.

Run: python examples/05_sgpr.py              (TPU or CPU)
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import jax.numpy as jnp
import numpy as np

import pygpr_tpu as gp
from pygpr_tpu.models import sgpr

rng = np.random.default_rng(0)
n, m, noise = 20_000, 64, 0.1
x = rng.uniform(0, 4, (n, 1)).astype(np.float32)
y = (np.sin(2 * x[:, 0]) + noise * rng.normal(size=n)).astype(np.float32)
xs = np.linspace(0.1, 3.9, 400, dtype=np.float32)[:, None]

model = sgpr.SGPR(x, y, gp.RBF(), m=m, seed=0)
print(f"initial -ELBO: {float(model.neg_elbo()):.1f}")

t0 = time.perf_counter()
res = model.train(opt_inducing=True, max_iter=120)
print(
    f"fit: {time.perf_counter() - t0:.1f} s, {int(res.iters)} iters, "
    f"-ELBO {float(res.value):.1f}, σₙ={abs(float(model.params[-1])):.3f}"
    f" (true {noise})"
)

mean, var = model.predict(xs, var="diag")
rmse = float(jnp.sqrt(jnp.mean((mean - jnp.sin(2 * xs[:, 0])) ** 2)))
nlpd = float(
    jnp.mean(
        0.5 * jnp.log(2 * np.pi * var)
        + (mean - jnp.sin(2 * xs[:, 0])) ** 2 / (2 * var)
    )
)
print(f"RMSE vs truth: {rmse:.4f}   NLPD: {nlpd:.3f}")
assert rmse < 0.05, "SGPR failed to recover the function"

# the fitted state is m-sized: n=20k points served from 64² factors
st = model.state
print(
    "serving state:",
    {k: tuple(np.shape(v)) for k, v in st._asdict().items()},
)
