"""SKI/KISS-GP and deep kernel learning — two beyond-reference model
families on top of the same engine.

Part 1 (SKI): structured kernel interpolation puts n = 50,000 points on
a 512-node grid; every Krylov matvec is O(4·n) interpolation + one
512² MXU GEMM instead of the O(n²) dense gram row sweep of example 06 —
exact-GP-style inference at committee-scale n on one chip.

Part 2 (DKL): a 2-layer MLP warp under an RBF kernel learns the sharp
step that defeats any stationary kernel; the network weights ride in
the same packed parameter vector as the hyperparameters and train by
joint Adam MLE.

Run: python examples/09_ski_dkl.py          (TPU or CPU)
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
from pygpr_tpu.models import iterative, ski

rng = np.random.default_rng(0)
on_accel = jax.default_backend() not in ("cpu",)

# ---------------------------------------------------------------- SKI
n, noise = (50_000 if on_accel else 4_000), 0.1
x = np.sort(rng.uniform(0, 8, (n, 1)).astype(np.float32), axis=0)
y = (np.sin(2 * x[:, 0]) + noise * rng.normal(size=n)).astype(np.float32)
xs = np.linspace(0.2, 7.8, 400, dtype=np.float32)[:, None]

model = ski.SKIGP(x, y, grid_size=512, num_probes=8, rank=32, seed=0)
t0 = time.perf_counter()
trace = model.train(iters=60)  # direct path: exact O(G^3) NLML, L-BFGS
print(
    f"SKI fit n={n} (direct, G=512): {time.perf_counter() - t0:.1f} s, "
    f"NLML {float(trace[-1]):.0f}, "
    f"sigma_n={abs(float(model.params[-1])):.3f} (true {noise})"
)

t0 = time.perf_counter()
mean, var = model.predict(jnp.asarray(xs))
rmse = float(np.sqrt(np.mean(
    (np.asarray(mean) - np.sin(2 * xs[:, 0])) ** 2)))
print(
    f"SKI predict 400 queries: {time.perf_counter() - t0:.1f} s, "
    f"rmse {rmse:.4f}, mean posterior sd "
    f"{float(np.sqrt(np.asarray(var)).mean()):.3f}"
)

# ---------------------------------------------------------------- DKL
nd = 1_024
xd = np.sort(rng.uniform(-2, 2, (nd, 1)).astype(np.float32), axis=0)
yd = (np.where(xd[:, 0] > 0, 1.0, -1.0)
      + 0.05 * rng.normal(size=nd)).astype(np.float32)

kern = gp.DeepKernel(gp.Sum((gp.RBF(), gp.WhiteNoise())), widths=(8, 2))
t0 = time.perf_counter()
fit = gp.fit_dkl(kern, jnp.asarray(xd), jnp.asarray(yd),
                 n_steps=250, learning_rate=3e-2)
print(
    f"DKL fit n={nd}: {time.perf_counter() - t0:.1f} s, "
    f"NLML {float(fit.nlml[0]):.0f} -> {float(fit.nlml[-1]):.0f}"
)

xq = np.linspace(-2, 2, 256, dtype=np.float32)[:, None]
mean, _ = jax.jit(
    lambda p, a, b, q: gp.fit_predict(kern, p, a, b, q, var="diag")
)(fit.params, xd, yd, xq)
truth = np.where(xq[:, 0] > 0, 1.0, -1.0)
off_jump = np.abs(xq[:, 0]) > 0.15
rmse_d = float(np.sqrt(np.mean(
    (np.asarray(mean)[off_jump] - truth[off_jump]) ** 2)))
print(f"DKL step-function rmse (off-jump): {rmse_d:.4f}")
