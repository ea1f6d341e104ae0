"""Million-point EXACT GP on one chip: the state-space (Kalman) form
of a 1-D Matérn-3/2 GP, fitted with the adjoint-scan exact gradient.

The dense pipeline at n=10⁶ would need an 8 TB gram; the SDE form
makes the SAME posterior an O(n) filter/smoother problem, parallelized
to O(log n) depth with `associative_scan`.  Hyperparameters are fitted
by `fit_ss_large`, which from n ≥ 200k drives the adjoint-scan
gradient (`nlml_ss_adjoint_value_and_grad`): exact ∂NLML/∂θ whose
three XLA programs all compile flat in n — reverse-mode AD through
the scan cannot even compile at this n.

Run: python examples/12_statespace_million.py [n]   (TPU or CPU;
default n=200_000 so the CPU run stays under a minute — pass 1000000
on the chip)
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import jax.numpy as jnp
import numpy as np

from pygpr_tpu.models import statespace as ss

n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
rng = np.random.default_rng(0)
# data prep stays on the HOST (repo policy): sorted times, noisy signal
t = np.sort(rng.uniform(0.0, 2000.0, n)).astype(np.float32)
y = (np.sin(0.05 * t) + 0.2 * rng.normal(size=n)).astype(np.float32)
t_j, y_j = jnp.asarray(t), jnp.asarray(y)

t0 = time.perf_counter()
res = ss.fit_ss_large(
    1.5, t_j, y_j, max_iter=40, grad_method="adjoint"
)
fit_s = time.perf_counter() - t0
sig, ls, sn = (float(v) for v in res.params)
print(
    f"n={n}: fitted sigma={sig:.3f} ell={ls:.4f} noise={sn:.4f} "
    f"(true noise 0.2) in {fit_s:.0f}s, NLML {float(res.nlml):.0f}, "
    f"converged={bool(res.converged)}"
)
assert abs(sn - 0.2) < 0.05, "noise recovery failed"

# smoothed posterior at query times (two-program host path)
tq = np.linspace(0.0, 2000.0, 2048).astype(np.float32)
mq, vq = ss.posterior_ss(1.5, res.params, t_j, y_j, jnp.asarray(tq))
mq = np.asarray(mq)
rmse = float(np.sqrt(np.mean((mq - np.sin(0.05 * tq)) ** 2)))
print(f"posterior rmse vs truth: {rmse:.4f}")
assert rmse < 0.05
print("ok")
