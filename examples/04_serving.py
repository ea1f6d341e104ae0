"""Serving a fitted GP: precompute T = L⁻¹ once, then stream query
batches through GEMM-only predicts (no triangular solves per batch).

The reference re-solves against the Cholesky factor on every predict
(``gpr.py:96-120``); on TPU that costs 2× the flops of the precomputed
form and runs the same MXU speed, so serving throughput doubles for a
one-time n³/3 cost (``pygpr_tpu.precompute_tinv``).

Run: python examples/04_serving.py           (TPU or CPU)
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

rng = np.random.default_rng(0)
n, n_query, noise = 2048, 4096, 0.1
x = rng.uniform(0, 4, (n, 2)).astype(np.float32)
y = (np.sin(2 * x.sum(-1)) + noise * rng.normal(size=n)).astype(
    np.float32
)
cov = gp.RBF() + gp.WhiteNoise()
params = np.ones(4, np.float32)
params[-1] = noise

# one-time: factorize + attach the serving inverse
state = jax.jit(lambda p: gp.factorize(cov, p, x, y))(
    jnp.asarray(params)
)
state = jax.jit(gp.precompute_tinv)(state)

predict = jax.jit(
    lambda st, q: gp.predict(cov, st, q, var="diag")
)

# stream query batches (here: random batches standing in for traffic)
batches = [
    rng.uniform(0, 4, (n_query, 2)).astype(np.float32) for _ in range(8)
]
mean, var = predict(state, jnp.asarray(batches[0]))  # compile + warm
jax.block_until_ready(mean)

t0 = time.perf_counter()
carry = jnp.float32(0.0)
for q in batches:
    # chain each batch on the previous result: on a remote-tunnel TPU
    # an unchained loop measures dispatch throughput, not compute
    mean, var = predict(state, jnp.asarray(q) + 0.0 * carry)
    carry = mean[0]
float(carry)
dt = time.perf_counter() - t0

total = n_query * len(batches)
print(f"served {total} predictions in {dt:.3f} s "
      f"({total/dt:,.0f} predictions/s, n={n} training points)")
print(f"mean in [{float(mean.min()):+.3f}, {float(mean.max()):+.3f}], "
      f"var all positive: {bool((var > 0).all())}")
