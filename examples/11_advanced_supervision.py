"""Round-3 model families, part 2: richer supervision signals.

Part 1 (gradient-enhanced GP): condition on observed derivatives —
8 function values + 8 gradients beat 16 values alone on a wiggly 1-D
target (R&W §9.4; common in surrogate modeling where adjoints are
cheap).

Part 2 (multi-fidelity co-kriging): 64 cheap low-fidelity points lift
a 12-point high-fidelity fit (Kennedy & O'Hagan AR(1) model).

Part 3 (heteroscedastic GP): input-dependent noise σ²(x) learned via
the most-likely-heteroscedastic fixed point; the predictive variance
tracks the true two-regime noise.

Part 4 (deep GP): a 2-layer doubly stochastic deep GP fits a step
function that a stationary shallow GP oversmooths.

Part 5 (GPLVM): unsupervised — 5-D observations on a nonlinear 1-D
curve; the learned 1-D latent recovers the true ordering.

Run: python examples/11_advanced_supervision.py   (TPU or CPU)
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

rng = np.random.default_rng(0)
f32 = np.float32

# --- 1. gradient-enhanced GP ----------------------------------------
def f(x):
    return np.sin(3 * x) + 0.4 * np.cos(7 * x)

def df(x):
    return 3 * np.cos(3 * x) - 2.8 * np.sin(7 * x)

xv = np.linspace(0, 2, 8, dtype=f32)[:, None]
xq = np.linspace(0.05, 1.95, 200, dtype=f32)[:, None]
t0 = time.time()
der = gp.DerivativeGP(xv, f(xv[:, 0]), xv, df(xv[:, 0])[:, None]).train()
m_d, _ = der.predict(jnp.asarray(xq))
cov1 = gp.Sum((gp.RBF(), gp.WhiteNoise()))
res1 = gp.fit_mle(cov1, jnp.ones(3, f32), xv, f(xv[:, 0]).astype(f32))
st1 = gp.factorize(cov1, res1.params, jnp.asarray(xv),
                   jnp.asarray(f(xv[:, 0]).astype(f32)))
m_p, _ = gp.predict(cov1, st1, jnp.asarray(xq), var="diag")
e_d = float(np.sqrt(np.mean((np.asarray(m_d) - f(xq[:, 0])) ** 2)))
e_p = float(np.sqrt(np.mean((np.asarray(m_p) - f(xq[:, 0])) ** 2)))
print(f"[1] gradient-enhanced GP: rmse {e_d:.4f} with ∇f vs "
      f"{e_p:.4f} values-only  ({time.time()-t0:.1f}s)")

# --- 2. multi-fidelity AR(1) co-kriging ------------------------------
def hi(x):
    return np.sin(8 * x) * x

def lo(x):
    return 0.6 * hi(x) + 0.3 * x - 0.1   # correlated cheap model

x_lo = np.linspace(0, 1, 64, dtype=f32)[:, None]
x_hi = np.linspace(0, 1, 12, dtype=f32)[:, None]
xq1 = np.linspace(0.02, 0.98, 200, dtype=f32)[:, None]
cov = gp.Sum((gp.RBF(), gp.WhiteNoise()))
t0 = time.time()
mf = gp.MultiFidelityGP(x_lo, lo(x_lo[:, 0]), x_hi, hi(x_hi[:, 0]), cov)
mf.train()
m_mf, _ = mf.predict(jnp.asarray(xq1))
res_h = gp.fit_mle(cov, jnp.ones(3, f32), x_hi,
                   hi(x_hi[:, 0]).astype(f32))
st_h = gp.factorize(cov, res_h.params, jnp.asarray(x_hi),
                    jnp.asarray(hi(x_hi[:, 0]).astype(f32)))
m_h, _ = gp.predict(cov, st_h, jnp.asarray(xq1), var="diag")
e_mf = float(np.sqrt(np.mean((np.asarray(m_mf) - hi(xq1[:, 0])) ** 2)))
e_h = float(np.sqrt(np.mean((np.asarray(m_h) - hi(xq1[:, 0])) ** 2)))
print(f"[2] multi-fidelity GP: rmse {e_mf:.4f} with lo-fi data vs "
      f"{e_h:.4f} hi-only  ({time.time()-t0:.1f}s)")

# --- 3. heteroscedastic GP -------------------------------------------
nh = 400
xh = np.sort(rng.uniform(0, 4, nh)).astype(f32)[:, None]
sig = np.where(xh[:, 0] < 2.0, 0.05, 0.4).astype(f32)
yh = (np.sin(2 * xh[:, 0]) + sig * rng.normal(size=nh)).astype(f32)
t0 = time.time()
hgp = gp.HeteroscedasticGP(xh, yh)
hgp.train()
xqh = np.asarray([[1.0], [3.0]], dtype=f32)
noise = np.asarray(hgp.noise_at(jnp.asarray(xqh)))
print(f"[3] heteroscedastic GP: learned σ(1.0)={noise[0]**0.5:.3f} "
      f"(true 0.05), σ(3.0)={noise[1]**0.5:.3f} (true 0.40)  "
      f"({time.time()-t0:.1f}s)")

# --- 4. deep GP on a step function -----------------------------------
ns = 256
xs = np.sort(rng.uniform(-2, 2, ns)).astype(f32)[:, None]
ys = (np.sign(xs[:, 0]) + 0.05 * rng.normal(size=ns)).astype(f32)
xqs = np.linspace(-1.9, 1.9, 200, dtype=f32)[:, None]
t0 = time.time()
dgp = gp.DeepGP(xs, ys, widths=(1,), m=32).train(n_steps=400)
m_dg, _ = dgp.predict(jnp.asarray(xqs))
e_dg = float(np.sqrt(np.mean(
    (np.asarray(m_dg) - np.sign(xqs[:, 0])) ** 2
)))
print(f"[4] deep GP (2 layers): step-function rmse {e_dg:.3f}  "
      f"({time.time()-t0:.1f}s)")

# --- 5. GPLVM: unsupervised latent recovery --------------------------
nl = 80
t = np.sort(rng.uniform(-2, 2, nl))
Y = (np.stack([np.sin(t), np.cos(t), np.sin(2 * t), 0.5 * t,
               np.cos(2 * t)], axis=1)
     + 0.02 * rng.normal(size=(nl, 5))).astype(f32)
t0 = time.time()
lvm = gp.GPLVM(Y, q=1).train(max_iter=300)
lat = np.asarray(lvm.latents)[:, 0]
# rank correlation between learned latent and the true curve parameter
r = np.corrcoef(np.argsort(np.argsort(lat)),
                np.argsort(np.argsort(t)))[0, 1]
mean, _ = lvm.reconstruct()
rel = float(np.linalg.norm(np.asarray(mean) - Y) / np.linalg.norm(Y))
print(f"[5] GPLVM: latent rank-corr {abs(r):.4f}, reconstruction "
      f"error {rel:.3f}  ({time.time()-t0:.1f}s)")
