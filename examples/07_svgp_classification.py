"""GP classification + multi-output regression — the non-Gaussian /
multi-task layer the single-output Gaussian reference cannot express.

1. SVGP binary classification (Bernoulli-logit likelihood, whitened
   uncollapsed bound, minibatch Adam as ONE lax.scan).
2. Robust regression under 10% gross outliers (Student-t likelihood).
3. Two correlated outputs via the ICM coregionalization kernel:
   task 1 is never observed on half the domain, and its posterior
   there is carried by task 0's data through the learned B.

Run: python examples/07_svgp_classification.py     (TPU or CPU)
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
from pygpr_tpu.models import exact_gp, svgp

rng = np.random.default_rng(0)

# --- 1. binary classification -----------------------------------------
n = 4096
x = rng.uniform(0, 4, (n, 1)).astype(np.float32)
f = 3.0 * np.sin(2 * x[:, 0])
y = (rng.uniform(size=n) < 1 / (1 + np.exp(-f))).astype(np.float32)
z = np.linspace(0, 4, 32, dtype=np.float32)[:, None]

t0 = time.time()
res = svgp.fit(
    gp.RBF(), gp.BernoulliLogit(), jnp.asarray(x), jnp.asarray(y),
    jnp.asarray(z), batch_size=512, n_steps=500, learning_rate=0.08,
)
xs = np.linspace(0.05, 3.95, 256, dtype=np.float32)[:, None]
p_hat, _ = svgp.predict(gp.RBF(), gp.BernoulliLogit(), res.params,
                        jnp.asarray(xs))
fs = 3.0 * np.sin(2 * xs[:, 0])
dec = np.abs(fs) > 0.6
acc = float(np.mean(((np.asarray(p_hat) > 0.5) == (fs > 0))[dec]))
print(f"[1] logit SVGP  n={n}: -ELBO {float(res.losses[0]):.0f} -> "
      f"{float(res.losses[-1]):.0f}, decided-region acc {acc:.3f} "
      f"[{time.time()-t0:.1f}s]")

# --- 2. robust regression (Student-t) ----------------------------------
yr = np.sin(2 * x[:, 0]) + 0.1 * rng.normal(size=n)
out = rng.permutation(n)[: n // 10]
yr[out] += rng.choice([-8.0, 8.0], size=len(out))
t0 = time.time()
res_t = svgp.fit(
    gp.RBF(), gp.StudentTLik(nu=4.0), jnp.asarray(x),
    jnp.asarray(yr.astype(np.float32)), jnp.asarray(z),
    batch_size=512, n_steps=500, learning_rate=0.08,
)
mu_t, _ = svgp.predict(gp.RBF(), gp.StudentTLik(4.0), res_t.params,
                       jnp.asarray(xs), "f")
rmse = float(np.sqrt(np.mean((np.asarray(mu_t) - np.sin(2 * xs[:, 0])) ** 2)))
print(f"[2] student-t SVGP, 10% gross outliers: latent rmse {rmse:.3f} "
      f"[{time.time()-t0:.1f}s]")

# --- 3. multi-output transfer (ICM) -------------------------------------
n0, n1 = 192, 96
x0 = rng.uniform(0, 4, (n0, 1))
x1 = rng.uniform(0, 2, (n1, 1))               # task 1: left half only
y0 = np.sin(2 * x0[:, 0]) + 0.05 * rng.normal(size=n0)
y1 = 0.8 * np.sin(2 * x1[:, 0]) + 0.05 * rng.normal(size=n1)
xa, ya = gp.stack_outputs([x0, x1], [y0, y1])
xa = jnp.asarray(xa.astype(np.float32))
ya = jnp.asarray(ya.astype(np.float32))

kern = gp.ICM(gp.RBF(), n_outputs=2, rank=1) + gp.TaskNoise(2)
t0 = time.time()
fit = gp.fit_mle(kern, kern.init_params(xa), xa, ya, max_iter=150)
state = exact_gp.factorize(kern, fit.params, xa, ya)
xq = gp.with_task(np.linspace(2.2, 3.8, 64, dtype=np.float32)[:, None], 1)
mean, var = exact_gp.predict(kern, state, xq, "diag")
want = 0.8 * np.sin(2 * np.asarray(xq)[:, 0])
rmse_mt = float(np.sqrt(np.mean((np.asarray(mean) - want) ** 2)))
B = gp.ICM(gp.RBF(), 2, 1).coregion_matrix(
    fit.params[: gp.ICM(gp.RBF(), 2, 1).n_params(2)], 2
)
corr = float(B[0, 1] / jnp.sqrt(B[0, 0] * B[1, 1]))
print(f"[3] ICM transfer: task-1 rmse {rmse_mt:.3f} in its UNOBSERVED "
      f"half (learned task corr {corr:+.2f}) [{time.time()-t0:.1f}s]")
