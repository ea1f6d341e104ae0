"""Exact GP regression end-to-end: fit hyperparameters on-device,
predict with calibrated uncertainty, report RMSE / NLPD.

Run: python examples/01_exact_gp.py          (TPU or CPU)
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import jax
import jax.numpy as jnp
import numpy as np

import pygpr_tpu as gp
from pygpr_tpu.models.metrics import nlpd, rmse

rng = np.random.default_rng(0)
n, noise = 1024, 0.1
x = rng.uniform(0, 4, (n, 1)).astype(np.float32)
y = (np.sin(2 * x[:, 0]) + noise * rng.normal(size=n)).astype(np.float32)
xs = np.linspace(0, 4, 400, dtype=np.float32)[:, None]
ys_true = np.sin(2 * xs[:, 0])

cov = gp.RBF() + gp.WhiteNoise()
# Start the noise near the data scale: the reference's 1e-4 init makes
# the f32 landscape nearly singular and traps the fit at n ≳ 1k dense.
p0 = cov.init_params(jnp.asarray(x)).at[-1].set(0.1 * float(np.std(y)))
res = gp.fit_mle(cov, p0, x, y, max_iter=100)
print("fitted params:", np.asarray(res.params), "nlml:", float(res.value))

state = gp.factorize(cov, res.params, jnp.asarray(x), jnp.asarray(y))
mean, var = gp.predict(cov, state, jnp.asarray(xs), var="diag")
print("rmse:", float(rmse(jnp.asarray(ys_true), mean)))
print("nlpd:", float(nlpd(jnp.asarray(ys_true), mean, var)))
