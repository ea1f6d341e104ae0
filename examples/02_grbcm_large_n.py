"""grBCM committee for large N on a single chip: Matérn-I partitioning,
per-expert training, β-weighted aggregation — experts streamed through
memory (`stream=True`).  Scale nc/nls up on bigger hardware, or shard
the expert axis over a mesh with pygpr_tpu.parallel.

Run: python examples/02_grbcm_large_n.py
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import jax.numpy as jnp
import numpy as np

import pygpr_tpu as gp
from pygpr_tpu.models.grbcm import GRBCM
from pygpr_tpu.models.metrics import nlpd, rmse
from pygpr_tpu.sample import Matern1

rng = np.random.default_rng(0)
nc, nls, ng, noise = 8, 1024, 256, 0.1
f = lambda x: np.sin(2 * np.asarray(x).sum(-1))

xl, xc = Matern1(seed=0).partition(nc, nls, jnp.zeros(2), jnp.full((2,), 4.0))
xl = jnp.asarray(np.asarray(xl, np.float32))
yl = jnp.asarray((f(xl) + noise * rng.normal(size=(nc, nls))).astype(np.float32))
xg = jnp.asarray(rng.uniform(0, 4, (ng, 2)).astype(np.float32))
yg = jnp.asarray((f(xg) + noise * rng.normal(size=ng)).astype(np.float32))

model = GRBCM(xl, yl, xg, yg, gp.RBF() + gp.WhiteNoise(), stream=True)
info = model.train(max_iter=60)
print("experts ok:", int(np.asarray(info.ok_l).sum()), "/", nc)

xs = jnp.asarray(rng.uniform(0, 4, (2000, 2)).astype(np.float32))
mean, var = model.predict(xs, var="diag")
ys = jnp.asarray(f(xs))
print("rmse:", float(rmse(ys, mean)), " nlpd:", float(nlpd(ys, mean, var)))
