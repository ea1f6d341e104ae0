"""Bayesian hyperparameters: RWM and HMC posteriors over the kernel
parameters, with split-R-hat diagnostics.

Run: python examples/03_mcmc_posterior.py
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
from pygpr_tpu.sample import (
    posterior_moments,
    sample_posterior,
    sample_posterior_hmc,
    split_rhat,
)

rng = np.random.default_rng(0)
n, noise = 256, 0.1
x = jnp.asarray(rng.uniform(0, 3, (n, 1)).astype(np.float32))
y = jnp.sin(2 * x[:, 0]) + noise * jnp.asarray(
    rng.normal(size=n).astype(np.float32)
)
cov = gp.RBF() + gp.WhiteNoise()

for name, sampler in (("RWM", sample_posterior), ("HMC", sample_posterior_hmc)):
    res = sampler(cov, x, y, jax.random.PRNGKey(0),
                  n_samples=300, n_warmup=300, n_chains=4)
    mu, sd = posterior_moments(res.samples)
    print(f"{name}: accept={np.asarray(res.accept_rate).round(2)} "
          f"posterior noise={float(mu[-1]):.3f}±{float(sd[-1]):.3f} "
          f"(true {noise})  rhat={np.asarray(split_rhat(res.samples)).round(3)}")
