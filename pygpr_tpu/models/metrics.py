"""Predictive-quality metrics (BASELINE.md: "RMSE / NLPD parity").

The reference computes neither; these are the standard definitions used
to compare against it on its test problems.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def rmse(y_true: Array, y_pred: Array) -> Array:
    """Root-mean-square error."""
    return jnp.sqrt(jnp.mean(jnp.square(y_pred - y_true), axis=-1))


def nlpd(y_true: Array, mean: Array, var: Array) -> Array:
    """Mean negative log predictive density under the Gaussian
    posterior:  −(1/n) Σ log N(yᵢ; μᵢ, σᵢ²)."""
    var = jnp.maximum(var, 1e-12)
    ll = -0.5 * (
        jnp.log(2.0 * math.pi * var)
        + jnp.square(y_true - mean) / var
    )
    return -jnp.mean(ll, axis=-1)


def standardized_mse(y_true: Array, mean: Array, var: Array) -> Array:
    """SMSE-style calibration check: mean of (y−μ)²/σ² — ≈1 when the
    predictive variances are calibrated."""
    return jnp.mean(jnp.square(y_true - mean) / jnp.maximum(var, 1e-12),
                    axis=-1)
