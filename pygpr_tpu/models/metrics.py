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


def loo_cv(state) -> tuple:
    """Closed-form leave-one-out posterior from ONE factorization
    (Rasmussen & Williams §5.4.2):

        μᵢ^loo = yᵢ − [K⁻¹y]ᵢ / [K⁻¹]ᵢᵢ,     σᵢ²^loo = 1 / [K⁻¹]ᵢᵢ

    — n exact LOO refits for the price of the inverse's diagonal, vs n
    separate O(n³) factorizations done naively.  Takes an exact-GP
    ``GPState`` (its ``weights`` are already K⁻¹y); returns
    ``(loo_mean [n], loo_var [n])``.  No reference analogue.
    """
    from pygpr_tpu.ops import linalg

    if state.tinv is not None:
        kinv_diag = jnp.sum(jnp.square(state.tinv), axis=0)
    else:
        T = linalg.tri_inverse_doubling(state.chol)
        kinv_diag = jnp.sum(jnp.square(T), axis=0)
    var = 1.0 / kinv_diag
    mean = state.y - state.weights * var
    return mean, var


def loo_nlpd(kern, params, x, y, config=None) -> Array:
    """Negative mean LOO log predictive density — a differentiable
    model-selection objective (R&W eq. 5.11), more robust to prior
    misspecification than the LML; drop-in for ``nlml`` in the
    optimizers (``optimize.lbfgs.fit_mle(objective=loo_nlpd)``)."""
    from pygpr_tpu.config import DEFAULT
    from pygpr_tpu.models import exact_gp

    cfg = config if config is not None else DEFAULT
    state = exact_gp.factorize(kern, params, x, y, cfg)
    mean, var = loo_cv(state)
    return nlpd(y, mean, var)
