"""Heteroscedastic regression with known per-point observation noise.

Beyond the reference (whose only noise model is the single learned
``σₙ²·I`` of ``White_noise``, ``covar.py:209-269``): many production
datasets come with *measured* error bars — replicate variances,
instrument noise, Monte-Carlo estimator variance — that differ per
sample.  :class:`FixedNoise` wraps any base kernel and adds a known
noise variance per training point:

    K = k_base(x, x') + diag(s²)        (train block)
    K = k_base(x, x')                   (cross blocks — noise never
                                         correlates, same rule as
                                         ``White_noise``, covar.py:242)

The noise variances ride in the LAST input column (``with_noise``
builds the augmented design), exactly like ``ops/coregion.py`` carries
task indices.  Because the noise is **data, not a hyperparameter**,
this composes with the entire engine unchanged — every NLML gradient
path, the on-device L-BFGS, MCMC over θ_base, committees, serving
states, online extension — and an MLE fit of the base kernel
automatically conditions on the known noise.

``diag`` at query points includes the query rows' own noise column
(mirroring ``White_noise.diag`` semantics: predictive variance of the
*observation*); pass a zero column to predict the latent ``f``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.ops.kernels import Kernel

Array = jax.Array


def with_noise(x, noise_var) -> np.ndarray:
    """HOST-side helper: append the per-point noise-VARIANCE column to
    a design matrix.  NumPy on purpose — data prep never traces onto
    the device (house rule).  ``noise_var`` may be a scalar (constant
    noise) or ``[n]``."""
    x = np.asarray(x)
    col = np.broadcast_to(
        np.asarray(noise_var, x.dtype).reshape(-1), (x.shape[0],)
    )
    return np.concatenate([x, col[:, None].astype(x.dtype)], axis=1)


class FixedNoise(Kernel):
    """Known per-point observation noise over ``base``.

    ``FixedNoise(RBF())`` on inputs ``[x…, s²]``;
    ``n_params(dim) = base.n_params(dim − 1)`` — the noise column is
    data, so the parameter vector (and its gradient) is the base
    kernel's alone.
    """

    def __init__(self, base: Kernel):
        if isinstance(base, FixedNoise):
            raise ValueError("nested FixedNoise is not supported")
        self.base = base

    def __hash__(self):
        return hash((type(self), self.base))

    def __eq__(self, other):
        return type(other) is FixedNoise and other.base == self.base

    def n_params(self, dim: int) -> int:
        return self.base.n_params(dim - 1)

    def init_params(self, x: Array, config: Config = DEFAULT) -> Array:
        return self.base.init_params(x[..., :-1], config)

    def matrix(
        self,
        params: Array,
        x: Array,
        xp: Optional[Array] = None,
        *,
        config: Config = DEFAULT,
    ) -> Array:
        if xp is None:
            k = self.base.matrix(params, x[..., :-1], config=config)
            return k + jnp.diag(x[..., -1])
        return self.base.matrix(
            params, x[..., :-1], xp[..., :-1], config=config
        )

    def diag(self, params: Array, x: Array, *, config: Config = DEFAULT):
        return (
            self.base.diag(params, x[..., :-1], config=config)
            + x[..., -1]
        )

    def matrix_and_grad(
        self, params: Array, x: Array, *, config: Config = DEFAULT
    ):
        k, dk = self.base.matrix_and_grad(
            params, x[..., :-1], config=config
        )
        return k + jnp.diag(x[..., -1]), dk
