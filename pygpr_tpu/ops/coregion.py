"""Multi-output GPs via intrinsic coregionalization (ICM).

Beyond the reference (single-output only): the standard multi-task GP
construction — t correlated outputs share one latent structure,

    K((x, i), (x', j)) = B[i, j] · k_base(x, x'),
    B = W Wᵀ + diag(κ²)          (B ⪰ 0 by construction, rank-r W)

where ``i, j`` are output/task indices carried in the LAST input
column.  This composes with the whole existing engine unchanged —
exact GP, NLML fits, MCMC, committees — because it is *just a kernel*
over the augmented input ``[x…, task]``.  Cross-task transfer (task i's
data informing task j's posterior through B) is the payoff, pinned by
the tests.

TPU notes: the base gram is one MXU build over all stacked samples;
the coregionalization factor is a gather of the tiny [t, t] matrix B —
fused by XLA into the same elementwise pass that scales the gram.
Static shapes throughout (tasks are data, not shapes).

Parameter packing (``params = [θ_base…, W.ravel()(t·r), κ(t)]``):
``κ`` enters squared (house convention: positives are stored as their
square roots, cf. σ/σₙ in ``ops/kernels.py``), ``W`` unconstrained.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.ops.kernels import Kernel

Array = jax.Array


def with_task(x, task: int):
    """Append a constant task-index column (host or device array)."""
    x = jnp.asarray(x)
    col = jnp.full((x.shape[0], 1), float(task), x.dtype)
    return jnp.concatenate([x, col], axis=1)


def stack_outputs(
    xs: Sequence, ys: Sequence
) -> Tuple[np.ndarray, np.ndarray]:
    """HOST-side assembly of a multi-output training set: per-task
    inputs/targets → one augmented ``[Σn, d+1]`` design (task index in
    the last column) + stacked targets.  NumPy on purpose — data prep
    never traces onto the device (house rule)."""
    xa, ya = [], []
    for t, (x, y) in enumerate(zip(xs, ys)):
        x = np.asarray(x)
        xa.append(
            np.concatenate(
                [x, np.full((x.shape[0], 1), float(t), x.dtype)], axis=1
            )
        )
        ya.append(np.asarray(y))
    return np.concatenate(xa, 0), np.concatenate(ya, 0)


class ICM(Kernel):
    """Intrinsic coregionalization model over ``base``.

    ``ICM(RBF(), n_outputs=2, rank=1)`` on inputs ``[x…, task]``.
    ``n_params(dim) = base.n_params(dim−1) + t·r + t``.
    """

    def __init__(self, base: Kernel, n_outputs: int, rank: int = 1):
        if isinstance(base, ICM):
            raise ValueError("nested ICM is not supported")
        self.base = base
        self.n_outputs = int(n_outputs)
        self.rank = int(rank)

    def __hash__(self):
        return hash((type(self), self.base, self.n_outputs, self.rank))

    def __eq__(self, other):
        return (
            type(other) is ICM
            and other.base == self.base
            and other.n_outputs == self.n_outputs
            and other.rank == self.rank
        )

    def _split(self, params: Array, dim: int):
        nb = self.base.n_params(dim - 1)
        t, r = self.n_outputs, self.rank
        theta_b = params[..., :nb]
        W = params[..., nb: nb + t * r].reshape(
            params.shape[:-1] + (t, r)
        )
        kappa = params[..., nb + t * r:]
        return theta_b, W, kappa

    def coregion_matrix(self, params: Array, dim: int) -> Array:
        """B = W Wᵀ + diag(κ²), ``[t, t]``."""
        _, W, kappa = self._split(params, dim)
        return jnp.matmul(W, jnp.swapaxes(W, -1, -2)) + jnp.diag(
            jnp.square(kappa)
        )

    def n_params(self, dim: int) -> int:
        return (
            self.base.n_params(dim - 1)
            + self.n_outputs * self.rank
            + self.n_outputs
        )

    def matrix(self, params, x, xp=None, *, config: Config = DEFAULT):
        dim = x.shape[-1]
        theta_b, _, _ = self._split(params, dim)
        B = self.coregion_matrix(params, dim)
        ti = x[:, -1].astype(jnp.int32)
        if xp is None:
            kb = self.base.matrix(theta_b, x[:, :-1], config=config)
            return B[ti[:, None], ti[None, :]] * kb
        tj = xp[:, -1].astype(jnp.int32)
        kb = self.base.matrix(
            theta_b, x[:, :-1], xp[:, :-1], config=config
        )                                            # [m, n] rows=xp
        return B[tj[:, None], ti[None, :]] * kb

    def diag(self, params, x, *, config: Config = DEFAULT):
        dim = x.shape[-1]
        theta_b, _, _ = self._split(params, dim)
        ti = x[:, -1].astype(jnp.int32)
        B = self.coregion_matrix(params, dim)
        return jnp.diagonal(B)[ti] * self.base.diag(
            theta_b, x[:, :-1], config=config
        )

    def matrix_and_grad(self, params, x, *, config: Config = DEFAULT):
        krn = self.matrix(params, x, config=config)
        jac = jax.jacfwd(
            lambda p: self.matrix(p, x, config=config)
        )(params)
        return krn, jnp.moveaxis(jac, -1, 0)


class TaskNoise(Kernel):
    """Per-task observation noise: ``K = diag(σ_{task(i)}²)`` on the
    train block, identically zero on cross blocks (the multi-output
    version of :class:`~pygpr_tpu.ops.kernels.WhiteNoise`,
    ``covar.py:227-243``).  Params ``[σ₁..σ_t]``, init 1e-4 each
    (reference noise init, ``covar.py:224``)."""

    def __init__(self, n_outputs: int):
        self.n_outputs = int(n_outputs)

    def __hash__(self):
        return hash((type(self), self.n_outputs))

    def __eq__(self, other):
        return (
            type(other) is TaskNoise
            and other.n_outputs == self.n_outputs
        )

    def n_params(self, dim: int) -> int:
        return self.n_outputs

    def _init_flat(self, nhp, dtype, config: Config):
        return jnp.full((nhp,), 1e-4, dtype=dtype)

    def matrix(self, params, x, xp=None, *, config: Config = DEFAULT):
        n = x.shape[-2]
        if xp is not None:
            return jnp.zeros((xp.shape[-2], n), x.dtype)
        ti = x[:, -1].astype(jnp.int32)
        return jnp.diag(jnp.square(params)[ti])

    def diag(self, params, x, *, config: Config = DEFAULT):
        ti = x[:, -1].astype(jnp.int32)
        return jnp.square(params)[ti]

    def matrix_and_grad(self, params, x, *, config: Config = DEFAULT):
        krn = self.matrix(params, x, config=config)
        ti = x[:, -1].astype(jnp.int32)
        n = x.shape[-2]
        eye = jnp.eye(n, dtype=x.dtype)
        onehot = (
            ti[None, :] == jnp.arange(self.n_outputs)[:, None]
        ).astype(x.dtype)                              # [t, n]
        dkrn = 2.0 * params[:, None, None] * onehot[:, :, None] * eye
        return krn, dkrn
