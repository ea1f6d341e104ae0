"""GPLVM — Gaussian process latent variable model (Lawrence, JMLR
2005): unsupervised nonlinear dimensionality reduction.

Beyond the reference: PyGPR is supervised-only (x given,
``gpr.py:51``).  The GPLVM *learns* the inputs: observed Y [n, p] is
modeled as p independent GPs over a shared latent X [n, q],

    p(Y | X, θ) = Π_j N(y_j ; 0, K(X) + σₙ²I),

and (X, θ) are fitted jointly by MAP (standard-normal prior on the
latents).  With a :class:`~pygpr_tpu.ops.kernels.Linear` kernel the
MAP solution recovers probabilistic PCA's principal subspace
(Lawrence §3.1) — the classical oracle the tests pin; with RBF it is
nonlinear dimensionality reduction.

TPU-first shape:

  * All p output dims share ONE Cholesky of the [n, n] latent gram:
    the joint NLML is ``p·(Σ log Lᵢᵢ + n/2·log 2π) + ½‖L⁻¹Y‖²_F`` —
    one potrf + one [n, p] triangular solve (MXU GEMM-shaped), not p
    separate factorizations.
  * The fit is one on-device L-BFGS over the packed vector
    ``[X.ravel(), log θ]`` (latents live in raw space, kernel
    hyperparameters in log space) — jitted end-to-end through the
    jitter-laddered Cholesky, no host round-trips.
  * PCA init (host NumPy SVD — one-time data prep stays off the
    accelerator, house rule).

Reference call sites this generalizes: the NLML formula
``loss.py:49-51`` (here traced with X as a *variable*), the kernel
protocol ``covar.py:9-25`` (any differentiable house kernel works).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.ops import linalg
from pygpr_tpu.ops.kernels import Kernel, RBF, Sum, WhiteNoise

Array = jax.Array


def nlml_multi(
    kern: Kernel,
    params: Array,
    x: Array,
    y2d: Array,
    *,
    config: Config = DEFAULT,
) -> Array:
    """Joint NLML of p independent GPs sharing one gram:
    ``Y [n, p]``, one Cholesky, one [n, p] solve."""
    n, p = y2d.shape
    K = kern.matrix(params, x, config=config)
    res = linalg.safe_cholesky(K, config)
    a = linalg.solve_lower(res.chol, y2d)                     # [n, p]
    return (
        0.5 * jnp.sum(jnp.square(a))
        + p * jnp.sum(jnp.log(jnp.diagonal(res.chol)))
        + 0.5 * n * p * jnp.log(2.0 * jnp.pi)
    )


class GPLVMResult(NamedTuple):
    latents: Array    #: MAP latent positions [n, q]
    params: Array     #: kernel hyperparameters [nhp]
    value: Array      #: final MAP objective
    grad_norm: Array
    iters: Array


def pca_init(y2d: np.ndarray, q: int) -> np.ndarray:
    """Host-side PCA scores (scaled to unit variance) as the latent
    init — the standard GPLVM starting point (Lawrence §4)."""
    yc = np.asarray(y2d) - np.asarray(y2d).mean(0)
    u, s, _ = np.linalg.svd(yc, full_matrices=False)
    x0 = u[:, :q] * s[:q]
    return x0 / (x0.std(0) + 1e-12)


def fit(
    kern: Kernel,
    y2d: Array,
    q: int = 2,
    *,
    x0: Optional[Array] = None,
    params0: Optional[Array] = None,
    prior_weight: float = 1.0,
    max_iter: int = 300,
    config: Config = DEFAULT,
) -> GPLVMResult:
    """Joint MAP fit of latents + hyperparameters by on-device L-BFGS.

    Objective: ``nlml_multi + prior_weight·½‖X‖²`` (the latent prior
    breaks the scale/rotation degeneracy; set ``prior_weight=0`` for
    pure MLE).
    """
    from pygpr_tpu.optimize.lbfgs import minimize_lbfgs

    y2d = jnp.asarray(y2d)
    n, p = y2d.shape
    if x0 is None:
        x0 = jnp.asarray(pca_init(np.asarray(y2d), q), y2d.dtype)
    x0 = jnp.asarray(x0, y2d.dtype)
    if params0 is None:
        # All-ones, not kern.init_params: the reference's 1e-4 noise
        # init conditions the gram so badly the joint (X, θ) landscape
        # traps L-BFGS in a worse embedding than its own PCA init
        # (house policy — same fix as grBCM/MCMC training starts).
        params0 = jnp.ones(kern.n_params(q), y2d.dtype)
    nhp = params0.shape[0]

    def unpack(u):
        return u[: n * q].reshape(n, q), jnp.exp(u[n * q:])

    def objective(u):
        x, theta = unpack(u)
        return nlml_multi(
            kern, theta, x, y2d, config=config
        ) + 0.5 * prior_weight * jnp.sum(jnp.square(x))

    u0 = jnp.concatenate([x0.reshape(-1), jnp.log(jnp.abs(params0))])
    res = minimize_lbfgs(objective, u0, max_iter=max_iter)
    x, theta = unpack(res.params)
    return GPLVMResult(
        latents=x,
        params=theta,
        value=res.value,
        grad_norm=res.grad_norm,
        iters=res.iters,
    )


def reconstruct(
    kern: Kernel,
    params: Array,
    x: Array,
    y2d: Array,
    xq: Optional[Array] = None,
    *,
    config: Config = DEFAULT,
) -> Tuple[Array, Array]:
    """Posterior mean/variance of Y at latent positions xq (default:
    the training latents — the model's reconstruction of Y).  One
    factorization serves all p output dims."""
    y2d = jnp.asarray(y2d)
    K = linalg.add_diag(
        kern.matrix(params, x, config=config), config.jitter
    )
    res = linalg.safe_cholesky(K, config)
    w = linalg.cholesky_solve(res.chol, y2d)                  # [n, p]
    xq = x if xq is None else xq
    ks = kern.matrix(params, x, xq, config=config)            # [m, n]
    mean = jnp.matmul(ks, w, precision=config.precision)      # [m, p]
    v = linalg.solve_lower(res.chol, ks.T)                    # [n, m]
    var = jnp.maximum(
        kern.diag(params, xq, config=config) - jnp.sum(v * v, 0),
        jnp.asarray(config.jitter, mean.dtype),
    )
    return mean, var


class GPLVM:
    """OO wrapper: ``GPLVM(Y, q=2).train()``; latents in ``.latents``,
    reconstruction via ``.reconstruct()``.  Kernel defaults to
    RBF + WhiteNoise over the latent space."""

    def __init__(
        self,
        y2d,
        q: int = 2,
        kern: Optional[Kernel] = None,
        config: Config = DEFAULT,
    ):
        self.y2d = jnp.asarray(y2d)
        self.q = q
        self.kern = kern if kern is not None else Sum(
            (RBF(), WhiteNoise())
        )
        self.config = config
        self.latents: Optional[Array] = None
        self.params: Optional[Array] = None

    def train(self, **kw) -> "GPLVM":
        res = fit(self.kern, self.y2d, self.q, config=self.config, **kw)
        self.latents, self.params = res.latents, res.params
        self.value = res.value
        return self

    def reconstruct(self, xq=None):
        assert self.latents is not None, "call train() first"
        return reconstruct(
            self.kern, self.params, self.latents, self.y2d,
            None if xq is None else jnp.asarray(xq),
            config=self.config,
        )
