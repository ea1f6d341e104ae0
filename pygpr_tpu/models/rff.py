"""Random Fourier features + pathwise posterior sampling.

Two modern scalable-GP primitives the reference lacks entirely (it is
dense-O(n³)-only, ``/root/reference/PyGPR/gpr.py:65-74``):

**Random Fourier features** (Rahimi & Recht, NeurIPS 2007).  By
Bochner's theorem a stationary kernel is the characteristic function of
its spectral measure; Monte-Carlo'ing that integral with ``m`` fixed
frequencies gives an explicit feature map

    K(x, x′) ≈ φ(x)ᵀφ(x′),   φ(x) = σ·√(2/m)·cos((x⊙ℓ)·Wᵀ + b)

under this package's inverse-lengthscale convention (reference
``covar.py:84-206``): the RBF ``σ²exp(−‖(x−x′)⊙ℓ‖²)`` draws
``W ~ N(0, 2I)`` rows, Matérn-ν draws multivariate-t rows with 2ν
degrees of freedom (the Matérn IS the t characteristic function).
GP regression then collapses to Bayesian linear regression in the
feature space: O(n·m²) fit, O(m²) per-query predict, exact NLML of the
*approximate* kernel via Woodbury — every op a tall MXU GEMM on an
[n, m] matrix, no n×n gram anywhere.  The low-rank complement to SGPR
(``models/sgpr.py``): random basis instead of optimized inducing
points, and — unlike SGPR's collapsed bound — an explicit
weight-space posterior to sample from.

**Pathwise conditioning** (Wilson et al., ICML 2020 "Efficiently
sampling functions from Gaussian process posteriors").  Matheron's
update splits a posterior function draw into

    f*(·) = fₚ(·)  +  K(·,X) (K + σₙ²I)⁻¹ (y − fₚ(X) − ε)

with fₚ an RFF *prior* draw and ε ~ N(0, σₙ²I): an entire continuous
posterior sample function for the cost of one weight vector and one
cached solve — O(m + n) per query point, versus O(nq³) for a joint
draw via ``exact_gp.sample_predictive``'s query-block Cholesky.  This
is the standard way to run large-batch Thompson sampling on a GP.

All randomness here is **host NumPy** (``make_basis`` /
``make_path_noise``): frequencies and draw noise are data, generated
once and passed into jitted code as arrays — never traced, per the
repo's host/device policy (a ``jax.random`` threefry compile over the
remote-TPU tunnel once took 251 s).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.models.exact_gp import GPState
from pygpr_tpu.ops import linalg
from pygpr_tpu.ops.kernels import Kernel

Array = jax.Array


class RFFBasis(NamedTuple):
    """Fixed random basis (host-generated, hyperparameter-free).

    ``freqs`` are *unit-scale* spectral draws; the kernel's inverse
    lengthscales enter through the input product ``x⊙ℓ`` at feature
    time, so hyperparameter gradients flow by AD with the basis held
    fixed (the reparameterization trick).
    """

    freqs: Array   #: [m, d] spectral frequencies at unit scale
    phases: Array  #: [m] uniform phase offsets in [0, 2π)


def make_basis(
    m: int,
    dim: int,
    *,
    profile: str = "rbf",
    nu: float = 1.5,
    seed: int = 0,
    dtype=np.float32,
) -> RFFBasis:
    """Draw the fixed spectral basis on the host.

    ``profile="rbf"``: W ~ N(0, 2I) (the spectral measure of
    ``exp(−‖r‖²)``).  ``profile="matern"``: W ~ √(2ν/g)·N(0, I) with
    g ~ χ²_{2ν} — the multivariate-t spectral measure matching
    ``ops/kernels.py::Matern``'s ``√(2ν)·r`` convention exactly.
    """
    rng = np.random.default_rng(seed)
    z = rng.standard_normal((m, dim))
    if profile == "rbf":
        w = math.sqrt(2.0) * z
    elif profile == "matern":
        assert nu in (0.5, 1.5, 2.5)
        g = rng.chisquare(2.0 * nu, size=(m, 1))
        w = z * np.sqrt(2.0 * nu / g)
    else:
        raise ValueError(f"unknown profile {profile!r}")
    b = rng.uniform(0.0, 2.0 * math.pi, size=m)
    return RFFBasis(
        freqs=jnp.asarray(w.astype(dtype)),
        phases=jnp.asarray(b.astype(dtype)),
    )


def feature_map(
    basis: RFFBasis,
    params: Array,
    x: Array,
    *,
    config: Config = DEFAULT,
) -> Array:
    """φ(x) ∈ [n, m] for kernel params ``[σ, ℓ₁..ℓ_d]`` (the RBF/Matérn
    layout of ``ops/kernels.py``) — one tall GEMM + cos."""
    sig, ls = params[0], params[1:]
    proj = jnp.dot(
        x * ls, basis.freqs.T, precision=config.precision
    )
    scale = sig * jnp.sqrt(
        jnp.asarray(2.0 / basis.freqs.shape[0], x.dtype)
    )
    return scale * jnp.cos(proj + basis.phases)


def gram(
    basis: RFFBasis,
    params: Array,
    x: Array,
    xp: Optional[Array] = None,
    *,
    config: Config = DEFAULT,
) -> Array:
    """Approximate kernel matrix φ(x)φ(x′)ᵀ — converges to the exact
    stationary kernel at O(m^{-1/2}) (tested against ``RBF.matrix``)."""
    fx = feature_map(basis, params, x, config=config)
    fxp = fx if xp is None else feature_map(
        basis, params, xp, config=config
    )
    return jnp.dot(fx, fxp.T, precision=config.precision)


class RFFState(NamedTuple):
    """Weight-space posterior: θ | y ~ N(θ̂, σₙ² A⁻¹), A = σₙ²I + ΦᵀΦ."""

    params: Array     #: [σ, ℓ₁..ℓ_d, σₙ]
    chol_a: Array     #: lower Cholesky of A [m, m]
    theta_hat: Array  #: posterior mean weights [m]
    jitter: Array
    ok: Array


def factorize_rff(
    basis: RFFBasis,
    params: Array,
    x: Array,
    y: Array,
    config: Config = DEFAULT,
) -> RFFState:
    """Fit the feature-space Bayesian linear regression.

    ``params = [σ, ℓ₁..ℓ_d, σₙ]`` (kernel layout + trailing noise, the
    same convention as ``Sum((RBF(), WhiteNoise()))``).  One [m, n]×
    [n, m] GEMM + one m×m laddered Cholesky.
    """
    kp, sn = params[:-1], params[-1]
    phi = feature_map(basis, kp, x, config=config)         # [n, m]
    m = phi.shape[1]
    a = jnp.dot(phi.T, phi, precision=config.precision)
    a = linalg.add_diag(a, jnp.square(sn))
    res = linalg.safe_cholesky(a, config)
    phi_y = jnp.dot(phi.T, y, precision=config.precision)
    theta_hat = linalg.cholesky_solve(res.chol, phi_y)
    return RFFState(
        params=params, chol_a=res.chol, theta_hat=theta_hat,
        jitter=res.jitter, ok=res.ok,
    )


def nlml_rff(
    basis: RFFBasis,
    params: Array,
    x: Array,
    y: Array,
    config: Config = DEFAULT,
) -> Array:
    """Exact NLML of the RFF-approximated model
    ``y ~ N(0, ΦΦᵀ + σₙ²I)`` in Woodbury form — all O(n·m² + m³),
    mirroring the reference formula (``loss.py:49-51``) with the dense
    gram eliminated:

      log|ΦΦᵀ + σₙ²I| = log|A| + (n − m)·log σₙ²
      yᵀ(ΦΦᵀ + σₙ²I)⁻¹y = (yᵀy − ‖L_A⁻¹Φᵀy‖²)/σₙ²
    """
    kp, sn = params[:-1], params[-1]
    n = y.shape[0]
    phi = feature_map(basis, kp, x, config=config)
    m = phi.shape[1]
    a = jnp.dot(phi.T, phi, precision=config.precision)
    a = linalg.add_diag(a, jnp.square(sn))
    res = linalg.safe_cholesky(a, config)
    phi_y = jnp.dot(phi.T, y, precision=config.precision)
    c = linalg.solve_lower(res.chol, phi_y)
    # effective n×n noise is σₙ² + the ladder's jitter (the factorized
    # A carries it), keeping the Woodbury identity exact to f64
    sn2 = jnp.square(sn) + res.jitter
    quad = (
        jnp.dot(y, y, precision=config.precision)
        - jnp.dot(c, c, precision=config.precision)
    ) / sn2
    logdet = 2.0 * linalg.half_logdet_from_chol(res.chol) + (
        n - m
    ) * jnp.log(sn2)
    return 0.5 * (
        quad + logdet + n * jnp.log(2.0 * jnp.asarray(math.pi, y.dtype))
    )


def predict_rff(
    basis: RFFBasis,
    state: RFFState,
    xp: Array,
    var: str = "diag",
    config: Config = DEFAULT,
):
    """Latent predictive moments: mean = φ*θ̂;
    cov = σₙ²·φ* A⁻¹ φ*ᵀ (full) or its diagonal."""
    kp, sn = state.params[:-1], state.params[-1]
    phi_s = feature_map(basis, kp, xp, config=config)      # [q, m]
    mean = jnp.dot(phi_s, state.theta_hat, precision=config.precision)
    if var == "none":
        return mean, None
    v = linalg.solve_lower(state.chol_a, phi_s.T)          # [m, q]
    sn2 = jnp.square(sn)
    if var == "diag":
        return mean, sn2 * jnp.sum(v * v, axis=0)
    return mean, sn2 * jnp.dot(
        v.T, v, precision=config.precision
    )


def sample_weights(state: RFFState, z: Array) -> Array:
    """Posterior weight draws θ = θ̂ + σₙ·L_A⁻ᵀ z from standard-normal
    ``z [s, m]`` (host-generated) → ``[s, m]``."""
    sn = state.params[-1]
    return state.theta_hat + sn * linalg.solve_lower_t(
        state.chol_a, z.T
    ).T


def fit_rff(
    basis: RFFBasis,
    x: Array,
    y: Array,
    params0: Optional[Array] = None,
    *,
    max_iter: int = 100,
    tol: float = 1e-4,
    config: Config = DEFAULT,
):
    """L-BFGS on the Woodbury NLML in log-space (the ``fit_mle``
    policy).  Returns ``(state, FitResult-like params, nlml)``."""
    from pygpr_tpu.optimize.lbfgs import minimize_lbfgs

    if params0 is None:
        d = x.shape[-1]
        params0 = jnp.concatenate(
            [jnp.ones((d + 1,), x.dtype), jnp.full((1,), 0.3, x.dtype)]
        )
    u0 = jnp.log(jnp.abs(params0))

    def objective(u):
        return nlml_rff(basis, jnp.exp(u), x, y, config)

    res = minimize_lbfgs(objective, u0, max_iter=max_iter, tol=tol)
    p_fit = jnp.exp(res.params)
    state = factorize_rff(basis, p_fit, x, y, config)
    return state, p_fit, res.value


# --------------------------------------------------------------------
# pathwise conditioning (Matheron's update)
# --------------------------------------------------------------------


class PathNoise(NamedTuple):
    """Host-generated randomness for ``s`` pathwise posterior draws."""

    theta: Array  #: [s, m] standard-normal prior weight draws
    eps: Array    #: [s, n] standard-normal observation-noise draws


def make_path_noise(
    n_draws: int, m: int, n: int, *, seed: int = 0, dtype=np.float32
) -> PathNoise:
    rng = np.random.default_rng(seed)
    return PathNoise(
        theta=jnp.asarray(
            rng.standard_normal((n_draws, m)).astype(dtype)
        ),
        eps=jnp.asarray(rng.standard_normal((n_draws, n)).astype(dtype)),
    )


def pathwise_draws(
    kern: Kernel,
    state: GPState,
    basis: RFFBasis,
    noise: PathNoise,
    xq: Array,
    *,
    sigma_n: Optional[Array] = None,
    config: Config = DEFAULT,
) -> Array:
    """``s`` continuous posterior function draws evaluated at ``xq``.

    ``state`` is an exact-GP posterior (``exact_gp.factorize`` over a
    kernel whose gram includes the noise block, e.g.
    ``Sum((RBF(), WhiteNoise()))``) and ``kern``/``basis`` describe its
    *stationary part*; ``sigma_n`` defaults to the trailing kernel
    parameter (the ``WhiteNoise`` σₙ of the Sum layout).  Per draw:

      f*(xq) = φ(xq)θ  +  K(xq, X)·(K + σₙ²I)⁻¹(y − φ(X)θ − σₙε)

    The solve reuses ``state.chol`` — already paid by the fit — so each
    extra draw costs two tall GEMMs.  Returns ``[s, nq]``.
    """
    kp = state.params[:-1]
    sn = state.params[-1] if sigma_n is None else sigma_n

    phi_x = feature_map(basis, kp, state.x, config=config)   # [n, m]
    phi_q = feature_map(basis, kp, xq, config=config)        # [q, m]
    prior_x = jnp.dot(
        noise.theta, phi_x.T, precision=config.precision
    )                                                        # [s, n]
    prior_q = jnp.dot(
        noise.theta, phi_q.T, precision=config.precision
    )                                                        # [s, q]
    resid = state.y[None, :] - prior_x - sn * noise.eps      # [s, n]
    v = linalg.cholesky_solve(state.chol, resid.T)           # [n, s]
    krn_sq = kern.matrix(kp, state.x, xq, config=config)     # [nq, n]
    upd = jnp.dot(krn_sq, v, precision=config.precision)     # [nq, s]
    return prior_q + upd.T
