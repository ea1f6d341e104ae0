"""Gradient-enhanced GP — regression with derivative observations
(R&W §9.4; "gradient-enhanced kriging" in the surrogate-modeling
literature).

Beyond the reference: PyGPR conditions on function values only
(``gpr.py:65-74``).  Differentiating a GP is a linear operation, so
``(f, ∇f)`` is jointly Gaussian with covariances

    cov(f(x),    f(x'))     = k(x, x')
    cov(∂ₖf(x),  f(x'))     = ∂k/∂xₖ (x, x')
    cov(∂ₖf(x),  ∂ₗf(x'))   = ∂²k/∂xₖ∂x'ₗ (x, x'),

and conditioning on observed gradients (adjoint solves, simulation
derivatives, force data in ML potentials) is just exact GP regression
on the stacked joint system.

TPU-first design:

  * The derivative blocks are built by **autodiff of the kernel
    function itself** (`jax.grad` / forward-over-reverse for the
    Hessian block), vmapped over point pairs — every differentiable
    house kernel that is **smooth in the squared distance** works
    unchanged (RBF, RationalQuadratic, Linear, Periodic, and
    Sum/Product/ActiveDims trees of them), no hand-derived formulas to
    maintain.  The Matérn family is excluded: its |τ| dependence is
    not C² at coincident points, so AD of its gram there is undefined
    (ν=5/2's limit exists but needs a hand closed form — not wired).
    The [n·(1+d)]² joint gram is static-shaped and feeds the standard
    jitter-laddered Cholesky.
  * The joint system reuses the whole existing stack: ``safe_cholesky``
    + triangular solves for factorize/NLML/predict, and fits run
    through :func:`pygpr_tpu.optimize.lbfgs.minimize_lbfgs` on device.
  * Observation noise is per-channel (σ_f on values, σ_g on
    gradients) — the reference's WhiteNoise is a *value-block*
    concept; pass a noise-free base kernel here.

Layout: joint vector = ``[f(x₁..x_n), ∂₁f(xg₁), …, ∂_df(xg₁), ∂₁f(xg₂), …]``
(gradient entries grouped per point, C-order of ``g.ravel()``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.ops import linalg
from pygpr_tpu.ops.kernels import Kernel, WhiteNoise, Sum

Array = jax.Array


def _check_noise_free(kern: Kernel):
    """Reject WhiteNoise anywhere in the kernel tree.

    A WhiteNoise embedded at ANY depth (inside Sum/Product/ActiveDims/
    ChangePoint) would land on the value-value block only — the
    derivative blocks go through the autodiff cross path where
    WhiteNoise is identically zero — silently producing a model that
    is neither the noise-free kernel nor the per-channel noise model.
    """
    if isinstance(kern, WhiteNoise):
        raise ValueError(
            "derivative GP takes a noise-free base kernel; noise is "
            "per-channel (sigma_f, sigma_g) — remove WhiteNoise "
            "(found embedded in the kernel tree)"
        )
    for child in (
        getattr(kern, "kernels", ())  # Sum / Product
        or ()
    ):
        _check_noise_free(child)
    for attr in ("base", "k1", "k2"):  # ActiveDims / ChangePoint
        child = getattr(kern, attr, None)
        if isinstance(child, Kernel):
            _check_noise_free(child)


def _scalar_k(kern: Kernel, params, config):
    """k(a, b) as a scalar function of two points (for autodiff)."""

    def k(a, b):
        return kern.matrix(
            params, a[None, :], b[None, :], config=config
        )[0, 0]

    return k


def joint_gram(
    kern: Kernel,
    params: Array,
    x: Array,
    xg: Array,
    *,
    config: Config = DEFAULT,
) -> Array:
    """Joint covariance of ``[f(x); ∇f(xg).ravel()]`` —
    ``[(n + ng·d), (n + ng·d)]``.

    Blocks by kernel autodiff, vmapped over point pairs:
    value–value is the plain gram; value–gradient is ∂k/∂b;
    gradient–gradient is the mixed Hessian ∂²k/∂a∂b
    (forward-over-reverse).
    """
    n, d = x.shape
    ng = xg.shape[0]
    k = _scalar_k(kern, params, config)
    kff = kern.matrix(params, x, config=config)               # [n, n]

    dk_b = jax.grad(k, argnums=1)                             # [d]
    # cov(f(a), ∂f(b)) for a in x, b in xg → [n, ng, d]
    kfg = jax.vmap(
        lambda a: jax.vmap(lambda b: dk_b(a, b))(xg)
    )(x)
    # cov(∂f(a), ∂f(b)): mixed Hessian [ng, ng, d, d]
    d2k = jax.jacfwd(dk_b, argnums=0)                         # [d, d] = ∂a∂b
    kgg = jax.vmap(
        lambda a: jax.vmap(lambda b: d2k(a, b))(xg)
    )(xg)
    # assemble: gradient entries grouped per point (C-order ravel)
    kfg2 = kfg.reshape(n, ng * d)
    # kgg[i, j, m, l] = ∂²k/∂a_l ∂b_m (a=xg_i, b=xg_j); the joint row
    # is (point i, ∂_l), the column (point j, ∂_m) → [i, l, j, m]
    kgg2 = jnp.transpose(kgg, (0, 3, 1, 2)).reshape(ng * d, ng * d)
    top = jnp.concatenate([kff, kfg2], axis=1)
    bot = jnp.concatenate([kfg2.T, kgg2], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _joint_cross(kern, params, xq, x, xg, config) -> Array:
    """cov(f(xq), [f(x); ∇f(xg)]) — ``[nq, n + ng·d]``."""
    nq = xq.shape[0]
    ng, d = xg.shape
    kqf = kern.matrix(params, x, xq, config=config)           # [nq, n]
    k = _scalar_k(kern, params, config)
    dk_b = jax.grad(k, argnums=1)
    kqg = jax.vmap(
        lambda a: jax.vmap(lambda b: dk_b(a, b))(xg)
    )(xq).reshape(nq, ng * d)
    return jnp.concatenate([kqf, kqg], axis=1)


class DerivGPState(NamedTuple):
    chol: Array      #: Cholesky factor of the joint gram + noise
    weights: Array   #: K⁻¹ [y; g]
    jitter: Array    #: ladder rung used
    ok: Array        #: factorization health


def joint_targets(y: Array, g: Array) -> Array:
    """Stack values and per-point gradient rows into the joint vector."""
    return jnp.concatenate([y, g.reshape(-1)])


def _noise_diag(n, ng, d, sigma_f, sigma_g, dtype):
    return jnp.concatenate(
        [
            jnp.full((n,), jnp.square(sigma_f), dtype),
            jnp.full((ng * d,), jnp.square(sigma_g), dtype),
        ]
    )


def factorize(
    kern: Kernel,
    params: Array,
    x: Array,
    y: Array,
    xg: Array,
    g: Array,
    *,
    sigma_f: float = 1e-2,
    sigma_g: float = 1e-2,
    config: Config = DEFAULT,
) -> DerivGPState:
    """Factorize the joint (value + gradient) system."""
    _check_noise_free(kern)
    n, d = x.shape
    ng = xg.shape[0]
    K = joint_gram(kern, params, x, xg, config=config)
    K = K + jnp.diag(
        _noise_diag(n, ng, d, sigma_f, sigma_g, K.dtype)
    )
    res = linalg.safe_cholesky(K, config)
    t = joint_targets(y, g)
    w = linalg.cholesky_solve(res.chol, t)
    return DerivGPState(
        chol=res.chol, weights=w, jitter=res.jitter, ok=res.ok
    )


def nlml(
    kern: Kernel,
    params: Array,
    x: Array,
    y: Array,
    xg: Array,
    g: Array,
    *,
    sigma_f: float = 1e-2,
    sigma_g: float = 1e-2,
    config: Config = DEFAULT,
) -> Array:
    """Joint-system negative log marginal likelihood (same formula as
    the reference's value-only NLML, ``loss.py:49-51``, on the stacked
    system)."""
    n, d = x.shape
    ng = xg.shape[0]
    K = joint_gram(kern, params, x, xg, config=config)
    K = K + jnp.diag(
        _noise_diag(n, ng, d, sigma_f, sigma_g, K.dtype)
    )
    res = linalg.safe_cholesky(K, config)
    t = joint_targets(y, g)
    a = linalg.solve_lower(res.chol, t)
    m = t.shape[0]
    return (
        0.5 * jnp.dot(a, a)
        + jnp.sum(jnp.log(jnp.diagonal(res.chol)))
        + 0.5 * m * jnp.log(2.0 * jnp.pi)
    )


def predict(
    kern: Kernel,
    params: Array,
    state: DerivGPState,
    x: Array,
    xg: Array,
    xq: Array,
    *,
    grad_out: bool = False,
    config: Config = DEFAULT,
) -> Union[Tuple[Array, Array], Tuple[Array, Array, Array]]:
    """Posterior (mean, diag variance) of f at xq; with
    ``grad_out=True`` returns the posterior mean of ∇f at xq as well:
    ``(mean, var, grad_mean)``."""
    kq = _joint_cross(kern, params, xq, x, xg, config)        # [nq, M]
    mean = kq @ state.weights
    v = linalg.solve_lower(state.chol, kq.T)                  # [M, nq]
    kdiag = kern.diag(params, xq, config=config)
    var = jnp.maximum(
        kdiag - jnp.sum(v * v, 0),
        jnp.asarray(config.jitter, kdiag.dtype),
    )
    if not grad_out:
        return mean, var
    # posterior mean gradient: differentiate the cross-covariances
    k = _scalar_k(kern, params, config)
    dk_a = jax.grad(k, argnums=0)
    dk_ab = jax.jacfwd(jax.grad(k, argnums=1), argnums=0)     # ∂a∂b
    # d/dxq of cov(f(xq), f(x_j)) → [nq, n, d]
    gf = jax.vmap(lambda a: jax.vmap(lambda b: dk_a(a, b))(x))(xq)
    # d/dxq of cov(f(xq), ∂f(xg_j)) → [nq, ng, d(q), d(g)]
    gg = jax.vmap(
        lambda a: jax.vmap(lambda b: dk_ab(a, b).T)(xg)
    )(xq)
    nq = xq.shape[0]
    ng, d = xg.shape
    kq_grad = jnp.concatenate(
        [
            jnp.transpose(gf, (0, 2, 1)),                     # [nq, d, n]
            jnp.transpose(gg, (0, 2, 1, 3)).reshape(nq, d, ng * d),
        ],
        axis=2,
    )                                                         # [nq, d, M]
    grad_mean = jnp.einsum(
        "qdm,m->qd", kq_grad, state.weights,
        precision=config.precision,
    )
    return mean, var, grad_mean


def fit(
    kern: Kernel,
    params0: Array,
    x: Array,
    y: Array,
    xg: Array,
    g: Array,
    *,
    fit_noise: bool = True,
    sigma_f: float = 1e-2,
    sigma_g: float = 1e-2,
    max_iter: int = 150,
    config: Config = DEFAULT,
):
    """Joint MLE of kernel hyperparameters (and, by default, the two
    noise scales) by on-device L-BFGS in log space."""
    from pygpr_tpu.optimize.lbfgs import minimize_lbfgs

    _check_noise_free(kern)
    nhp = params0.shape[0]
    if fit_noise:
        u0 = jnp.log(jnp.abs(jnp.concatenate(
            [params0, jnp.asarray([sigma_f, sigma_g], params0.dtype)]
        )))

        def obj(u):
            p = jnp.exp(u)
            return nlml(
                kern, p[:nhp], x, y, xg, g,
                sigma_f=p[nhp], sigma_g=p[nhp + 1], config=config,
            )

        res = minimize_lbfgs(obj, u0, max_iter=max_iter)
        p = jnp.exp(res.params)
        return res._replace(params=p[:nhp]), float(p[nhp]), float(p[nhp + 1])

    u0 = jnp.log(jnp.abs(params0))
    res = minimize_lbfgs(
        lambda u: nlml(
            kern, jnp.exp(u), x, y, xg, g,
            sigma_f=sigma_f, sigma_g=sigma_g, config=config,
        ),
        u0,
        max_iter=max_iter,
    )
    return res._replace(params=jnp.exp(res.params)), sigma_f, sigma_g


class DerivativeGP:
    """OO wrapper: condition on values (x, y) and gradients (xg, g).

    ``DerivativeGP(x, y, xg, g).train().predict(xq)``; noise scales
    are fitted jointly by default.
    """

    def __init__(
        self,
        x, y, xg, g,
        kern: Optional[Kernel] = None,
        config: Config = DEFAULT,
    ):
        from pygpr_tpu.ops.kernels import RBF

        self.kern = kern if kern is not None else RBF()
        _check_noise_free(self.kern)
        self.x = jnp.asarray(x)
        self.y = jnp.asarray(y)
        self.xg = jnp.asarray(xg)
        self.g = jnp.asarray(g)
        self.config = config
        self.params = self.kern.init_params(self.x, config)
        self.sigma_f = 1e-2
        self.sigma_g = 1e-2
        self._state = None

    def train(self, **kw) -> "DerivativeGP":
        res, sf, sg = fit(
            self.kern, self.params, self.x, self.y, self.xg, self.g,
            config=self.config, **kw,
        )
        self.params, self.sigma_f, self.sigma_g = res.params, sf, sg
        self._state = None
        return self

    def _ensure_state(self):
        if self._state is None:
            self._state = factorize(
                self.kern, self.params, self.x, self.y, self.xg,
                self.g, sigma_f=self.sigma_f, sigma_g=self.sigma_g,
                config=self.config,
            )
        return self._state

    def predict(self, xq, grad_out: bool = False):
        return predict(
            self.kern, self.params, self._ensure_state(), self.x,
            self.xg, jnp.asarray(xq), grad_out=grad_out,
            config=self.config,
        )
