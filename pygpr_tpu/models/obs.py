"""Observation likelihoods for the variational GP (``models/svgp.py``).

The reference is Gaussian-regression only (its likelihood IS the LML,
``/root/reference/PyGPR/loss.py:49-51``).  Non-Gaussian observations
(binary labels, counts) are what the uncollapsed variational bound
exists for; each likelihood here supplies the two quantities SVGP
needs, both as shape-``[nb]``-vectorized pure functions:

  * ``expected_log_lik(lp, y, mu, var)`` — the variational expectation
    ``E_{f ~ N(mu, var)}[log p(y | f)]`` (closed form where one exists,
    else fixed-node Gauss-Hermite quadrature — static shapes, pure
    ``jnp``, MXU/VPU friendly: the GH sum is one [nb, H] broadcast).
  * ``predict(lp, mu, var)`` — moments of the posterior predictive of
    the OBSERVATION given the latent marginal N(mu, var).
  * ``log_lik(lp, y, f)`` — the pointwise log density ``log p(y | f)``
    at a latent VALUE (not a distribution), elementwise over any
    broadcastable ``y/f`` shapes.  This is what the Laplace
    approximation (``models/laplace.py``) Newton-iterates on; its
    f-derivatives are taken by AD, so no hand-coded Hessians.

``lp`` is the likelihood's own (unconstrained, log-space) parameter
vector — e.g. Gaussian log σₙ; empty for Bernoulli/Poisson.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# 32-node Gauss-Hermite rule (physicists' convention): ∫N(f;μ,σ²)g(f)df
# = π^{-1/2} Σᵢ wᵢ g(μ + √2 σ xᵢ).  Exact for g polynomial up to degree
# 63 — beyond f32 resolution for the smooth integrands below.
_GH_X, _GH_W = np.polynomial.hermite.hermgauss(32)


def gauss_hermite(g, mu: Array, var: Array) -> Array:
    """``E_{f ~ N(mu, var)}[g(f)]`` elementwise over ``mu/var [nb]``."""
    x = jnp.asarray(_GH_X, mu.dtype)
    w = jnp.asarray(_GH_W / math.sqrt(math.pi), mu.dtype)
    f = mu[..., None] + jnp.sqrt(2.0 * var)[..., None] * x  # [nb, H]
    return jnp.sum(g(f) * w, axis=-1)


class GaussianLik:
    """y = f + ε, ε ~ N(0, σₙ²).  One parameter: log σₙ.

    Closed-form expectation (the classic SVGP regression term):
    ``E[log N(y|f,σₙ²)] = −½log 2πσₙ² − ((y−μ)² + σ²)/(2σₙ²)``.
    """

    n_params = 1

    def init_params(self, dtype=jnp.float32) -> Array:
        return jnp.zeros((1,), dtype)  # log σₙ = 0 → σₙ = 1

    def expected_log_lik(self, lp, y, mu, var):
        sn2 = jnp.exp(2.0 * lp[0])
        return -0.5 * (
            math.log(2.0 * math.pi)
            + 2.0 * lp[0]
            + ((y - mu) ** 2 + var) / sn2
        )

    def log_lik(self, lp, y, f):
        sn2 = jnp.exp(2.0 * lp[0])
        return -0.5 * (
            math.log(2.0 * math.pi) + 2.0 * lp[0] + (y - f) ** 2 / sn2
        )

    def predict(self, lp, mu, var):
        return mu, var + jnp.exp(2.0 * lp[0])

    def tilted_moments(self, lp, y, mu, var):
        """Exact moments of ``N(f; mu, var)·N(y; f, σₙ²)`` — a product
        of Gaussians, so EP (``models/ep.py``) with this likelihood
        terminates at the exact posterior and exact LML (the parity
        anchor the EP tests pin)."""
        sn2 = jnp.exp(2.0 * lp[0])
        tot = var + sn2
        log_z_hat = -0.5 * (
            math.log(2.0 * math.pi) + jnp.log(tot) + (y - mu) ** 2 / tot
        )
        var_hat = var * sn2 / tot
        mu_hat = var_hat * (mu / var + y / sn2)
        return log_z_hat, mu_hat, var_hat


class BernoulliLogit:
    """y ∈ {0, 1}, p(y=1|f) = σ(f).  GH quadrature expectation;
    predictive mean ``E[σ(f)]`` by the same rule."""

    n_params = 0

    def init_params(self, dtype=jnp.float32) -> Array:
        return jnp.zeros((0,), dtype)

    def expected_log_lik(self, lp, y, mu, var):
        s = 2.0 * y - 1.0  # ±1
        # log σ(s f) = −softplus(−s f), computed stably
        return gauss_hermite(
            lambda f: -jax.nn.softplus(-s[..., None] * f), mu, var
        )

    def log_lik(self, lp, y, f):
        return -jax.nn.softplus(-(2.0 * y - 1.0) * f)

    def predict(self, lp, mu, var):
        p = gauss_hermite(jax.nn.sigmoid, mu, var)
        return p, p * (1.0 - p)


class BernoulliProbit:
    """y ∈ {0, 1}, p(y=1|f) = Φ(f).  GH expectation; the predictive
    mean has the classic closed form ``Φ(μ/√(1+σ²))``."""

    n_params = 0

    def init_params(self, dtype=jnp.float32) -> Array:
        return jnp.zeros((0,), dtype)

    def expected_log_lik(self, lp, y, mu, var):
        s = 2.0 * y - 1.0
        return gauss_hermite(
            lambda f: jax.scipy.stats.norm.logcdf(s[..., None] * f),
            mu,
            var,
        )

    def log_lik(self, lp, y, f):
        return jax.scipy.stats.norm.logcdf((2.0 * y - 1.0) * f)

    def predict(self, lp, mu, var):
        p = jax.scipy.stats.norm.cdf(mu / jnp.sqrt(1.0 + var))
        return p, p * (1.0 - p)

    def tilted_moments(self, lp, y, mu, var):
        """Closed-form moments of ``N(f; mu, var)·Φ(s f)`` (R&W
        §3.9 eqs. 3.80-3.83) — used by the EP site updates
        (``models/ep.py``); the probit is the one likelihood whose
        tilted integrals are exact.  Returns ``(log Ẑ, μ̂, σ̂²)``."""
        s = 2.0 * y - 1.0
        denom = jnp.sqrt(1.0 + var)
        z = s * mu / denom
        log_z_hat = jax.scipy.stats.norm.logcdf(z)
        # N(z)/Φ(z), computed in log space for deep-tail stability
        ratio = jnp.exp(jax.scipy.stats.norm.logpdf(z) - log_z_hat)
        mu_hat = mu + s * var * ratio / denom
        var_hat = var - var**2 * ratio * (z + ratio) / (1.0 + var)
        return log_z_hat, mu_hat, var_hat


class StudentTLik:
    """y = f + ε, ε ~ Student-t(ν, scale σ) — heavy-tailed robust
    regression (outliers get down-weighted instead of dragging the
    posterior).  GH quadrature expectation; ν > 2 fixed at
    construction, log σ is the trainable parameter.

    Predictive moments given q(f) = N(μ, σ_f²):
    mean μ, variance σ_f² + ν σ²/(ν − 2).
    """

    n_params = 1

    def __init__(self, nu: float = 4.0):
        if nu <= 2.0:
            raise ValueError("StudentTLik needs nu > 2 (finite variance)")
        self.nu = float(nu)

    def init_params(self, dtype=jnp.float32) -> Array:
        return jnp.zeros((1,), dtype)  # log σ = 0

    def expected_log_lik(self, lp, y, mu, var):
        nu = self.nu
        log_s = lp[0]
        lognorm = (
            jax.lax.lgamma(jnp.asarray((nu + 1.0) / 2.0, mu.dtype))
            - jax.lax.lgamma(jnp.asarray(nu / 2.0, mu.dtype))
            - 0.5 * math.log(nu * math.pi)
            - log_s
        )

        def logpdf(f):
            r2 = ((y[..., None] - f) / jnp.exp(log_s)) ** 2
            return lognorm - 0.5 * (nu + 1.0) * jnp.log1p(r2 / nu)

        return gauss_hermite(logpdf, mu, var)

    def log_lik(self, lp, y, f):
        nu = self.nu
        lognorm = (
            jax.lax.lgamma(jnp.asarray((nu + 1.0) / 2.0, f.dtype))
            - jax.lax.lgamma(jnp.asarray(nu / 2.0, f.dtype))
            - 0.5 * math.log(nu * math.pi)
            - lp[0]
        )
        r2 = ((y - f) / jnp.exp(lp[0])) ** 2
        return lognorm - 0.5 * (nu + 1.0) * jnp.log1p(r2 / nu)

    def predict(self, lp, mu, var):
        s2 = jnp.exp(2.0 * lp[0])
        return mu, var + self.nu * s2 / (self.nu - 2.0)


class PoissonLik:
    """y ∈ ℕ, rate λ = exp(f) (log link).  Closed-form expectation:
    ``E[y f − e^f − log y!] = y μ − e^{μ+σ²/2} − lgamma(y+1)``."""

    n_params = 0

    def init_params(self, dtype=jnp.float32) -> Array:
        return jnp.zeros((0,), dtype)

    def expected_log_lik(self, lp, y, mu, var):
        return (
            y * mu
            - jnp.exp(mu + 0.5 * var)
            - jax.lax.lgamma(y + 1.0)
        )

    def log_lik(self, lp, y, f):
        return y * f - jnp.exp(f) - jax.lax.lgamma(y + 1.0)

    def predict(self, lp, mu, var):
        # moments of a log-Gaussian-rate Poisson mixture
        m = jnp.exp(mu + 0.5 * var)
        v = m + (jnp.exp(var) - 1.0) * m * m
        return m, v
