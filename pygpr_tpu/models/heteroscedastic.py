"""Most-likely heteroscedastic GP (Kersting, Plagemann, Pfaff &
Burgard, ICML 2007): LEARN input-dependent observation noise.

The reference (and the plain exact GP here) assumes one global σₙ²;
``ops/fixed_noise.FixedNoise`` handles KNOWN per-point noise.  This
module closes the gap — noise that is neither constant nor known —
with the classic fixed-point composition of the pieces this engine
already has:

  1. fit a homoscedastic exact GP to (X, y);
  2. estimate the pointwise noise level from the posterior:
     zᵢ = log E[(yᵢ − f(xᵢ))²] = log((yᵢ − μᵢ)² + σᵢ²) — the
     "most-likely" empirical noise under the current fit;
  3. fit a SECOND exact GP (the noise GP) to (X, z) — smoothness in z
     is what turns n noisy squared residuals into a stable noise field;
  4. refit the mean GP with the predicted per-point noise variance
     exp(ẑ(X)) through the :class:`FixedNoise` kernel;
  5. iterate 2-4 (a damped fixed point; 2-4 rounds suffice).

Prediction composes both GPs: latent moments from the FixedNoise mean
GP, plus ``exp(ẑ(x*))`` observation noise for the predictive variance
(with the noise GP's own variance entering through the log-normal
mean, ``exp(μ_z + σ_z²/2)``).

Every stage is a standard on-device exact-GP fit — no new kernels, no
approximations beyond the MLHGP scheme itself.  Tests pin: constant
noise reduces to the homoscedastic GP's fit; a two-regime noise field
is recovered (ratio and location); held-out NLPD beats the
homoscedastic fit on heteroscedastic data.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.models import exact_gp
from pygpr_tpu.ops.fixed_noise import FixedNoise, with_noise
from pygpr_tpu.ops.kernels import RBF, Kernel, Sum, WhiteNoise

Array = jax.Array


class HGPState(NamedTuple):
    """Fitted heteroscedastic posterior."""

    state_mean: exact_gp.GPState   #: FixedNoise mean GP (x cols + s²)
    state_noise: exact_gp.GPState  #: noise GP on z = log noise var
    params_mean: Array
    params_noise: Array
    noise_train: Array             #: fitted per-point noise variance [n]
    z_mean: float                  #: centering offset of the noise GP


def fit_hgp(
    x: Array,
    y: Array,
    cov_mean: Optional[Kernel] = None,
    cov_noise: Optional[Kernel] = None,
    *,
    n_rounds: int = 3,
    damping: float = 1.0,
    max_iter: int = 100,
    config: Config = DEFAULT,
) -> HGPState:
    """Run the MLHGP fixed point.

    ``cov_mean`` is the LATENT kernel (no noise term — noise enters
    through FixedNoise); ``cov_noise`` models z = log σ²(x) and keeps
    its own WhiteNoise (the residuals' log is genuinely noisy).
    Host/device split follows the house rule: the iteration loop and
    noise-column assembly are host-side, each fit is one on-device
    L-BFGS.
    """
    from pygpr_tpu.optimize.lbfgs import fit_mle

    if cov_mean is None:
        cov_mean = RBF()
    if cov_noise is None:
        cov_noise = Sum((RBF(), WhiteNoise()))

    x_h = np.asarray(x)
    y_j = jnp.asarray(y)
    n = x_h.shape[0]
    dtype = y_j.dtype

    # round 0: homoscedastic warm start
    cov0 = Sum((cov_mean, WhiteNoise()))
    res0 = fit_mle(
        cov0, cov0.init_params(jnp.asarray(x_h)), jnp.asarray(x_h),
        y_j, max_iter=max_iter, config=config,
    )
    st0 = exact_gp.factorize(
        cov0, res0.params, jnp.asarray(x_h), y_j, config
    )
    mu, var = exact_gp.predict(cov0, st0, jnp.asarray(x_h), "diag",
                               config)
    noise_var = np.full(n, float(res0.params[-1]) ** 2)

    kern_fix = FixedNoise(cov_mean)
    params_m = None
    params_z = None
    st_m = st0
    st_z = None
    z_prev = np.log(np.maximum(noise_var, 1e-12))
    z_mean = float(np.mean(z_prev))
    first_round = True

    for _ in range(n_rounds):
        # 2. most-likely empirical log-noise under the current fit.
        # (y−μ)² ~ σ²·χ²₁ and E[log χ²₁] = ψ(½) + log 2 ≈ −1.2704: the
        # bias correction below is what keeps the log-space smoothing
        # from shrinking every noise level ~2× (measured on the
        # two-regime oracle: 0.24 vs true 0.4 without it).
        resid2 = np.square(np.asarray(mu) - np.asarray(y_j)) + np.asarray(
            var
        )
        z_emp = np.log(np.maximum(resid2, 1e-12)) + 1.2704
        # round 0 is never damped: the homoscedastic warm start's σₙ
        # can collapse to the interpolation mode (1e-4) on f32, and
        # damping toward log(1e-8) would poison the whole field
        z_cur = (
            z_emp if first_round
            else (1.0 - damping) * z_prev + damping * z_emp
        )
        first_round = False

        # 3. noise GP on z, CENTERED: z has a large negative mean
        # (log of small variances) that a zero-mean GP must otherwise
        # absorb into σ — on f32/TPU the uncentered fit can stall at
        # init and silently return exp(0) = 1 noise everywhere.
        z_mean = float(np.mean(z_cur))
        z_j = jnp.asarray(z_cur - z_mean, dtype)
        res_z = fit_mle(
            cov_noise, cov_noise.init_params(jnp.asarray(x_h)),
            jnp.asarray(x_h), z_j, max_iter=max_iter, config=config,
        )
        st_z = exact_gp.factorize(
            cov_noise, res_z.params, jnp.asarray(x_h), z_j, config
        )
        z_hat, _ = exact_gp.predict(
            cov_noise, st_z, jnp.asarray(x_h), "none", config
        )
        z_hat = np.asarray(z_hat) + z_mean
        noise_var = np.exp(z_hat)
        z_prev = z_hat

        # 4. mean GP with the predicted noise through FixedNoise
        x_aug = jnp.asarray(with_noise(x_h, noise_var), dtype)
        res_m = fit_mle(
            kern_fix, kern_fix.init_params(x_aug), x_aug, y_j,
            max_iter=max_iter, config=config,
        )
        st_m = exact_gp.factorize(kern_fix, res_m.params, x_aug, y_j,
                                  config)
        # LATENT moments at the train points: query noise column = 0 —
        # predicting at x_aug would fold the current noise estimate
        # into "var" and ratchet the next residual pass upward
        x_lat = jnp.asarray(with_noise(x_h, 0.0), dtype)
        mu, var = exact_gp.predict(kern_fix, st_m, x_lat, "diag",
                                   config)
        params_m, params_z = res_m.params, res_z.params

    return HGPState(
        state_mean=st_m, state_noise=st_z,
        params_mean=params_m, params_noise=params_z,
        noise_train=jnp.asarray(noise_var, dtype),
        z_mean=z_mean,
    )


def predict_hgp(
    state: HGPState,
    cov_mean: Kernel,
    cov_noise: Kernel,
    xq: Array,
    *,
    observation: bool = True,
    config: Config = DEFAULT,
) -> Tuple[Array, Array]:
    """Compose the two posteriors at ``xq``: latent moments from the
    FixedNoise mean GP (query noise column = 0: we predict the LATENT
    f), plus the log-normal mean of the noise GP for the observation
    variance."""
    xq_h = np.asarray(xq)
    xq_aug = jnp.asarray(
        with_noise(xq_h, 0.0), state.state_mean.y.dtype
    )
    kern_fix = (
        cov_mean if isinstance(cov_mean, FixedNoise)
        else FixedNoise(cov_mean)
    )
    mu, var = exact_gp.predict(
        kern_fix, state.state_mean, xq_aug, "diag", config
    )
    if not observation:
        return mu, var
    z_mu, z_var = exact_gp.predict(
        cov_noise, state.state_noise, jnp.asarray(xq), "diag", config
    )
    # log-normal mean, with the centering offset restored
    noise = jnp.exp(z_mu + state.z_mean + 0.5 * z_var)
    return mu, var + noise


class HeteroscedasticGP:
    """OO wrapper.

    >>> gp = HeteroscedasticGP(x, y)
    >>> gp.train()
    >>> mean, var = gp.predict(xq)            # observation variance
    >>> noise = gp.noise_at(xq)               # learned σ²(x)
    """

    def __init__(self, x, y, cov_mean: Optional[Kernel] = None,
                 cov_noise: Optional[Kernel] = None,
                 config: Config = DEFAULT):
        self.x = np.asarray(x)
        self.y = jnp.asarray(y)
        self.cov_mean = RBF() if cov_mean is None else cov_mean
        self.cov_noise = (
            Sum((RBF(), WhiteNoise())) if cov_noise is None
            else cov_noise
        )
        self.config = config
        self._state: Optional[HGPState] = None

    def train(self, n_rounds: int = 3, **kwargs) -> HGPState:
        self._state = fit_hgp(
            self.x, self.y, self.cov_mean, self.cov_noise,
            n_rounds=n_rounds, config=self.config, **kwargs,
        )
        return self._state

    def predict(self, xq, observation: bool = True):
        assert self._state is not None, "call train() first"
        return predict_hgp(
            self._state, self.cov_mean, self.cov_noise, xq,
            observation=observation, config=self.config,
        )

    def noise_at(self, xq):
        assert self._state is not None, "call train() first"
        z_mu, z_var = exact_gp.predict(
            self.cov_noise, self._state.state_noise,
            jnp.asarray(xq), "diag", self.config,
        )
        return jnp.exp(z_mu + self._state.z_mean + 0.5 * z_var)
