"""Bayesian optimization on exact-GP posteriors.

The reference stops at GP regression; this module adds the standard
consumer of a GP posterior — sequential model-based optimization
(Jones et al. 1998; Snoek et al. 2012) — built entirely from this
engine's jittable pieces:

  * acquisition functions over the posterior ``(μ, σ²)``:
    expected improvement (EI) and its numerically-stable log form
    (Ament et al. 2023, "LogEI"), lower confidence bound (LCB) and
    probability of improvement (PI) — all for **minimization**, the
    convention of the whole optimize package;
  * :func:`propose` — maximize the acquisition over a box by a raw
    random sweep followed by multi-start Adam ascent in a sigmoid
    reparameterization (iterates stay strictly inside the box, no
    projection step, ``lax.scan`` — one XLA program per proposal);
  * :func:`thompson_sample` — posterior-draw minimization over a
    candidate set (uses :func:`~pygpr_tpu.models.exact_gp
    .sample_predictive`);
  * :func:`propose_batch` — q-point batches for parallel evaluation
    (kriging-believer fantasization riding ``extend_state``, or q
    joint Thompson draws);
  * :class:`BayesOpt` — the ask/tell loop; ``tell`` extends the
    factorized state incrementally (:func:`~pygpr_tpu.models.exact_gp
    .extend_state`, O(n²) per new point), optionally refitting
    hyperparameters every ``refit_every`` observations.

TPU notes: each proposal is one jitted program (raw sweep + scan of
Adam steps — no per-step dispatch); acquisition gradients flow through
the predict GEMMs, so ascent runs on the MXU.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.models import exact_gp
from pygpr_tpu.models.exact_gp import GPState
from pygpr_tpu.ops.kernels import Kernel

Array = jax.Array

_SQRT2PI = math.sqrt(2.0 * math.pi)


def _phi(z):
    return jnp.exp(-0.5 * z * z) / _SQRT2PI


def _Phi(z):
    return 0.5 * (1.0 + jax.lax.erf(z / math.sqrt(2.0)))


def expected_improvement(mean, var, best) -> Array:
    """EI for minimization: E[max(0, best − f)] = σ(zΦ(z) + φ(z)),
    z = (best − μ)/σ."""
    sigma = jnp.sqrt(var)
    z = (best - mean) / sigma
    return sigma * (z * _Phi(z) + _phi(z))


def log_expected_improvement(mean, var, best) -> Array:
    """log EI, stable for z ≪ 0 where EI underflows (LogEI; the
    asymptotic branch uses h(z) → φ(z)/z² as z → −∞)."""
    sigma = jnp.sqrt(var)
    z = (best - mean) / sigma
    zs = jnp.where(z > -6.0, z, 0.0)  # keep the exact branch finite
    h = zs * _Phi(zs) + _phi(zs)
    exact = jnp.log(jnp.maximum(h, jnp.finfo(h.dtype).tiny))
    asym = (
        -0.5 * z * z
        - math.log(_SQRT2PI)
        - 2.0 * jnp.log(jnp.maximum(-z, 1e-12))
    )
    return jnp.log(sigma) + jnp.where(z > -6.0, exact, asym)


def lower_confidence_bound(mean, var, beta: float = 2.0) -> Array:
    """Negated LCB (so that *maximizing* the acquisition minimizes f):
    −(μ − β·σ)."""
    return -(mean - beta * jnp.sqrt(var))


def probability_of_improvement(mean, var, best) -> Array:
    """PI for minimization: Φ((best − μ)/σ)."""
    return _Phi((best - mean) / jnp.sqrt(var))


def _acq_values(kern, state, x, acq, best, beta, config) -> Array:
    mean, var = exact_gp.predict(kern, state, x, "diag", config)
    if acq == "log_ei":
        return log_expected_improvement(mean, var, best)
    if acq == "ei":
        return expected_improvement(mean, var, best)
    if acq == "lcb":
        return lower_confidence_bound(mean, var, beta)
    if acq == "pi":
        return probability_of_improvement(mean, var, best)
    raise ValueError(f"unknown acquisition {acq!r}")


def propose(
    kern: Kernel,
    state: GPState,
    bounds: Tuple[Array, Array],
    key: Array,
    *,
    acq: str = "log_ei",
    best: Optional[Array] = None,
    beta: float = 2.0,
    n_raw: int = 512,
    n_starts: int = 8,
    n_steps: int = 80,
    learning_rate: float = 0.1,
    config: Config = DEFAULT,
) -> Array:
    """Next evaluation point: argmax of the acquisition over the box.

    Raw sweep (``n_raw`` uniform candidates) seeds ``n_starts`` Adam
    ascents in the sigmoid reparameterization
    ``x = lo + (hi−lo)·σ(u)`` — iterates are strictly interior, the
    whole proposal is one jittable program.  Returns ``[d]``.
    """
    import optax

    lo = jnp.asarray(bounds[0], state.x.dtype)
    hi = jnp.asarray(bounds[1], state.x.dtype)
    d = state.x.shape[-1]
    if best is None:
        best = jnp.min(state.y)

    raw = lo + (hi - lo) * jax.random.uniform(
        key, (n_raw, d), dtype=state.x.dtype
    )
    vals = _acq_values(kern, state, raw, acq, best, beta, config)
    top = jax.lax.top_k(vals, n_starts)[1]
    x0 = raw[top]

    # sigmoid reparameterization (clipped strictly inside for the logit)
    frac = jnp.clip((x0 - lo) / (hi - lo), 1e-4, 1.0 - 1e-4)
    u0 = jnp.log(frac) - jnp.log1p(-frac)

    def to_x(u):
        return lo + (hi - lo) * jax.nn.sigmoid(u)

    def neg_acq(u):
        v = _acq_values(
            kern, state, to_x(u), acq, best, beta, config
        )
        return -jnp.sum(v)

    opt = optax.adam(learning_rate)

    def step(carry, _):
        u, opt_state = carry
        g = jax.grad(neg_acq)(u)
        updates, opt_state = opt.update(g, opt_state)
        return (optax.apply_updates(u, updates), opt_state), None

    (u, _), _ = jax.lax.scan(
        step, (u0, opt.init(u0)), None, length=n_steps
    )
    x = to_x(u)
    final = _acq_values(kern, state, x, acq, best, beta, config)
    return x[jnp.argmax(final)]


def thompson_sample(
    kern: Kernel,
    state: GPState,
    bounds: Tuple[Array, Array],
    key: Array,
    *,
    n_candidates: int = 512,
    config: Config = DEFAULT,
) -> Array:
    """Thompson sampling: draw one posterior function on a random
    candidate set and return its minimizer — the exploration-complete
    acquisition (no best/β knob)."""
    lo = jnp.asarray(bounds[0], state.x.dtype)
    hi = jnp.asarray(bounds[1], state.x.dtype)
    k1, k2 = jax.random.split(key)
    cand = lo + (hi - lo) * jax.random.uniform(
        k1, (n_candidates, state.x.shape[-1]), dtype=state.x.dtype
    )
    f = exact_gp.sample_predictive(kern, state, cand, k2, 1, config)[0]
    return cand[jnp.argmin(f)]


def propose_batch(
    kern: Kernel,
    state: GPState,
    bounds: Tuple[Array, Array],
    key: Array,
    q: int,
    *,
    acq: str = "log_ei",
    beta: float = 2.0,
    config: Config = DEFAULT,
    **propose_kwargs,
) -> Array:
    """``q``-point batch proposal for parallel evaluation.

    Sequential fantasization ("kriging believer", Ginsbourger et al.
    2010): propose greedily, fantasize the outcome as the posterior
    mean, append it by incremental block-Cholesky extension
    (:func:`~pygpr_tpu.models.exact_gp.extend_state`, O(n²) per
    fantasy — no refactorization), and repeat with the updated
    incumbent — the fantasy mass suppresses the acquisition near
    already-chosen points, so the batch spreads.

    ``acq="thompson"`` instead draws ``q`` independent posterior
    functions on one candidate set and returns each one's minimizer —
    a single jittable program (no fantasy loop), the
    exploration-complete batch strategy.

    Returns ``[q, d]``.
    """
    if acq == "thompson":
        lo = jnp.asarray(bounds[0], state.x.dtype)
        hi = jnp.asarray(bounds[1], state.x.dtype)
        n_candidates = propose_kwargs.get("n_raw", 512)
        k1, k2 = jax.random.split(key)
        cand = lo + (hi - lo) * jax.random.uniform(
            k1, (n_candidates, state.x.shape[-1]), dtype=state.x.dtype
        )
        f = exact_gp.sample_predictive(kern, state, cand, k2, q, config)
        return cand[jnp.argmin(f, axis=-1)]

    st = state
    best = jnp.min(state.y)
    pts = []
    for _ in range(q):
        key, sub = jax.random.split(key)
        xq = propose(
            kern, st, bounds, sub,
            acq=acq, best=best, beta=beta, config=config,
            **propose_kwargs,
        )
        pts.append(xq)
        fantasy, _ = exact_gp.predict(
            kern, st, xq[None], "none", config
        )
        st = exact_gp.extend_state(kern, st, xq[None], fantasy, config)
        best = jnp.minimum(best, fantasy[0])
    return jnp.stack(pts)


class BayesOpt:
    """Ask/tell Bayesian-optimization loop over an exact GP.

    ``ask()`` proposes the next point (jitted acquisition
    maximization); ``tell(x, y)`` appends the observation by
    incremental block-Cholesky extension — O(n²) per point, no
    refactorization — and refits hyperparameters (on-device L-BFGS)
    every ``refit_every`` observations.
    """

    def __init__(
        self,
        kern: Kernel,
        x0,
        y0,
        bounds,
        *,
        acq: str = "log_ei",
        beta: float = 2.0,
        refit_every: int = 5,
        seed: int = 0,
        config: Config = DEFAULT,
        propose_kwargs: Optional[dict] = None,
    ):
        self.kern = kern
        self.bounds = (jnp.asarray(bounds[0]), jnp.asarray(bounds[1]))
        self.acq = acq
        self.beta = beta
        self.refit_every = refit_every
        self.propose_kwargs = dict(propose_kwargs or {})
        self.config = config
        self.key = jax.random.PRNGKey(seed)
        self.x = jnp.atleast_2d(jnp.asarray(x0))
        self.y = jnp.asarray(y0)
        self.params = kern.init_params(self.x, config)
        self._since_fit = 0
        self._refit()

    def _refit(self):
        from pygpr_tpu.optimize.lbfgs import fit_mle

        res = fit_mle(
            self.kern, self.params, self.x, self.y, config=self.config,
            max_iter=100,
        )
        self.params = res.params
        self.state = exact_gp.factorize(
            self.kern, self.params, self.x, self.y, self.config
        )
        self._since_fit = 0

    @property
    def best(self):
        """(x_best, y_best) of the observations so far."""
        i = int(jnp.argmin(self.y))
        return self.x[i], self.y[i]

    def ask(self, q: int = 1) -> Array:
        """Next point ``[d]`` (default), or a ``[q, d]`` batch for
        parallel evaluation (:func:`propose_batch`)."""
        self.key, sub = jax.random.split(self.key)
        if q > 1:
            return propose_batch(
                self.kern, self.state, self.bounds, sub, q,
                acq=self.acq, beta=self.beta, config=self.config,
                **self.propose_kwargs,
            )
        if self.acq == "thompson":
            return thompson_sample(
                self.kern, self.state, self.bounds, sub,
                config=self.config,
            )
        return propose(
            self.kern, self.state, self.bounds, sub,
            acq=self.acq, beta=self.beta, config=self.config,
            **self.propose_kwargs,
        )

    def tell(self, x, y) -> None:
        x = jnp.atleast_2d(jnp.asarray(x, self.x.dtype))
        y = jnp.atleast_1d(jnp.asarray(y, self.y.dtype))
        self.x = jnp.concatenate([self.x, x], axis=0)
        self.y = jnp.concatenate([self.y, y], axis=0)
        self._since_fit += x.shape[0]
        if self._since_fit >= self.refit_every:
            self._refit()
        else:
            self.state = exact_gp.extend_state(
                self.kern, self.state, x, y, self.config
            )
