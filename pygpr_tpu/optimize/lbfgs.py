"""Pure-JAX L-BFGS hyperparameter optimization (the production path).

The reference drives hyperparameter fits through SciPy's host-side CG /
Nelder-Mead (``PyGPR/opt.py:50-57``, ``:102-108``), paying a host↔device
round-trip per LML-gradient evaluation.  The BASELINE north star asks
for L-BFGS.  This module runs optax's L-BFGS (zoom line search) inside a
``lax.while_loop`` so the **entire fit is one XLA program**: jittable,
vmappable over grBCM experts / restarts, and shardable over device
meshes — no per-iteration dispatch.

See ``pygpr_tpu/optimize/classic.py`` for the SciPy-parity drivers and
the reference's hand-rolled quadratic CG/BFGS.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
import optax.tree_utils as otu

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.models.likelihood import nlml
from pygpr_tpu.ops.kernels import Kernel

Array = jax.Array


class FitResult(NamedTuple):
    """Result of an on-device minimization."""

    params: Array     #: optimized parameters
    value: Array      #: final objective value
    grad_norm: Array  #: final gradient norm
    iters: Array      #: iterations taken
    converged: Array  #: grad_norm <= tol at exit


def minimize_lbfgs(
    fun: Callable[[Array], Array],
    x0: Array,
    *,
    max_iter: int = 200,
    tol: float = 1e-4,
    memory_size: int = 15,
) -> FitResult:
    """Minimize ``fun`` from ``x0`` with L-BFGS, fully on-device.

    ``tol`` is a gradient-norm stopping rule, matching the reference
    CG driver's ``gtol=1e-4`` (``opt.py:37-42``).
    """
    opt = optax.lbfgs(memory_size=memory_size)
    value_and_grad = optax.value_and_grad_from_state(fun)

    def step(carry):
        params, state = carry
        value, grad = value_and_grad(params, state=state)
        updates, state = opt.update(
            grad, state, params, value=value, grad=grad, value_fn=fun
        )
        params = optax.apply_updates(params, updates)
        return params, state

    def continuing(carry):
        _, state = carry
        it = otu.tree_get(state, "count")
        grad = otu.tree_get(state, "grad")
        return (it == 0) | ((it < max_iter) & (otu.tree_norm(grad) >= tol))

    init = (x0, opt.init(x0))
    params, state = jax.lax.while_loop(continuing, step, init)
    grad = otu.tree_get(state, "grad")
    gnorm = otu.tree_norm(grad)
    return FitResult(
        params=params,
        value=otu.tree_get(state, "value"),
        grad_norm=gnorm,
        iters=otu.tree_get(state, "count"),
        converged=gnorm < tol,
    )


def fit_mle(
    kern: Kernel,
    params0: Array,
    x: Array,
    y: Array,
    *,
    config: Config = DEFAULT,
    max_iter: int = 200,
    tol: float = 1e-4,
    memory_size: int = 15,
    log_space: bool = True,
    objective=None,
) -> FitResult:
    """Fit kernel hyperparameters by NLML minimization (L-BFGS).

    ``objective`` swaps the fit criterion: any
    ``f(kern, params, x, y, config) -> scalar`` — e.g.
    ``models.metrics.loo_nlpd`` for leave-one-out pseudo-likelihood
    selection (R&W §5.4.2).  Default: the NLML.

    ``log_space=True`` (default) optimizes u = log θ and returns
    θ = exp(u): the raw-parameter landscape from the reference's inits
    (noise 1e-4, ``covar.py:224``) is catastrophically scaled — SciPy CG
    stalls at the start point and raw L-BFGS finds the all-noise
    optimum, while log-space converges to the signal optimum in tens of
    iterations.  Set ``log_space=False`` for reference-parity raw
    optimization (kernels are sign-invariant: only θ² enters).

    Auto-vmaps over a leading committee axis — each expert gets an
    **independent** optimizer trajectory (line searches included), which
    is exactly the per-expert fit the reference's broken ``GRBCM.train``
    intended (``gr_bcm.py:52-97``, SURVEY.md §2.5).
    """

    from pygpr_tpu.models.likelihood import nlml_fast

    # "fast" routes the line search's value_and_grad through the
    # solve-free closed-form gradient (likelihood._nlml_vg_fast_one).
    if objective is not None:
        obj = objective
    else:
        obj = nlml_fast if config.grad_mode == "fast" else nlml

    def solve_one(p0, xx, yy):
        if log_space:
            u0 = jnp.log(jnp.abs(p0))
            res = minimize_lbfgs(
                lambda u: obj(kern, jnp.exp(u), xx, yy, config),
                u0,
                max_iter=max_iter,
                tol=tol,
                memory_size=memory_size,
            )
            return res._replace(params=jnp.exp(res.params))
        return minimize_lbfgs(
            lambda q: obj(kern, q, xx, yy, config),
            p0,
            max_iter=max_iter,
            tol=tol,
            memory_size=memory_size,
        )

    if x.ndim == 3:
        p_ax = 0 if params0.ndim == 2 else None
        return jax.vmap(solve_one, in_axes=(p_ax, 0, 0))(params0, x, y)
    return solve_one(params0, x, y)


def fit_map(
    kern: Kernel,
    params0: Array,
    x: Array,
    y: Array,
    priors,
    **kwargs,
) -> FitResult:
    """MAP fit: minimize ``nlml(θ) − Σᵢ log pᵢ(θᵢ)``.

    ``priors``: sequence aligned with the packed parameter vector
    (:mod:`pygpr_tpu.models.priors`); ``None`` entries are flat, so a
    single informative prior (e.g. ``HalfNormal`` on the noise) can
    regularize one coordinate while the rest stay at MLE.  Same
    keywords, committee auto-vmap, and log-space default as
    :func:`fit_mle` — the MAP point is the θ-space posterior mode
    regardless of the search parameterization.
    """
    from pygpr_tpu.models.likelihood import nlml_fast
    from pygpr_tpu.models.priors import log_prior

    config = kwargs.get("config", DEFAULT)
    base = nlml_fast if config.grad_mode == "fast" else nlml

    def objective(k, p, xx, yy, cfg):
        return base(k, p, xx, yy, cfg) - log_prior(priors, p)

    return fit_mle(kern, params0, x, y, objective=objective, **kwargs)
