"""Parabolic step-size estimation (reference ``PyGPR/hp_update.py``).

Fits a parabola along the gradient direction from three loss
evaluations f(θ−εJ), f(θ), f(θ+εJ) (``hp_update.py:14-17``) and returns
the parabolic-minimum step γ = −½·C₁/C₂ (``hp_update.py:19-23``).
Intended for cheap hyperparameter re-tuning when the data changes
slightly (``hp_update.py:7-10``).

Two forms: a jittable on-device :func:`learn_rate` (the primitive the
north star wants coordinated across hosts — see
``pygpr_tpu.parallel``), and a host-facing :func:`get_learn_rate` with
reference-identical signature over a numpy-facing loss object.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import numpy as np

Array = jax.Array


def learn_rate(
    fun: Callable[[Array], Array],
    grad_fun: Callable[[Array], Array],
    params: Array,
    eps: float,
) -> Tuple[Array, Array]:
    """Jittable parabolic step size.  Returns (γ, J).

    γ multiplies the gradient for the update θ⁺ = θ − γ·J (the update
    itself is left to the caller, as in the reference where it is
    commented out, ``hp_update.py:24-26``).
    """
    f0 = fun(params)
    J = grad_fun(params)
    fp = fun(params - eps * J)
    fm = fun(params + eps * J)
    C1 = (fp - fm) / (2.0 * eps)
    C2 = (fp + fm - 2.0 * f0) / (2.0 * eps**2)
    return -0.5 * (C1 / C2), J


def get_learn_rate(current_param, loss_new, eps: float) -> float:
    """Reference-parity host API (``hp_update.py:6-28``):
    three evaluations through a numpy-facing loss object."""
    old_params = np.asarray(current_param)
    f0, J = loss_new.loss_and_grad(old_params)
    fp = loss_new.loss(old_params - eps * J)
    fm = loss_new.loss(old_params + eps * J)
    C1 = (fp - fm) / (2.0 * eps)
    C2 = (fp + fm - 2.0 * f0) / (2.0 * eps**2)
    return float(-0.5 * (C1 / C2))
