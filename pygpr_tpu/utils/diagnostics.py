"""Numerical-failure detection & health reporting (SURVEY.md §5.2-5.3).

The reference's only failure handling is printing "Optimizer Failed"
(``PyGPR/opt.py:61-65``).  Here:

  * :func:`check_state` — inspect a (possibly batched) :class:`GPState`:
    factorization success, jitter escalation, NaN/Inf leaks.
  * :func:`expert_mask` — the healthy-expert mask for grBCM aggregation
    (feeds ``models.grbcm.aggregate(mask=...)``).
  * :func:`checkify_nlml` — a ``jax.experimental.checkify`` wrapper that
    turns silent NaNs in the NLML pipeline into reportable errors, for
    debugging runs.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from pygpr_tpu.config import DEFAULT, Config

Array = jax.Array


class StateHealth(NamedTuple):
    ok: Array              #: factorization success flag(s)
    jitter: Array          #: jitter used per (batched) factorization
    escalated: Array       #: jitter above the config base rung?
    finite_weights: Array  #: w = K⁻¹y finite?


def check_state(state, config: Config = DEFAULT) -> StateHealth:
    """Health report for a :class:`pygpr_tpu.models.exact_gp.GPState`."""
    base = jnp.asarray(config.jitter, state.jitter.dtype)
    finite = jnp.all(
        jnp.isfinite(state.weights), axis=tuple(range(1, state.weights.ndim))
    ) if state.weights.ndim > 1 else jnp.all(jnp.isfinite(state.weights))
    return StateHealth(
        ok=state.ok.astype(bool),
        jitter=state.jitter,
        escalated=state.jitter > base * 1.5,
        finite_weights=finite,
    )


def expert_mask(state) -> Array:
    """Boolean keep-mask over a batched expert state: an expert stays in
    the committee iff its factorization succeeded AND its weights are
    finite (the β=0 masking of SURVEY.md §5.3)."""
    h = check_state(state)
    return h.ok & h.finite_weights


def summarize(state, config: Config = DEFAULT) -> Dict:
    """Host-side dict summary for logs (host-0 logging, SURVEY.md §5.5)."""
    import numpy as np

    h = check_state(state, config)
    ok = np.atleast_1d(np.asarray(h.ok))
    esc = np.atleast_1d(np.asarray(h.escalated))
    return {
        "n_experts": int(ok.size),
        "n_failed": int((~ok).sum()),
        "n_jitter_escalated": int(esc.sum()),
        "max_jitter": float(np.max(np.asarray(h.jitter))),
    }


def checkify_nlml(kern, x, y, config: Config = DEFAULT):
    """Return a checkified ``nlml(params) -> (err, value)`` closure that
    raises structured errors on NaN/Inf instead of propagating them."""
    from pygpr_tpu.models.likelihood import nlml

    def f(params):
        val = nlml(kern, params, x, y, config)
        checkify.check(
            jnp.isfinite(val), "NLML is non-finite (failed factorization?)"
        )
        return val

    return checkify.checkify(f)
