"""Checkpointed / resumable hyperparameter fitting (SURVEY.md §5.4).

The reference has no checkpointing at all; model state is recomputable
from ``(x, y, params)``.  For long committee fits on preemptible TPU
capacity the thing worth persisting is the **optimizer trajectory**:
this driver runs the on-device L-BFGS in segments of ``segment_iters``
iterations, persisting ``(params, iteration count)`` after each segment
(atomic npz via ``utils.checkpoint``, host-0 only) and resuming from the
last checkpoint on restart.

L-BFGS curvature memory is intentionally NOT persisted: restarting the
history every few hundred iterations costs a handful of extra
iterations, while keeping the checkpoint payload a single parameter
vector that restores on any topology.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp

from pygpr_tpu.config import DEFAULT, Config
from pygpr_tpu.optimize.lbfgs import FitResult, fit_mle
from pygpr_tpu.ops.kernels import Kernel
from pygpr_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def fit_mle_resumable(
    kern: Kernel,
    params0,
    x,
    y,
    ckpt_path: str,
    *,
    config: Config = DEFAULT,
    max_iter: int = 1000,
    segment_iters: int = 100,
    tol: float = 1e-4,
    log_space: bool = True,
) -> FitResult:
    """:func:`pygpr_tpu.optimize.fit_mle` with segment checkpoints.

    Re-invoking with the same ``ckpt_path`` resumes from the last
    completed segment (works for batched/committee fits too — the whole
    ``[nc, nhp]`` parameter block is one checkpoint).
    """
    params = jnp.asarray(params0)
    done = 0
    if os.path.exists(ckpt_path):
        (params,), meta = load_checkpoint(ckpt_path, (params,))
        done = int(meta.get("iters", 0))
        params = jnp.asarray(params)

    res: Optional[FitResult] = None
    while done < max_iter:
        step = min(segment_iters, max_iter - done)
        res = fit_mle(
            kern, params, x, y,
            config=config, max_iter=step, tol=tol, log_space=log_space,
        )
        params = res.params
        done += int(
            jnp.max(jnp.atleast_1d(res.iters))
        )
        save_checkpoint(ckpt_path, (params,), meta={"iters": done})
        if bool(jnp.all(jnp.atleast_1d(res.converged))):
            break
        if int(jnp.max(jnp.atleast_1d(res.iters))) == 0:
            break  # optimizer made no progress; avoid spinning
    if res is None:  # already past max_iter at restore time
        res = fit_mle(
            kern, params, x, y,
            config=config, max_iter=1, tol=tol, log_space=log_space,
        )
    return res._replace(iters=jnp.asarray(done))
