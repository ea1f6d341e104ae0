"""Checkpoint / resume (SURVEY.md §5.4 — absent in the reference).

GP model state is small — hyperparameters, optimizer/MCMC state, RNG
keys (``(x, y, params)`` plus recomputable factors, reference
``gpr.py:56-62``) — so checkpoints are plain ``.npz`` archives of a
flat pytree, written atomically by host 0 only.  ``orbax`` is available
in the image for larger states; for this state size npz keeps zero
moving parts and restores on any topology.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict

import jax
import numpy as np


def save_checkpoint(path: str, tree: Any, meta: Dict | None = None) -> None:
    """Atomically write a pytree of arrays (+ JSON-able metadata)."""
    if jax.process_index() != 0:
        return
    leaves, treedef = jax.tree.flatten(tree)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    payload["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str, like: Any):
    """Restore a pytree saved by :func:`save_checkpoint` into the
    structure of ``like``.  Returns ``(tree, meta)``."""
    with np.load(path) as z:
        leaves_like, treedef = jax.tree.flatten(like)
        n = len(leaves_like)
        leaves = [z[f"leaf_{i}"] for i in range(n)]
        meta = json.loads(bytes(z["__meta__"]).decode())
    return jax.tree.unflatten(treedef, leaves), meta
