"""Device-mesh construction and multi-host initialization.

The reference has **no** distributed layer of any kind (SURVEY.md
§2.10): its only parallel axis is batched BLAS over the leading expert
dimension.  On TPU that axis — plus MCMC chains — maps onto a
``jax.sharding.Mesh``, with XLA collectives over ICI/DCN doing the
aggregation.  The canonical mesh here is 2-D: ``("expert", "chain")``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


EXPERT_AXIS = "expert"
CHAIN_AXIS = "chain"


def make_mesh(
    n_expert: Optional[int] = None,
    n_chain: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build an ``(expert, chain)`` mesh over the available devices.

    ``n_expert`` defaults to ``len(devices) // n_chain``.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if n_expert is None:
        n_expert = len(devices) // n_chain
    n = n_expert * n_chain
    grid = np.asarray(devices[:n]).reshape(n_expert, n_chain)
    return Mesh(grid, (EXPERT_AXIS, CHAIN_AXIS))


def expert_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over experts (the reference's nc batch
    axis, ``gr_bcm.py:29``)."""
    return NamedSharding(mesh, P(EXPERT_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def multihost_init(**kwargs) -> None:
    """Initialize JAX's multi-host runtime (``jax.distributed``,
    SURVEY.md §5.8).

    Must be called BEFORE any JAX computation or device query — even
    ``jax.process_count()`` initializes the backend, after which
    ``jax.distributed.initialize`` is rejected.  Therefore this probes
    the *environment* (explicit kwargs, or the cluster-autodetect env
    vars JAX itself reads) and stays a true no-op single-process.

    Exercised for real by ``tests/test_multiprocess.py``, which spawns
    two coordinated processes with gloo CPU collectives.
    """
    import os

    auto = any(
        v in os.environ
        for v in (
            "JAX_COORDINATOR_ADDRESS",
            "COORDINATOR_ADDRESS",
            "TPU_WORKER_HOSTNAMES",
            "MEGASCALE_COORDINATOR_ADDRESS",
        )
    )
    if not kwargs and not auto:
        return
    jax.distributed.initialize(**kwargs)


def is_coordinator() -> bool:
    """Host-0 check for logging/checkpoint writes (SURVEY.md §5.5)."""
    return jax.process_index() == 0
