"""Test harness configuration.

Runs the suite on CPU with 8 virtual devices (for mesh/sharding tests,
SURVEY.md §4) and x64 enabled so the parity oracles can use the
reference's f64 tolerances (the reference is f64-everywhere,
``PyGPR/gpr.py:10``).  TPU-specific tests opt in separately.
"""

import os

# Force CPU. The session env pins JAX_PLATFORMS to the TPU tunnel and a
# sitecustomize imports jax before any user code runs, so mutating
# os.environ here is too late for platform selection — go through
# jax.config instead (works as long as no backend is initialized yet).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables between test modules.

    The full suite accumulates ~10³ distinct XLA CPU compilations; at
    around the 90% mark the compiler reproducibly dies inside
    ``backend_compile_and_load`` (SIGSEGV/SIGABRT — resource
    exhaustion in the in-process code cache), even though every module
    passes in isolation.  Dropping the caches per module keeps the
    peak bounded at the cost of a few cross-module recompiles.
    """
    yield
    jax.clear_caches()
