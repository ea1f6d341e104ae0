"""Tracing / profiling helpers (SURVEY.md §5.1 — absent in the
reference, whose only trace is the ``opt.dat`` file).

``annotate`` wraps the pipeline stages in ``jax.named_scope`` so
kernel-build / factorize / solve show up as labeled regions in XLA
profiles; :func:`trace` captures a TensorBoard/Perfetto trace directory
around any callable.
"""

from __future__ import annotations

import contextlib
from typing import Callable, Iterator

import jax


def annotate(name: str):
    """Decorator: run the function under a ``jax.named_scope``."""

    def deco(fn: Callable) -> Callable:
        def wrapped(*args, **kwargs):
            with jax.named_scope(name):
                return fn(*args, **kwargs)

        wrapped.__name__ = getattr(fn, "__name__", name)
        wrapped.__doc__ = fn.__doc__
        return wrapped

    return deco


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/pygpr_trace") -> Iterator[None]:
    """Capture a device profile around a block:

    >>> with trace("/tmp/t"):
    ...     fit_mle(...)  # then inspect with TensorBoard / Perfetto
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
