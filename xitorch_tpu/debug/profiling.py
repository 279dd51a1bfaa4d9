"""Profiling/tracing helpers (SURVEY §5 "Tracing / profiling").

The reference has only print-based verbose flags (e.g. reference
rootsolver.py:126-128, davidson symeig.py:192-194); here the structured
route is (a) jit-safe ``return_info=True`` structs on every functional
and (b) these thin wrappers over ``jax.profiler`` for timeline traces
viewable in TensorBoard/Perfetto.
"""
from __future__ import annotations

from contextlib import contextmanager

import jax

__all__ = ["profile", "annotate"]


@contextmanager
def profile(logdir: str, **kwargs):
    """Capture a device timeline trace of the enclosed block.

    >>> with xitorch_tpu.debug.profile("/tmp/xt-trace"):
    ...     x = solve(A, b).block_until_ready()

    View with TensorBoard's profile plugin or ui.perfetto.dev.  Works on
    any backend (CPU traces show host ops only).
    """
    jax.profiler.start_trace(logdir, **kwargs)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up inside profiler traces (and nests).

    >>> with xitorch_tpu.debug.annotate("outer-scf-iteration"):
    ...     y = step(y)
    """
    return jax.profiler.TraceAnnotation(name)
