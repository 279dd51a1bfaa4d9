"""Ahead-of-time export for production serving.

Solvers in this framework compile to single XLA programs, which makes them
directly exportable with ``jax.export``: compile once (optionally for a
device mesh), serialize the StableHLO artifact, and serve it from a runtime
without Python tracing (or from a different process/host).

Example
-------
>>> import xitorch_tpu.serving as serving
>>> fn = lambda mat, b: xitorch_tpu.linalg.solve(
...     xitorch_tpu.LinearOperator.m(mat, is_hermitian=True), b, method="cg")
>>> blob = serving.export_bytes(fn, (mat, b))      # bytes, persist anywhere
>>> served = serving.import_bytes(blob)            # in the serving process
>>> x = served(mat, b)
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax

__all__ = ["export_bytes", "import_bytes", "aot_compile"]


def _register_namedtuples(obj, seen):
    """Auto-register namedtuple pytree types in ``obj`` for serialization."""
    if isinstance(obj, tuple) and hasattr(obj, "_fields"):
        cls = type(obj)
        if cls not in seen:
            seen.add(cls)
            try:
                jax.export.register_namedtuple_serialization(
                    cls, serialized_name="%s.%s" % (cls.__module__, cls.__qualname__))
            except ValueError:
                pass  # already registered
        for v in obj:
            _register_namedtuples(v, seen)
    elif isinstance(obj, (list, tuple)):
        for v in obj:
            _register_namedtuples(v, seen)
    elif isinstance(obj, dict):
        for v in obj.values():
            _register_namedtuples(v, seen)


def export_bytes(fn: Callable, example_args: Sequence) -> bytes:
    """Trace + lower ``fn`` on ``example_args`` and serialize the StableHLO
    module (shape-specialized) for serving.

    NamedTuple argument containers are registered for serialization
    automatically; other custom pytree types (e.g. LinearOperator
    subclasses) must either be registered with
    ``jax.export.register_pytree_node_serialization`` or constructed inside
    ``fn`` from plain-array arguments.
    """
    _register_namedtuples(tuple(example_args), set())
    exported = jax.export.export(jax.jit(fn))(*example_args)
    return exported.serialize()


def import_bytes(blob: bytes) -> Callable:
    """Deserialize an exported artifact into a callable."""
    exported = jax.export.deserialize(blob)
    return lambda *args: exported.call(*args)


def aot_compile(fn: Callable, example_args: Sequence):
    """Ahead-of-time compile ``fn`` for the current backend; returns the
    compiled executable (``.cost_analysis()`` etc. available)."""
    return jax.jit(fn).lower(*example_args).compile()
