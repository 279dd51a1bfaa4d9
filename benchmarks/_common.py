"""Shared benchmark helpers."""
import os
import sys


def maybe_force_cpu():
    """--cpu / XT_CPU=1: force the CPU backend.  The default backend in
    this image is a TPU tunnel that hangs when down (CLAUDE.md gotcha) —
    must run before any JAX array op."""
    import jax

    if "--cpu" in sys.argv or os.environ.get("XT_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
