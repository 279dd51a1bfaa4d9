"""Debug-gated input validation helpers.

Analog of /root/reference/xitorch/_utils/assertfuncs.py:1-21.  The
reference's ``assert_fcn_params`` autograd-probes EditableModule state; in
JAX the analogous failure mode is a user callable whose signature or output
structure does not match what the functional expects — which, uncaught,
surfaces as a raw tracer error deep inside a solver loop.  Here the
callable is probed with ``jax.eval_shape`` (abstract evaluation: no FLOPs,
no compilation) and mismatches raise a framework ``RuntimeError`` naming
the callable and the expected/actual structures.
"""
from __future__ import annotations

from typing import Optional

import jax

__all__ = ["assert_runtime", "assert_type", "assert_broadcastable",
           "assert_fcn_params"]


def assert_runtime(cond, msg: str = "") -> None:
    if not cond:
        raise RuntimeError(msg)


def assert_type(cond, msg: str = "") -> None:
    if not cond:
        raise TypeError(msg)


def assert_broadcastable(shape1, shape2) -> None:
    """Raise if two batch shapes cannot broadcast (reference :4-9)."""
    if len(shape1) > len(shape2):
        assert_broadcastable(shape2, shape1)
        return
    for a, b in zip(shape1[::-1], shape2[::-1][:len(shape1)]):
        assert_runtime(a == 1 or b == 1 or a == b,
                       "The shape %s and %s are not broadcastable"
                       % (tuple(shape1), tuple(shape2)))


def _shapestr(tree) -> str:
    return str(jax.tree_util.tree_map(
        lambda a: tuple(getattr(a, "shape", ())), tree))


def assert_fcn_params(fcn, args, what: str = "fcn",
                      expect_like: Optional[object] = None) -> None:
    """Validate that ``fcn(*args)`` is abstractly evaluable (and, if
    ``expect_like`` is given, that its output matches that pytree's
    structure and leaf shapes).  Called from API entry points when debug
    mode is enabled (reference usage: rootfinder.py:96-97)."""
    try:
        out = jax.eval_shape(fcn, *args)
    except Exception as e:
        raise RuntimeError(
            "%s(%s) failed to evaluate with the given inputs (arg shapes: "
            "%s). Check the callable's signature and the params list.\n"
            "Underlying error: %s" % (what, getattr(fcn, "__name__", "fcn"),
                                      _shapestr(args), e)) from e
    if expect_like is not None:
        exp = jax.eval_shape(lambda t: t, expect_like)
        out_shapes = jax.tree_util.tree_map(lambda a: tuple(a.shape), out)
        exp_shapes = jax.tree_util.tree_map(lambda a: tuple(a.shape), exp)
        if (jax.tree_util.tree_structure(out) !=
                jax.tree_util.tree_structure(exp)) or \
                (out_shapes != exp_shapes):
            raise RuntimeError(
                "%s output does not match the expected structure: got %s, "
                "expected %s (shapes %s vs %s)"
                % (what, jax.tree_util.tree_structure(out),
                   jax.tree_util.tree_structure(exp), out_shapes, exp_shapes))
