"""Pure-function plumbing, the JAX-native way.

The reference needs ~1,000 LoC of EditableModule/PureFunction machinery
(/root/reference/xitorch/_core/pure_function.py:13-219) to expose the hidden
tensor state of stateful callables as explicit autograd inputs.  In JAX the
same job is done by ``jax.closure_convert``: any arrays a callable closes
over (e.g. flax/haiku module parameters captured by a bound method, or
tracers from an outer ``grad``) are hoisted into explicit arguments, so
implicit-function-theorem rules see *all* differentiable inputs.

``make_pure(fcn, *example_args)`` returns ``(pure_fcn, consts)`` such that
``pure_fcn(*args, *consts) == fcn(*args)`` and ``consts`` are the hoisted
closed-over arrays.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax

__all__ = ["make_pure", "make_sibling"]


def make_pure(fcn: Callable, *example_args) -> Tuple[Callable, Sequence[Any]]:
    """Hoist closed-over arrays of ``fcn`` into explicit trailing arguments.

    This is the functional replacement of the reference's
    ``get_pure_function`` (pure_function.py:161-203): the returned ``consts``
    play the role of ``objparams()``.
    """
    converted, consts = jax.closure_convert(fcn, *example_args)
    return converted, consts


def make_sibling(*pfcns):
    """Decorator marking a function as a sibling (same hidden state) of others.

    In JAX, siblings are ordinary closures over the same pytrees, so this is
    an identity decorator kept for API familiarity with the reference's
    ``make_sibling`` (pure_function.py:205-219).
    """
    def decorator(fcn):
        return fcn
    return decorator
