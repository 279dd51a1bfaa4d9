"""EditableModule: thin parity protocol for stateful objects.

In the reference, EditableModule (editable_module.py:14-466) is load-bearing:
it lets autograd see the hidden tensor state of methods.  In this framework
state is explicit (pytrees / closure_convert), so EditableModule survives
only as (1) an API-compatible protocol for porting reference code, and (2) a
debug checker (``assertparams``) that verifies declared parameter names
against the arrays actually used by a method (via tracing).
"""
from __future__ import annotations

from abc import abstractmethod
from typing import Callable, List

import jax
import jax.numpy as jnp

from xitorch_tpu.utils.exceptions import GetSetParamsError

__all__ = ["EditableModule"]


def _get_attr_path(obj, name: str):
    cur = obj
    for part in name.split("."):
        while "[" in part:
            base, rest = part.split("[", 1)
            idx, part2 = rest.split("]", 1)
            if base:
                cur = getattr(cur, base)
            try:
                key = int(idx)
            except ValueError:
                key = idx.strip("'\"")
            cur = cur[key]
            part = part2.lstrip(".")
            if not part:
                break
        if part:
            cur = getattr(cur, part)
    return cur


def _set_attr_path(obj, name: str, val):
    if "." in name or "[" in name:
        # navigate to the container of the final segment
        if "[" in name.rsplit(".", 1)[-1]:
            # e.g. "a.b[0]"
            container_name, idx = name.rsplit("[", 1)
            idx = idx.rstrip("]")
            container = _get_attr_path(obj, container_name)
            try:
                key = int(idx)
            except ValueError:
                key = idx.strip("'\"")
            container[key] = val
        else:
            parent_name, attr = name.rsplit(".", 1)
            parent = _get_attr_path(obj, parent_name)
            setattr(parent, attr, val)
    else:
        setattr(obj, name, val)


class EditableModule:
    """Protocol: declare, per method, which attribute paths hold float arrays
    that affect that method's output."""

    @abstractmethod
    def getparamnames(self, methodname: str, prefix: str = "") -> List[str]:
        """Return names (dotted paths) of arrays affecting ``methodname``."""
        raise NotImplementedError

    def getparams(self, methodname: str) -> List[jnp.ndarray]:
        return [_get_attr_path(self, n) for n in self.getparamnames(methodname)]

    def setparams(self, methodname: str, *params) -> int:
        names = self.getparamnames(methodname)
        if len(names) != len(params):
            raise GetSetParamsError(
                "setparams for %s expects %d params, got %d"
                % (methodname, len(names), len(params)))
        for n, p in zip(names, params):
            _set_attr_path(self, n, p)
        return len(params)

    def getuniqueparams(self, methodname: str) -> List[jnp.ndarray]:
        params = self.getparams(methodname)
        seen = {}
        for p in params:
            seen.setdefault(id(p), p)
        return list(seen.values())

    def assertparams(self, method: Callable, *args, **kwargs) -> None:
        """Verify getparamnames(method) by tracing: every array that
        influences the output must be declared.  (The reverse check — a
        declared array that does NOT influence the output — is not
        performed; JAX pytrees make over-declaration harmless.)

        JAX-native version of the reference's autograd probe
        (editable_module.py:177-241): we compare the declared leaves against
        the constants hoisted by ``jax.closure_convert``.
        """
        methodname = method.__name__
        declared = self.getparams(methodname)

        def _value_eq(c, d):
            # closure_convert may hand back value-equal copies (device
            # puts during tracing) — fall back to a value comparison
            return (hasattr(d, "shape") and getattr(d, "shape", None)
                    == getattr(c, "shape", None)
                    and getattr(d, "dtype", None) == getattr(c, "dtype", None)
                    and bool(jnp.all(jnp.asarray(c) == jnp.asarray(d))))

        _, consts = jax.closure_convert(lambda *a: method(*a), *args)
        # each const that is a float array should be declared.  Identity
        # matching is primary; value-equality only stands in for
        # closure_convert's device-put copies, and each declared array may
        # back at most ONE such copy — otherwise an undeclared parameter
        # that merely duplicates a declared one's values (common with
        # identically initialized weights) would silently pass the check
        # this method exists to perform.
        missing = []
        claimed: set = set()
        for c in consts:
            if not jnp.issubdtype(jnp.asarray(c).dtype, jnp.inexact):
                continue
            if any(c is d for d in declared):
                continue
            idx = next((i for i, d in enumerate(declared)
                        if i not in claimed and _value_eq(c, d)), None)
            if idx is None:
                missing.append(c)
            else:
                claimed.add(idx)
        if missing:
            raise GetSetParamsError(
                "getparamnames for method %r of %s is missing %d array(s) that "
                "affect the output (closure_convert found them as constants)"
                % (methodname, type(self).__name__, len(missing)))
