"""Method registries, option plumbing, and small helpers.

TPU-native analog of /root/reference/xitorch/_utils/misc.py: the method
registry (``get_method``) is kept as the extension point — each functional
accepts a method *string* or a user-supplied *callable* as a custom method.
The torch-specific Tensor/NonTensor separators are replaced by JAX pytrees.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Sequence, Union

__all__ = ["set_default_option", "get_and_pop_keys", "get_method", "MethodType"]

MethodType = Union[str, Callable, None]


def set_default_option(defopt: Mapping[str, Any], opt: Mapping[str, Any]) -> Dict[str, Any]:
    """Return a dict with ``defopt`` keys overridden by ``opt``."""
    res = dict(defopt)
    res.update(opt)
    return res


def get_and_pop_keys(dct: Dict[str, Any], keys: Sequence[str]) -> Dict[str, Any]:
    """Remove ``keys`` from ``dct`` in place and return them as a new dict."""
    return {k: dct.pop(k) for k in keys}


def get_method(algname: str, methods: Mapping[str, Callable], method: MethodType) -> Callable:
    """Resolve a method string (registry lookup) or pass a callable through.

    Mirrors the extension-point semantics of the reference
    (xitorch/_utils/misc.py:21-39): users may register custom algorithms by
    passing a callable with the same signature as the built-in methods.
    """
    if isinstance(method, str):
        methodl = method.lower()
        if methodl in methods:
            return methods[methodl]
        raise RuntimeError(
            "Unknown %s method: %s. Available methods: %s"
            % (algname, method, ", ".join(sorted(methods.keys())))
        )
    elif callable(method):
        return method
    raise TypeError(
        "Invalid method type: %s for %s. Only str and callable are accepted."
        % (type(method), algname)
    )


class dummy_context_manager:
    def __enter__(self):
        return None

    def __exit__(self, *args):
        return None
