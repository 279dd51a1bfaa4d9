"""Attribute get/set by dotted / indexed path (parity with
/root/reference/xitorch/_utils/attr.py:1-62).  Used by the EditableModule
protocol shim; under pytrees this is rarely needed in user code."""
from __future__ import annotations

from xitorch_tpu._core.editable_module import _get_attr_path, _set_attr_path

__all__ = ["get_attr", "set_attr", "del_attr"]


def get_attr(obj, name: str):
    return _get_attr_path(obj, name)


def set_attr(obj, name: str, val):
    _set_attr_path(obj, name, val)


def del_attr(obj, name: str):
    if "." in name or "[" in name:
        parent_name, attr = name.rsplit(".", 1)
        parent = _get_attr_path(obj, parent_name)
        delattr(parent, attr)
    else:
        delattr(obj, name)
