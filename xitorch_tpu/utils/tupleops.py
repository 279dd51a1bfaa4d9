"""Tuple/pytree arithmetic helpers (parity with /root/reference/xitorch/
_utils/tupleops.py)."""
import jax

__all__ = ["tuple_axpy1"]


def tuple_axpy1(a, x, y):
    """a*x + y elementwise over matching pytrees (a scalar or pytree)."""
    if jax.tree_util.treedef_is_leaf(jax.tree_util.tree_structure(a)):
        return jax.tree_util.tree_map(lambda xx, yy: a * xx + yy, x, y)
    return jax.tree_util.tree_map(lambda aa, xx, yy: aa * xx + yy, a, x, y)
