"""Shared test helpers: gradient checks (1st and 2nd order) via finite
differences — the oracle role of torch's gradcheck/gradgradcheck in the
reference test suite (xitorch/_tests/utils.py:9-42)."""
import numpy as np
from jax.test_util import check_grads

__all__ = ["assert_allclose", "gradcheck2", "device_dtype_float_test"]


def assert_allclose(a, b, rtol=1e-5, atol=1e-8, msg=""):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol,
                               err_msg=msg)


def gradcheck2(fcn, args, order=2, modes=("rev",), atol=1e-5, rtol=1e-3, eps=1e-4):
    """check_grads up to 2nd order (rev-over-rev included)."""
    check_grads(fcn, args, order=order, modes=modes, atol=atol, rtol=rtol, eps=eps)
