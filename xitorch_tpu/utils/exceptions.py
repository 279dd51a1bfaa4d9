"""Warning / error taxonomy (parity with /root/reference/xitorch/_utils/exceptions.py).

Because solver loops run inside ``jax.jit`` where Python-level warnings cannot
depend on traced values, solvers additionally return structured info pytrees
(see :mod:`xitorch_tpu.utils.info`); the warning classes here are raised from
eager wrappers and input validation.
"""

__all__ = ["GetSetParamsError", "ConvergenceWarning", "MathWarning"]


class GetSetParamsError(Exception):
    """Raised when parameter declaration/extraction on an operator is invalid."""


class ConvergenceWarning(Warning):
    """Warning issued when an iterative algorithm does not converge.

    Solvers never raise on non-convergence: they return the best iterate seen
    (matching reference behavior, e.g. rootsolver.py:144-148) and flag it in
    their info struct.
    """


class MathWarning(Warning):
    """Warning raised when mathematical conditions (e.g. degeneracy
    requirements in symeig derivatives) are not satisfied."""
