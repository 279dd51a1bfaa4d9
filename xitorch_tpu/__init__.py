"""xitorch_tpu: TPU-native differentiable scientific computing.

A ground-up JAX/XLA/Pallas re-design with the capabilities of xitorch
(differentiable functionals whose 1st- and 2nd-order gradients flow through
solver *solutions* via implicit-function-theorem / adjoint rules):

* ``xitorch_tpu.LinearOperator`` — matrix-free batched operator (pytree)
* ``xitorch_tpu.linalg``   — solve, symeig/lsymeig/usymeig, svd
* ``xitorch_tpu.optimize`` — rootfinder, equilibrium, minimize
* ``xitorch_tpu.integrate``— quad, solve_ivp, mcquad, SQuad
* ``xitorch_tpu.interpolate`` — Interp1D
* ``xitorch_tpu.grad``     — jac, hess (matrix-free LinearOperators)

Everything jits, vmaps, and shards (pjit/shard_map over a device mesh).
"""
from xitorch_tpu._core.linop import LinearOperator, MatrixLinearOperator, checklinop  # noqa: F401
from xitorch_tpu._core.structured import BandedLowRankOperator, TridiagLowRankOperator  # noqa: F401
from xitorch_tpu._core.kron import KronOperator, KronSumOperator  # noqa: F401
from xitorch_tpu._core.editable_module import EditableModule  # noqa: F401
from xitorch_tpu._core.packer import Packer  # noqa: F401
from xitorch_tpu._core.pure import make_pure, make_sibling  # noqa: F401
# top-level debug + exception exports (parity: reference xitorch/__init__.py)
from xitorch_tpu.debug.modes import (  # noqa: F401
    set_debug_mode, is_debug_enabled, enable_debug, disable_debug,
)
from xitorch_tpu.utils.exceptions import (  # noqa: F401
    GetSetParamsError, ConvergenceWarning, MathWarning,
)
from xitorch_tpu.utils.convergence import assert_converged  # noqa: F401
from xitorch_tpu.version import __version__  # noqa: F401

# alias for reference-API familiarity (get_pure_function ~ make_pure)
get_pure_function = make_pure

# subpackages importable as attributes (import xitorch_tpu; xitorch_tpu.linalg.solve)
from xitorch_tpu import (  # noqa: F401,E402
    linalg, optimize, integrate, interpolate, grad, parallel, debug, utils,
)
