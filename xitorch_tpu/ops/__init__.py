from xitorch_tpu.ops.fused_cg import fused_cg_dense, fits_fused_cg  # noqa: F401
from xitorch_tpu.ops.jacobi_eigh import jacobi_eigh  # noqa: F401
from xitorch_tpu.ops.tridiag import (  # noqa: F401
    tridiag_matvec, tridiag_solve, tridiag_solve_pallas,
)
