from xitorch_tpu.ops.fused_cg import fused_cg_dense, fits_fused_cg  # noqa: F401
