from xitorch_tpu.interpolate.interp1 import Interp1D  # noqa: F401
