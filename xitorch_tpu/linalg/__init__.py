from xitorch_tpu.linalg.solve import solve  # noqa: F401
from xitorch_tpu.linalg.symeig import symeig, lsymeig, usymeig, svd  # noqa: F401
