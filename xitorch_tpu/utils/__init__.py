from xitorch_tpu.utils.bcast import normalize_bcast_dims, get_bcasted_dims, match_dim  # noqa: F401
from xitorch_tpu.utils.exceptions import GetSetParamsError, ConvergenceWarning, MathWarning  # noqa: F401
from xitorch_tpu.utils.misc import set_default_option, get_and_pop_keys, get_method  # noqa: F401
from xitorch_tpu.utils.tensor import tallqr, create_random_square_matrix, create_random_ortho_matrix  # noqa: F401
from xitorch_tpu.utils.types import get_np_dtype, get_jax_dtype, get_complex_dtype, get_real_dtype  # noqa: F401
from xitorch_tpu.utils.decorators import deprecated  # noqa: F401
from xitorch_tpu.utils.attr import get_attr, set_attr, del_attr  # noqa: F401
