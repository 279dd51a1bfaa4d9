from xitorch_tpu.utils.bcast import normalize_bcast_dims, get_bcasted_dims, match_dim  # noqa: F401
from xitorch_tpu.utils.exceptions import (  # noqa: F401
    GetSetParamsError, ConvergenceWarning, MathWarning,
)
from xitorch_tpu.utils.misc import (  # noqa: F401
    set_default_option, get_and_pop_keys, get_method,
)
from xitorch_tpu.utils.tensor import (  # noqa: F401
    tallqr, create_random_square_matrix, create_random_ortho_matrix,
)
from xitorch_tpu.utils.types import (  # noqa: F401
    get_np_dtype, get_jax_dtype, get_complex_dtype, get_real_dtype,
)
from xitorch_tpu.utils.decorators import deprecated  # noqa: F401
from xitorch_tpu.utils.attr import get_attr, set_attr, del_attr  # noqa: F401
