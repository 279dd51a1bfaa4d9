from xitorch_tpu.integrate.quad import quad  # noqa: F401
from xitorch_tpu.integrate.solve_ivp import solve_ivp  # noqa: F401
from xitorch_tpu.integrate.mcquad import mcquad  # noqa: F401
from xitorch_tpu.integrate.squad import SQuad  # noqa: F401
