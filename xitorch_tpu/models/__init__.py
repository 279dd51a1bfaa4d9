from xitorch_tpu.models.deq import (  # noqa: F401
    DEQParams, init_deq, deq_forward, deq_loss, train_step,
)
from xitorch_tpu.models.node import NODEParams, init_node, node_forward, node_loss  # noqa: F401
from xitorch_tpu.models.scf import HamiltonianOp, scf_density, scf_energy  # noqa: F401
