from xitorch_tpu.models.deq import (  # noqa: F401
    DEQParams, init_deq, deq_forward, deq_loss, train_step,
)
