from xitorch_tpu.grad.jachess import jac, hess  # noqa: F401
