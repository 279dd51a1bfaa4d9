from xitorch_tpu.linalg.solve import solve  # noqa: F401
