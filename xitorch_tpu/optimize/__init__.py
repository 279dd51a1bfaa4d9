from xitorch_tpu.optimize.rootfinder import rootfinder, equilibrium, minimize  # noqa: F401
