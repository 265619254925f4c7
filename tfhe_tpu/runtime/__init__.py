from tfhe_tpu.runtime.scheduler import Circuit, evaluate  # noqa: F401
