from heatflow_tpu.drivers.run2d import run_simulation

__all__ = ["run_simulation"]
