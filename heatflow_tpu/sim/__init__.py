from heatflow_tpu.sim.problem import Problem2D, build_problem
from heatflow_tpu.sim.stepper import TransientResult, run_transient, make_simulate_fn

__all__ = [
    "Problem2D",
    "build_problem",
    "TransientResult",
    "run_transient",
    "make_simulate_fn",
]
