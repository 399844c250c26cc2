from heatflow_tpu.analysis.compare import (calculate_rmse,
                                           normalized_traces,
                                           plot_temperature_curves)
from heatflow_tpu.analysis.radial import RadialGradientPlotter
from heatflow_tpu.analysis.splitnormal import (analyze_split_normal_fits,
                                               fit_split_normal_to_profile,
                                               split_normal_function)

__all__ = [
    "calculate_rmse",
    "normalized_traces",
    "plot_temperature_curves",
    "RadialGradientPlotter",
    "split_normal_function",
    "fit_split_normal_to_profile",
    "analyze_split_normal_fits",
]
