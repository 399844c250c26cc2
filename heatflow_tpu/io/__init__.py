from heatflow_tpu.io.csvio import (write_watcher_csv, write_gradient_csv,
                                   read_gradient_csv)
from heatflow_tpu.io.xdmfio import XDMFTimeSeriesWriter, read_xdmf_timeseries

__all__ = [
    "write_watcher_csv",
    "write_gradient_csv",
    "read_gradient_csv",
    "XDMFTimeSeriesWriter",
    "read_xdmf_timeseries",
]
