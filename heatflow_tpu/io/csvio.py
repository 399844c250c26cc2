"""CSV output in the reference's exact formats.

Two conventions coexist in the reference and both are load-bearing for the
downstream pipeline (SURVEY.md §7 'Two CSV conventions'):

* ``watcher_points.csv`` — a ``time`` *column* plus one column per watcher
  (ref run_no_diamond.py:594-600);
* ``radial_gradient[_raw].csv`` — time as the *index*, ``index.name='time'``,
  columns are z positions (ref :602-617). The fitted-curve CSVs produced by
  the split-normal analysis reuse the gradient convention.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def write_watcher_csv(path: str, times: np.ndarray,
                      traces: dict[str, np.ndarray]) -> None:
    df = pd.DataFrame({"time": np.asarray(times)})
    for name, vals in traces.items():
        df[name] = np.asarray(vals)
    df.to_csv(path, index=False)


def read_watcher_csv(path: str) -> pd.DataFrame:
    return pd.read_csv(path)


def write_gradient_csv(path: str, times: np.ndarray, columns: np.ndarray,
                       rows: np.ndarray) -> None:
    """rows: (n_times, n_columns); columns are z positions (floats)."""
    df = pd.DataFrame(np.asarray(rows), columns=list(np.asarray(columns)))
    df.index = list(np.asarray(times))
    df.index.name = "time"
    df.to_csv(path)


def read_gradient_csv(path: str):
    """Return (times (T,), z_positions (Z,), values (T, Z)) — the parsing the
    1D driver and the plotting layer rely on (ref run_no_diamond_1d.py:348-351,
    plot_radial_gradient.py:43-63)."""
    df = pd.read_csv(path, index_col=0)
    times = df.index.to_numpy(dtype=float)
    z = df.columns.to_numpy(dtype=float)
    return times, z, df.to_numpy(dtype=float)
