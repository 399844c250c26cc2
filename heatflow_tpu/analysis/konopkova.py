"""Konopkova-dataset support.

The reference ships two headerless two-column CSVs
(experimental_data/konopkova_{pside,oside}.csv: time, temperature) and a
truncated/malformed konopkova.yaml (SURVEY.md §2 'Dead/stale'). This module
converts the raw traces into the standard heating-CSV schema
(time, temp, oside) consumed by every driver, with an explicit time-unit
scale because the raw files are not in seconds.
"""

from __future__ import annotations

import argparse

import numpy as np
import pandas as pd


def load_xy_csv(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Read a headerless two-column (x, y) CSV."""
    df = pd.read_csv(path, header=None, names=["x", "y"])
    df = df.apply(pd.to_numeric, errors="coerce").dropna()
    df = df.sort_values("x").reset_index(drop=True)
    return df["x"].to_numpy(float), df["y"].to_numpy(float)


def convert_konopkova(pside_path: str, oside_path: str, out_path: str, *,
                      time_scale: float = 1e-6,
                      temp_scale: float = 1000.0) -> pd.DataFrame:
    """Merge p-side and o-side traces into the standard schema.

    time_scale: raw time unit in seconds (the raw data is O(1), consistent
    with microseconds for these experiments).
    temp_scale: raw temperature unit in kelvin (raw values are O(2),
    consistent with kK).

    The o-side trace is linearly interpolated onto the p-side time base.
    """
    tp, Tp = load_xy_csv(pside_path)
    to, To = load_xy_csv(oside_path)
    oside = np.interp(tp, to, To)
    df = pd.DataFrame({
        "time": tp * time_scale,
        "temp": Tp * temp_scale,
        "oside": oside * temp_scale,
    })
    if out_path:
        df.to_csv(out_path, index=False)
    return df


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Convert Konopkova raw traces to the heating-CSV schema")
    p.add_argument("--pside", default="experimental_data/konopkova_pside.csv")
    p.add_argument("--oside", default="experimental_data/konopkova_oside.csv")
    p.add_argument("--out", default="experimental_data/konopkova_heat_data.csv")
    p.add_argument("--time-scale", type=float, default=1e-6)
    p.add_argument("--temp-scale", type=float, default=1000.0)
    args = p.parse_args(argv)
    df = convert_konopkova(args.pside, args.oside, args.out,
                           time_scale=args.time_scale,
                           temp_scale=args.temp_scale)
    print(f"wrote {args.out}: {len(df)} rows, "
          f"t in [{df['time'].min():.3e}, {df['time'].max():.3e}] s, "
          f"T in [{df['temp'].min():.1f}, {df['temp'].max():.1f}] K")


if __name__ == "__main__":
    main()
