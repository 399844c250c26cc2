"""Sweep post-processing: per-run RMSE vs experiment and RMSE surfaces.

Covers the reference's sweep_test.py rmse_summary.csv output (:109-113) and
the plotting.ipynb workflow of mapping the o-side RMSE over the (FWHM, κ)
grid from a sweep output directory.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

from heatflow_tpu.analysis.compare import calculate_rmse, normalized_traces


def score_sweep_outputs(output_dir: str, exp_csv: str, ic_temp: float = 300.0
                        ) -> pd.DataFrame:
    """Compute the normalized o-side RMSE for every successful run in a
    sweep output directory; writes rmse_summary.csv next to the runs."""
    runs_csv = os.path.join(output_dir, "successful_runs.csv")
    runs = pd.read_csv(runs_csv)
    df_exp = pd.read_csv(exp_csv)
    rows = []
    for _, rec in runs.iterrows():
        watcher = os.path.join(rec["output_dir"], "watcher_points.csv")
        if not os.path.isfile(watcher):
            rows.append({**rec, "rmse": np.nan})
            continue
        df_sim = pd.read_csv(watcher)
        tr = normalized_traces(df_sim, df_exp, ic_temp)
        rmse = calculate_rmse(df_exp["time"], tr["exp_oside"],
                              df_sim["time"], tr["sim_oside"])
        rows.append({**rec, "rmse": rmse})
    out = pd.DataFrame(rows)
    out.to_csv(os.path.join(output_dir, "rmse_summary.csv"), index=False)
    return out


def plot_rmse_surface(summary: pd.DataFrame, *, width: float | None = None,
                      save_path: str | None = None, show_plot: bool = True):
    """Heatmap of RMSE over the (FWHM, κ) plane for one width group."""
    import matplotlib.pyplot as plt
    df = summary
    if width is not None:
        df = df[np.isclose(df["width"], width)]
    piv = df.pivot_table(index="k", columns="fwhm", values="rmse")
    fig, ax = plt.subplots(figsize=(9, 6))
    im = ax.pcolormesh(piv.columns.to_numpy(float), piv.index.to_numpy(float),
                       piv.to_numpy(), shading="nearest", cmap="viridis")
    fig.colorbar(im, ax=ax, label="normalized o-side RMSE")
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("Laser FWHM (m)")
    ax.set_ylabel("Sample conductivity κ (W/m/K)")
    best = df.loc[df["rmse"].idxmin()]
    ax.plot(best["fwhm"], best["k"], "r*", ms=16,
            label=f"best: k={best['k']:.2f}, rmse={best['rmse']:.4f}")
    ax.legend()
    ax.set_title("Sweep RMSE surface"
                 + (f" (width {width:.2e} m)" if width is not None else ""))
    if save_path:
        fig.savefig(save_path, dpi=300, bbox_inches="tight")
    if show_plot:
        plt.show()
    else:
        plt.close(fig)
    return fig, ax


def main(argv=None):
    p = argparse.ArgumentParser(description="Score + plot sweep results")
    p.add_argument("output_dir")
    p.add_argument("--exp-csv", required=True)
    p.add_argument("--ic-temp", type=float, default=300.0)
    p.add_argument("--save", default=None)
    p.add_argument("--no-show", action="store_true")
    args = p.parse_args(argv)
    summary = score_sweep_outputs(args.output_dir, args.exp_csv,
                                  args.ic_temp)
    ok = summary.dropna(subset=["rmse"])
    best = ok.loc[ok["rmse"].idxmin()]
    print(f"Lowest RMSE: {best['rmse']:.6f} at k = {best['k']:.2f}, "
          f"fwhm = {best['fwhm']:.3e}, width = {best['width']:.3e}")
    for w in sorted(ok["width"].unique()):
        sp = None
        if args.save:
            root, ext = os.path.splitext(args.save)
            sp = f"{root}_w{w:.2e}{ext}"
        plot_rmse_surface(ok, width=w, save_path=sp,
                          show_plot=not args.no_show)


if __name__ == "__main__":
    main()
