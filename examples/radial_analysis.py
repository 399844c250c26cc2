"""Scripted radial-gradient analysis demo (ref example_radial_analysis.py and
interactive_radial_analysis.py): summaries, evolution plots, heatmap,
peak-gradient tracking, split-normal fits. Pass --interactive for the slider
viewer."""

import argparse
import os

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

try:
    import heatflow_tpu  # noqa: F401  (pip-installed)
except ImportError:      # source checkout without an install
    import sys
    sys.path.insert(0, ROOT)

from heatflow_tpu.analysis.radial import RadialGradientPlotter
from heatflow_tpu.analysis.splitnormal import (analyze_split_normal_fits,
                                               plot_split_normal_analysis)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("data_path", nargs="?", default=os.path.join(
        ROOT, "outputs", "geballe_no_diamond_read_flux",
        "radial_gradient.csv"))
    p.add_argument("--interactive", action="store_true")
    p.add_argument("--outdir", default=None)
    args = p.parse_args()

    if args.interactive:
        from heatflow_tpu.analysis.viewer import launch_viewer
        launch_viewer(args.data_path)
        return

    plotter = RadialGradientPlotter(args.data_path)
    print("\n--- Data summary ---")
    for k, v in plotter.get_data_summary().items():
        print(f"  {k}: {v}")

    # peak-gradient tracking over time (ref example_radial_analysis.py:48-76)
    grid = plotter.data.iloc[:, 1:].to_numpy(float)
    peak_idx = np.abs(grid).argmax(axis=1)
    peak_pos = np.asarray(plotter.radial_positions)[peak_idx]
    peak_val = grid[np.arange(len(grid)), peak_idx]
    print("\n--- Peak gradient tracking ---")
    for t, z, v in zip(plotter.time_values[:: max(1, len(grid) // 10)],
                       peak_pos[:: max(1, len(grid) // 10)],
                       peak_val[:: max(1, len(grid) // 10)]):
        print(f"  t={t:.2e}s  peak at z={z:.2e}m  |∂T/∂r|={abs(v):.3e} K/m")

    outdir = args.outdir or os.path.dirname(args.data_path)
    plotter.plot_gradient_evolution(
        time_indices=list(range(0, len(grid), max(1, len(grid) // 8))),
        save_path=os.path.join(outdir, "gradient_evolution.png"),
        show_plot=False)
    plotter.plot_heatmap(save_path=os.path.join(outdir,
                                                "gradient_heatmap.png"),
                         show_plot=False)

    results = analyze_split_normal_fits(plotter)
    print(f"\nSplit-normal fits: mean R² = "
          f"{results['r_squared_values'].mean():.4f}")
    plot_split_normal_analysis(
        results, save_path=os.path.join(outdir, "split_normal_analysis.png"),
        show_plot=False)
    print(f"Plots written to {outdir}")


if __name__ == "__main__":
    main()
