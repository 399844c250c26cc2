"""Canonical corrected-1D workflow (ref no_diamond_1d.py): fit split-normal
curves to a 2D run's radial gradients, then drive the 1D reduced model with
the fitted curves as the correction source."""

import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

try:
    import heatflow_tpu  # noqa: F401  (pip-installed)
except ImportError:      # source checkout without an install
    import sys
    sys.path.insert(0, ROOT)

from heatflow_tpu.analysis.radial import RadialGradientPlotter
from heatflow_tpu.analysis.splitnormal import (analyze_split_normal_fits,
                                               save_fitted_curves_csv)
from heatflow_tpu.config import load_config
from heatflow_tpu.drivers.run1d import run_1d
from heatflow_tpu.geometry import coupler_watcher_points


def main(sim_name: str = "geballe_no_diamond_read_flux"):
    import pandas as pd

    out2d = os.path.join(ROOT, "outputs", sim_name)
    grad_csv = os.path.join(out2d, "radial_gradient.csv")
    if not os.path.exists(grad_csv):
        raise SystemExit(
            f"{grad_csv} not found — run examples/no_diamond.py first")

    # fit split-normal curves and export them in gradient-CSV format
    plotter = RadialGradientPlotter(grad_csv)
    results = analyze_split_normal_fits(plotter)
    fitted_csv = os.path.join(out2d, "gaussfit_full.csv")
    save_fitted_curves_csv(results, plotter.radial_positions, fitted_csv)
    print(f"Fitted curves written to {fitted_csv} "
          f"(mean R² = {results['r_squared_values'].mean():.4f})")

    cfg = load_config(os.path.join(ROOT, "cfgs", "geballe_1d.yaml"))
    cfg["heating"]["file"] = os.path.join(ROOT, cfg["heating"]["file"])
    run_1d(
        cfg=cfg,
        mesh_folder_2d=os.path.join(ROOT, "meshes", sim_name),
        output_folder=os.path.join(ROOT, "outputs", f"{sim_name}_1d"),
        watcher_points=coupler_watcher_points(cfg),
        write_xdmf=True,
        use_radial_correction=True,
        radial_gradient_path=fitted_csv,
    )
    df = pd.read_csv(os.path.join(ROOT, "outputs", f"{sim_name}_1d",
                                  "watcher_points.csv"))
    print(df.describe())
    return df


if __name__ == "__main__":
    main()
