"""Canonical full-DAC workflow (ref with_diamond.py): 9-material geometry,
same comparison pipeline as the no-diamond script."""

import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

try:
    import heatflow_tpu  # noqa: F401  (pip-installed)
except ImportError:      # source checkout without an install
    import sys
    sys.path.insert(0, ROOT)

from heatflow_tpu.analysis.compare import (calculate_rmse, normalized_traces,
                                           plot_temperature_curves)
from heatflow_tpu.config import load_config
from heatflow_tpu.drivers.run2d import run_simulation
from heatflow_tpu.geometry import coupler_watcher_points


def main(sim_name: str = "geballe_with_diamond"):
    import pandas as pd

    cfg = load_config(os.path.join(ROOT, "cfgs", f"{sim_name}.yaml"))
    cfg["heating"]["file"] = os.path.join(ROOT, cfg["heating"]["file"])
    watcher_points = coupler_watcher_points(cfg)

    run_simulation(
        cfg=cfg,
        mesh_folder=os.path.join(ROOT, "meshes", sim_name),
        rebuild_mesh=True,
        output_folder=os.path.join(ROOT, "outputs", sim_name),
        watcher_points=watcher_points,
        write_xdmf=False,
    )

    df_sim = pd.read_csv(os.path.join(ROOT, "outputs", sim_name,
                                      "watcher_points.csv"))
    df_exp = pd.read_csv(cfg["heating"]["file"])
    traces = normalized_traces(df_sim, df_exp, cfg["heating"]["ic_temp"])

    plot_temperature_curves(
        sim_time=df_sim["time"], sim_pside=traces["sim_pside"],
        sim_oside=traces["sim_oside"], exp_pside=traces["exp_pside"],
        exp_oside=traces["exp_oside"], exp_time=df_exp["time"],
        save_path=os.path.join(ROOT, "outputs", sim_name,
                               "temperature_curves.png"),
        show_plot=False,
    )
    rmse = calculate_rmse(df_exp["time"], traces["exp_oside"],
                          df_sim["time"], traces["sim_oside"])
    print(f"O-side RMSE: {rmse:.4f}")
    return rmse


if __name__ == "__main__":
    main()
