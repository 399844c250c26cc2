"""Sweep scoring + RMSE surface over real sweep-driver outputs."""

import matplotlib

matplotlib.use("Agg")

import os

import numpy as np
import pandas as pd
import pytest
import yaml

from heatflow_tpu.analysis.sweep_surface import (plot_rmse_surface,
                                                 score_sweep_outputs)
from heatflow_tpu.drivers.sweep import run_parameter_sweep
from tests.fixtures import synthetic_heating, tiny_no_diamond_cfg


def test_score_and_surface(tmp_path):
    heat_csv = tmp_path / "heat.csv"
    synthetic_heating(heat_csv)
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    cfg["heating"]["file"] = str(heat_csv)
    cfg["timing"]["num_steps"] = 3
    cfg_path = tmp_path / "base.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    out = str(tmp_path / "sweep")
    run_parameter_sweep(str(cfg_path), out, (4e-6, 8e-6), (2.0, 6.0),
                        (1.8e-6, 1.8e-6), (2, 2, 1),
                        base_mesh_folder=str(tmp_path / "m"),
                        suppress_print=True)

    summary = score_sweep_outputs(out, str(heat_csv))
    assert os.path.isfile(os.path.join(out, "rmse_summary.csv"))
    assert len(summary) == 4
    assert np.isfinite(summary["rmse"]).all()

    fig, ax = plot_rmse_surface(summary, width=1.8e-6,
                                save_path=str(tmp_path / "surf.png"),
                                show_plot=False)
    assert (tmp_path / "surf.png").exists()
