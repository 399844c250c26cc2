"""The 2D → radial-gradient CSV → corrected-1D pipeline through the drivers
(ref call stack §3.5: run_simulation → radial_gradient.csv → run_1d)."""

import os

import numpy as np
import pandas as pd
import pytest

from heatflow_tpu.drivers.run1d import run_1d
from heatflow_tpu.drivers.run2d import run_simulation
from heatflow_tpu.geometry import coupler_watcher_points
from tests.fixtures import synthetic_heating, tiny_no_diamond_cfg


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipe")
    heat_csv = root / "heat.csv"
    synthetic_heating(heat_csv)
    cfg = tiny_no_diamond_cfg(coarse=2.0)
    cfg["heating"]["file"] = str(heat_csv)
    cfg["timing"]["num_steps"] = 6
    mesh_folder = str(root / "meshes")
    out2d = str(root / "out2d")
    wp = coupler_watcher_points(cfg)
    run_simulation(cfg, mesh_folder, rebuild_mesh=True, output_folder=out2d,
                   watcher_points=wp, write_xdmf=False, suppress_print=True)
    return cfg, mesh_folder, out2d, root


def test_run1d_with_gradient_csv(pipeline):
    cfg, mesh_folder, out2d, root = pipeline
    wp = coupler_watcher_points(cfg)
    out1d = str(root / "out1d")
    problem, ys = run_1d(
        cfg, mesh_folder, output_folder=out1d, watcher_points=wp,
        write_xdmf=True, suppress_print=True, use_radial_correction=True,
        radial_gradient_path=os.path.join(out2d, "radial_gradient.csv"))
    assert os.path.isfile(os.path.join(out1d, "watcher_points.csv"))
    assert os.path.isfile(os.path.join(out1d, "output.xdmf"))
    df = pd.read_csv(os.path.join(out1d, "watcher_points.csv"))
    assert list(df.columns) == ["time", "pside", "oside"]
    assert np.all(np.isfinite(df.to_numpy()))


def test_run1d_correction_toggle(pipeline):
    """Correction on vs off must differ (ref test_radial_correction.py)."""
    cfg, mesh_folder, out2d, root = pipeline
    wp = coupler_watcher_points(cfg)
    grad = os.path.join(out2d, "radial_gradient.csv")
    _, ys_on = run_1d(cfg, mesh_folder, watcher_points=wp, write_xdmf=False,
                      output_folder=str(root / "on"), suppress_print=True,
                      use_radial_correction=True, radial_gradient_path=grad)
    _, ys_off = run_1d(cfg, mesh_folder, watcher_points=wp, write_xdmf=False,
                       output_folder=str(root / "off"), suppress_print=True,
                       use_radial_correction=False)
    d = np.abs(np.asarray(ys_on["watch"]) - np.asarray(ys_off["watch"])).max()
    assert d > 1e-6


def test_run1d_missing_gradient_falls_back(pipeline, tmp_path):
    """No gradient file anywhere → correction auto-disabled, run succeeds
    (ref run_no_diamond_1d.py:343-345)."""
    cfg, mesh_folder, *_ = pipeline
    wp = coupler_watcher_points(cfg)
    _, ys = run_1d(cfg, mesh_folder, watcher_points=wp, write_xdmf=False,
                   output_folder=str(tmp_path / "fb"), suppress_print=True,
                   use_radial_correction=True,
                   radial_gradient_path=None)
    assert np.all(np.isfinite(np.asarray(ys["watch"])))
