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


@pytest.fixture(scope="module")
def pipeline_unstructured(tmp_path_factory):
    """The same pipeline on an *imported, genuinely non-grid* .msh — the
    reference's actual situation (gmsh mesh on disk, ref run_no_diamond_1d.py
    :203-238). Covers import → unstructured 2D run → split-normal fit →
    corrected 1D run."""
    import yaml
    from heatflow_tpu.geometry import build_layout
    from heatflow_tpu.mesh.msh_io import write_msh
    from heatflow_tpu.mesh.unstructured_gen import build_unstructured_mesh

    root = tmp_path_factory.mktemp("pipe_u")
    heat_csv = root / "heat.csv"
    synthetic_heating(heat_csv)
    cfg = tiny_no_diamond_cfg(coarse=2.0)
    cfg["heating"]["file"] = str(heat_csv)
    cfg["timing"]["num_steps"] = 6

    domain, mats = build_layout(cfg)
    umesh = build_unstructured_mesh(domain, mats, jitter=0.25, seed=3)
    mesh_folder = root / "meshes"
    mesh_folder.mkdir()
    write_msh(str(mesh_folder / "mesh.msh"), umesh.nodes, umesh.cells,
              umesh.cell_tags, umesh.material_tags)
    mesh_cfg = dict(cfg, material_tags=dict(umesh.material_tags))
    with open(mesh_folder / "mesh_cfg.yaml", "w") as f:
        yaml.safe_dump(mesh_cfg, f)

    out2d = str(root / "out2d")
    wp = coupler_watcher_points(cfg)
    run_simulation(cfg, str(mesh_folder), rebuild_mesh=False,
                   output_folder=out2d, watcher_points=wp, write_xdmf=False,
                   suppress_print=True)
    return cfg, str(mesh_folder), out2d, root


def test_pipeline_2d_to_1d_on_imported_nongrid_msh(pipeline_unstructured):
    """VERDICT r1 done-criterion: the full 2D→fit→1D pipeline passes on an
    imported non-grid triangulation."""
    from heatflow_tpu.analysis.radial import RadialGradientPlotter
    from heatflow_tpu.analysis.splitnormal import (analyze_split_normal_fits,
                                                   save_fitted_curves_csv)
    cfg, mesh_folder, out2d, root = pipeline_unstructured

    grad_csv = os.path.join(out2d, "radial_gradient.csv")
    assert os.path.isfile(grad_csv)
    plotter = RadialGradientPlotter(grad_csv)
    fits = analyze_split_normal_fits(plotter)
    assert np.isfinite(fits["amplitudes"]).all()
    fitted_csv = str(root / "gaussfit_full.csv")
    save_fitted_curves_csv(fits, plotter.radial_positions, fitted_csv)

    wp = coupler_watcher_points(cfg)
    out1d = str(root / "out1d")
    _problem, ys = run_1d(cfg, mesh_folder, output_folder=out1d,
                          watcher_points=wp, write_xdmf=True,
                          suppress_print=True, use_radial_correction=True,
                          radial_gradient_path=fitted_csv)
    assert os.path.isfile(os.path.join(out1d, "watcher_points.csv"))
    df = pd.read_csv(os.path.join(out1d, "watcher_points.csv"))
    assert np.all(np.isfinite(df.to_numpy()))

    # the correction must actually act (ref test_radial_correction.py)
    _, ys_off = run_1d(cfg, mesh_folder, watcher_points=wp,
                       write_xdmf=False, output_folder=str(root / "off"),
                       suppress_print=True, use_radial_correction=False)
    d = np.abs(np.asarray(ys["watch"]) - np.asarray(ys_off["watch"])).max()
    assert d > 1e-6


def test_unstructured_2d_watchers_close_to_structured(pipeline_unstructured,
                                                      pipeline):
    """Same geometry, perturbed vs tensor triangulation: watcher traces agree
    to discretization accuracy (sanity that the imported path solves the
    same physics)."""
    _cfg_u, _mf, out2d_u, _root = pipeline_unstructured
    *_, out2d_s, _roots = pipeline
    a = pd.read_csv(os.path.join(out2d_u, "watcher_points.csv"))
    b = pd.read_csv(os.path.join(out2d_s, "watcher_points.csv"))
    scale = np.abs(b[["pside", "oside"]].to_numpy()).max()
    d = np.abs(a[["pside", "oside"]].to_numpy()
               - b[["pside", "oside"]].to_numpy()).max() / scale
    assert d < 0.05, f"mesh-perturbation sensitivity too large: {d:.3f}"


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


def test_run1d_builds_unstructured_mesh(tmp_path):
    """run_1d(mesh_style='unstructured', rebuild_mesh=True) builds the
    non-grid mesh itself and extracts the axis from it."""
    heat_csv = tmp_path / "heat.csv"
    synthetic_heating(heat_csv)
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    cfg["heating"]["file"] = str(heat_csv)
    cfg["timing"]["num_steps"] = 3
    wp = coupler_watcher_points(cfg)
    _problem, ys = run_1d(cfg, str(tmp_path / "m"), rebuild_mesh=True,
                          mesh_style="unstructured",
                          output_folder=str(tmp_path / "o"),
                          watcher_points=wp, write_xdmf=False,
                          suppress_print=True, use_radial_correction=False)
    assert np.isfinite(np.asarray(ys["watch"])).all()
    assert os.path.isfile(tmp_path / "m" / "mesh_overlay.npz")
