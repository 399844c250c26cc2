"""Driver fallback: a mesh folder containing an externally produced .msh
(no structured_grid metadata) runs through the ELL path with the same
artifacts — the reference-mesh-import workflow."""

import os

import numpy as np
import pandas as pd
import pytest
import yaml

from heatflow_tpu.drivers.run2d import run_simulation
from heatflow_tpu.geometry import build_layout, coupler_watcher_points
from heatflow_tpu.mesh.msh_io import write_msh
from heatflow_tpu.mesh.structured import build_structured_mesh
from tests.fixtures import synthetic_heating, tiny_no_diamond_cfg


def test_external_msh_runs_through_driver(tmp_path):
    heat_csv = tmp_path / "heat.csv"
    synthetic_heating(heat_csv)
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    cfg["heating"]["file"] = str(heat_csv)
    cfg["timing"]["num_steps"] = 4

    # fabricate an "external" mesh folder: mesh.msh + mesh_cfg.yaml WITHOUT
    # structured_grid metadata (as the reference toolchain would leave it)
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    tris, tags = mesh.triangles()
    mesh_folder = tmp_path / "external_mesh"
    os.makedirs(mesh_folder)
    write_msh(str(mesh_folder / "mesh.msh"), mesh.node_coords(), tris, tags,
              mesh.material_tags)
    with open(mesh_folder / "mesh_cfg.yaml", "w") as f:
        yaml.safe_dump({**cfg, "material_tags": dict(mesh.material_tags)}, f)

    out = tmp_path / "out"
    wp = coupler_watcher_points(cfg)
    ys = run_simulation(cfg, str(mesh_folder), rebuild_mesh=False,
                        output_folder=str(out), watcher_points=wp,
                        write_xdmf=True, suppress_print=True)
    for f in ("watcher_points.csv", "radial_gradient.csv",
              "radial_gradient_raw.csv", "output.xdmf", "used_config.yaml"):
        assert os.path.isfile(out / f), f
    df = pd.read_csv(out / "watcher_points.csv")
    assert list(df.columns) == ["time", "pside", "oside"]
    assert np.isfinite(df.to_numpy()).all()


def test_mesh_style_unstructured_generation(tmp_path):
    """--mesh-style unstructured: the driver builds a graded non-grid
    triangulation natively (the gmsh-default analogue), persists it, and
    reloads it through the import path."""
    heat_csv = tmp_path / "heat.csv"
    synthetic_heating(heat_csv)
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    cfg["heating"]["file"] = str(heat_csv)
    cfg["timing"]["num_steps"] = 4
    mesh_folder = str(tmp_path / "m")
    out = tmp_path / "out"
    wp = coupler_watcher_points(cfg)
    ys = run_simulation(cfg, mesh_folder, rebuild_mesh=True,
                        output_folder=str(out), watcher_points=wp,
                        write_xdmf=False, suppress_print=True,
                        mesh_style="unstructured")
    assert np.isfinite(np.asarray(ys["watch"])).all()
    with open(os.path.join(mesh_folder, "mesh_cfg.yaml")) as f:
        mesh_cfg = yaml.safe_load(f)
    assert "structured_grid" not in mesh_cfg   # reloads via the import path
    # the persisted mesh is genuinely non-grid
    from heatflow_tpu.mesh.msh_io import read_msh
    back = read_msh(os.path.join(mesh_folder, "mesh.msh"))
    z = back.nodes[:, 0]
    assert len(np.unique(np.round(z, 12))) > 0.5 * len(z)

    # reload path gives identical results (mesh reuse, as sweeps need)
    ys2 = run_simulation(cfg, mesh_folder, rebuild_mesh=False,
                         output_folder=str(tmp_path / "out2"),
                         watcher_points=wp, write_xdmf=False,
                         suppress_print=True)
    np.testing.assert_allclose(np.asarray(ys2["watch"]),
                               np.asarray(ys["watch"]), rtol=1e-12)


def test_sweep_driver_on_unstructured_mesh(tmp_path):
    """run_parameter_sweep auto-detects an imported/non-grid mesh folder and
    sweeps through the ELL kernel, matching per-config unstructured runs."""
    import jax.numpy as jnp
    from heatflow_tpu.drivers.sweep import run_parameter_sweep
    from heatflow_tpu.mesh.unstructured_gen import build_unstructured_mesh
    from heatflow_tpu.sim.bc import HeatingCurve
    from heatflow_tpu.sim.unstructured import (build_problem_unstructured,
                                               make_simulate_fn_unstructured)

    heat_csv = tmp_path / "heat.csv"
    synthetic_heating(heat_csv)
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    cfg["heating"]["file"] = str(heat_csv)
    cfg["timing"]["num_steps"] = 4
    width = float(cfg["mats"]["p_sample"]["z"])

    # pre-build the width-group mesh folder with a non-grid triangulation
    from heatflow_tpu.drivers.sweep import mesh_folder_for_width
    mf = mesh_folder_for_width(str(tmp_path / "meshes"), width)
    os.makedirs(mf)
    domain, mats = build_layout(cfg)
    umesh = build_unstructured_mesh(domain, mats, seed=5)
    write_msh(os.path.join(mf, "mesh.msh"), umesh.nodes, umesh.cells,
              umesh.cell_tags, umesh.material_tags)
    with open(os.path.join(mf, "mesh_cfg.yaml"), "w") as f:
        yaml.safe_dump({**cfg, "material_tags": dict(umesh.material_tags)},
                       f)

    out = str(tmp_path / "sweep")
    res, failed = run_parameter_sweep(
        cfg, out, fwhm_range=(5e-6, 8e-6), k_range=(2.0, 7.0),
        width_range=(width, width), num_points=(2, 2, 1),
        base_mesh_folder=str(tmp_path / "meshes"), suppress_print=True,
        dtype=jnp.float64, devices=[__import__("jax").devices()[0]])
    assert len(res) == 4 and not failed

    # cross-check one run against a direct unstructured simulate
    heating = HeatingCurve.from_csv(str(heat_csv))
    rec = res[0]
    problem = build_problem_unstructured(
        umesh, heating, cfg, watcher_points=coupler_watcher_points(cfg))
    fn = make_simulate_fn_unstructured(problem, dtype=np.float64,
                                       rtol=1e-11, record_gradient=False)
    kp = np.asarray(problem.kappas).copy()
    kp[2] = rec["k"]
    direct = np.asarray(fn(kappas=kp, fwhm=rec["fwhm"])["watch"])
    got = pd.read_csv(os.path.join(rec["output_dir"],
                                   "watcher_points.csv"))
    # the sweep kernel solves at rtol 1e-6, the direct run at 1e-11
    np.testing.assert_allclose(got[["pside", "oside"]].to_numpy(), direct,
                               rtol=2e-4, atol=0.05)
