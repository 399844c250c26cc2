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
