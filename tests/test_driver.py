"""End-to-end driver test: CLI-shaped run_simulation produces every artifact
in the reference's on-disk format."""

import os

import numpy as np
import pandas as pd
import pytest
import yaml

from heatflow_tpu.drivers.run2d import main as run2d_main, run_simulation
from heatflow_tpu.geometry import coupler_watcher_points
from heatflow_tpu.io.csvio import read_gradient_csv
from tests.fixtures import synthetic_heating, tiny_no_diamond_cfg


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    root = tmp_path_factory.mktemp("run")
    heat_csv = root / "heat.csv"
    synthetic_heating(heat_csv)
    cfg = tiny_no_diamond_cfg(coarse=2.0)
    cfg["heating"]["file"] = str(heat_csv)
    cfg["timing"]["num_steps"] = 6
    mesh_folder = str(root / "meshes")
    out = str(root / "out")
    wp = coupler_watcher_points(cfg)
    result = run_simulation(cfg, mesh_folder, rebuild_mesh=True,
                            output_folder=out, watcher_points=wp,
                            write_xdmf=True, suppress_print=True)
    return cfg, mesh_folder, out, result


def test_all_artifacts_exist(artifacts):
    cfg, mesh_folder, out, _ = artifacts
    for f in ("mesh.msh", "mesh_cfg.yaml"):
        assert os.path.isfile(os.path.join(mesh_folder, f))
    for f in ("used_config.yaml", "watcher_points.csv",
              "radial_gradient.csv", "radial_gradient_raw.csv",
              "output.xdmf", "output.h5"):
        assert os.path.isfile(os.path.join(out, f)), f


def test_watcher_csv_schema(artifacts):
    *_, out, result = artifacts
    df = pd.read_csv(os.path.join(out, "watcher_points.csv"))
    assert list(df.columns) == ["time", "pside", "oside"]
    assert len(df) == 6
    np.testing.assert_allclose(df["pside"], result.watcher[:, 0])


def test_gradient_csvs_parse(artifacts):
    *_, out, result = artifacts
    t, z, v = read_gradient_csv(os.path.join(out, "radial_gradient.csv"))
    assert v.shape == (6, len(z))
    np.testing.assert_allclose(t, result.times)
    t, z, v = read_gradient_csv(os.path.join(out, "radial_gradient_raw.csv"))
    assert v.shape == (6, len(z))


def test_mesh_cfg_contains_tags(artifacts):
    cfg, mesh_folder, *_ = artifacts
    with open(os.path.join(mesh_folder, "mesh_cfg.yaml")) as f:
        mesh_cfg = yaml.safe_load(f)
    assert mesh_cfg["material_tags"] == {
        "p_ins": 1, "p_coupler": 2, "p_sample": 3, "o_coupler": 4, "o_ins": 5}
    assert "structured_grid" in mesh_cfg


def test_mesh_reuse_path(artifacts):
    """rebuild_mesh=False must reuse the persisted mesh and give identical
    results (the sweep engine depends on this, ref parameter_sweep.py:400-421)."""
    cfg, mesh_folder, out, result = artifacts
    wp = coupler_watcher_points(cfg)
    r2 = run_simulation(cfg, mesh_folder, rebuild_mesh=False,
                        output_folder=out + "_reuse", watcher_points=wp,
                        write_xdmf=False, suppress_print=True)
    np.testing.assert_allclose(r2.watcher, result.watcher, rtol=1e-12)


def test_missing_mesh_raises(tmp_path):
    cfg = tiny_no_diamond_cfg()
    cfg["heating"]["file"] = "nonexistent.csv"
    with pytest.raises(FileNotFoundError, match="mesh.msh"):
        run_simulation(cfg, str(tmp_path / "nomesh"), rebuild_mesh=False,
                       suppress_print=True)


def test_cli_main(tmp_path):
    heat_csv = tmp_path / "heat.csv"
    synthetic_heating(heat_csv)
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    cfg["heating"]["file"] = str(heat_csv)
    cfg["timing"]["num_steps"] = 3
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    run2d_main(["--config", str(cfg_path),
                "--mesh-folder", str(tmp_path / "m"),
                "--rebuild-mesh", "--suppress-print",
                "--output-folder", str(tmp_path / "o"),
                "--watcher-points", "auto"])
    assert os.path.isfile(tmp_path / "o" / "watcher_points.csv")


def test_cli_main_refine_rtol(tmp_path):
    """--f64-refine N --rtol R --warm-start extrapolate (the official
    recipe's CLI spelling) parses and produces finite artifacts."""
    heat_csv = tmp_path / "heat.csv"
    synthetic_heating(heat_csv)
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    cfg["heating"]["file"] = str(heat_csv)
    cfg["timing"]["num_steps"] = 3
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    run2d_main(["--config", str(cfg_path),
                "--mesh-folder", str(tmp_path / "m"),
                "--rebuild-mesh", "--suppress-print",
                "--output-folder", str(tmp_path / "o"),
                "--watcher-points", "auto",
                "--f64-refine", "1", "--rtol", "1e-5",
                "--warm-start", "extrapolate"])
    w = pd.read_csv(tmp_path / "o" / "watcher_points.csv")
    assert np.isfinite(w.to_numpy()).all()
