"""Round-2 fixes: single-compile ragged-chunk sweeps, config-driven gradient
auto-search, and mesh visualization (VERDICT r1 items 8-10)."""

import os

import numpy as np
import pytest

from heatflow_tpu.geometry import build_layout
from heatflow_tpu.mesh.structured import build_structured_mesh
from heatflow_tpu.sim.bc import HeatingCurve
from heatflow_tpu.sim.problem import build_problem
from tests.fixtures import synthetic_heating, tiny_no_diamond_cfg


@pytest.fixture(scope="module")
def tiny_problem(tmp_path_factory):
    root = tmp_path_factory.mktemp("r2fix")
    heat_csv = root / "heat.csv"
    synthetic_heating(heat_csv)
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    cfg["heating"]["file"] = str(heat_csv)
    cfg["timing"]["num_steps"] = 7
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    heating = HeatingCurve.from_csv(str(heat_csv))
    problem = build_problem(mesh, heating, cfg,
                            watcher_points={"p": (0.0, 0.0)})
    return cfg, problem


def test_time_chunked_single_compile_with_ragged_tail(tiny_problem,
                                                      monkeypatch):
    """7 steps in chunks of 3 (ragged final 1): exactly one make_sweep_fn
    build, traces equal to the unchunked run."""
    import heatflow_tpu.sim.sweepkernel as sk
    _cfg, problem = tiny_problem
    ks = np.array([3.8, 5.0])
    fs = np.array([6e-6, 8e-6])

    calls = []
    orig = sk.make_sweep_fn

    def counting(*a, **kw):
        calls.append(kw.get("num_steps"))
        return orig(*a, **kw)

    monkeypatch.setattr(sk, "make_sweep_fn", counting)
    chunked = sk.run_sweep_time_chunked(problem, ks, fs, step_chunk=3,
                                        fixed_iters=40, dtype=np.float64)
    assert len(calls) == 1, f"expected one compile shape, got {calls}"
    assert chunked.shape[1] == problem.num_steps

    full = orig(problem, dtype=np.float64, fixed_iters=40)(ks, fs)
    np.testing.assert_allclose(chunked, np.asarray(full), rtol=1e-12,
                               atol=1e-9)


def test_gradient_autosearch_any_config_name(tmp_path):
    """_find_gradient_csv finds gradients for an arbitrary config name,
    preferring the config-derived dir over the legacy hardcoded one."""
    from heatflow_tpu.drivers.run1d import _find_gradient_csv
    mesh_folder = tmp_path / "meshes" / "my_exotic_cfg"
    mesh_folder.mkdir(parents=True)
    outdir = tmp_path / "outputs" / "my_exotic_cfg"
    outdir.mkdir(parents=True)
    legacy = tmp_path / "outputs" / "geballe_no_diamond_read_flux"
    legacy.mkdir(parents=True)
    (outdir / "radial_gradient.csv").write_text("time,0.0\n1.0,2.0\n")
    (legacy / "radial_gradient.csv").write_text("time,0.0\n1.0,9.9\n")

    got = _find_gradient_csv(str(mesh_folder), config_name="my_exotic_cfg")
    assert got is not None and os.path.samefile(
        got, outdir / "radial_gradient.csv")

    # without a config name the legacy dir still wins (reference behavior)
    got = _find_gradient_csv(str(mesh_folder))
    assert os.path.samefile(got, legacy / "radial_gradient.csv")

    # unknown names fall back to any run dir holding a gradient CSV
    got = _find_gradient_csv(str(mesh_folder), config_name="nope")
    assert got is not None


def test_gradient_autosearch_smoothed_preferred(tmp_path, monkeypatch):
    from heatflow_tpu.drivers.run1d import _find_gradient_csv
    monkeypatch.chdir(tmp_path)  # keep the repo's own outputs/ out of scope
    mesh_folder = tmp_path / "meshes" / "x"
    mesh_folder.mkdir(parents=True)
    d = tmp_path / "outputs" / "cfgA"
    d.mkdir(parents=True)
    (d / "radial_gradient_raw.csv").write_text("time,0.0\n1.0,2.0\n")
    got = _find_gradient_csv(str(mesh_folder), config_name="cfgA")
    assert got.endswith("radial_gradient_raw.csv")
    (d / "radial_gradient.csv").write_text("time,0.0\n1.0,2.0\n")
    got = _find_gradient_csv(str(mesh_folder), config_name="cfgA")
    assert got.endswith("radial_gradient.csv")


def test_mesh_visualization_png(tiny_problem, tmp_path):
    """plot_mesh writes a PNG for structured and unstructured meshes
    (ref run_no_diamond.py:183-187's gmsh GUI, headless)."""
    from heatflow_tpu.mesh.viz import plot_mesh
    _cfg, problem = tiny_problem
    png = tmp_path / "mesh_structured.png"
    plot_mesh(problem.mesh, str(png))
    assert png.stat().st_size > 1000

    from heatflow_tpu.mesh.msh_io import UnstructuredMesh
    tris, tags = problem.mesh.triangles()
    umesh = UnstructuredMesh(nodes=problem.mesh.node_coords(), cells=tris,
                             cell_tags=tags,
                             material_tags=dict(problem.mesh.material_tags))
    png_u = tmp_path / "mesh_unstructured.png"
    plot_mesh(umesh, str(png_u))
    assert png_u.stat().st_size > 1000


def test_run2d_visualize_mesh_artifact(tmp_path):
    """run_simulation --visualize-mesh drops mesh_visualization.png in the
    mesh folder."""
    from heatflow_tpu.drivers.run2d import run_simulation
    heat_csv = tmp_path / "heat.csv"
    synthetic_heating(heat_csv)
    cfg = tiny_no_diamond_cfg(coarse=4.0)
    cfg["heating"]["file"] = str(heat_csv)
    cfg["timing"]["num_steps"] = 2
    mesh_folder = str(tmp_path / "meshes")
    run_simulation(cfg, mesh_folder, rebuild_mesh=True, visualize_mesh=True,
                   output_folder=str(tmp_path / "out"), write_xdmf=False,
                   suppress_print=True, record_gradient=False)
    assert os.path.isfile(os.path.join(mesh_folder,
                                       "mesh_visualization.png"))
