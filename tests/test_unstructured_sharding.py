"""Unstructured sweeps at structured-sweep execution parity (VERDICT r2
item 3): config-axis device sharding, the segment API, and time-chunked
resident execution for overlay meshes — the reference's sweep fan-out is
mesh-kind-agnostic (ref parameter_sweep.py:436-446), so ours must be too.
Runs on the 8-device virtual CPU mesh from conftest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heatflow_tpu.geometry import build_layout, coupler_watcher_points
from heatflow_tpu.mesh.unstructured_gen import build_unstructured_mesh
from heatflow_tpu.parallel.sharding import config_mesh
from heatflow_tpu.sim.bc import HeatingCurve
from heatflow_tpu.sim.unstructured import (build_problem_unstructured,
                                           make_sweep_fn_unstructured)
from tests.fixtures import synthetic_heating, tiny_no_diamond_cfg


@pytest.fixture(scope="module")
def overlay_problem():
    cfg = tiny_no_diamond_cfg(coarse=2.0)
    cfg["timing"]["num_steps"] = 5
    domain, mats = build_layout(cfg)
    umesh = build_unstructured_mesh(domain, mats, jitter=0.25, seed=7)
    df = synthetic_heating()
    heating = HeatingCurve(time=df["time"].to_numpy(),
                           temp=df["temp"].to_numpy())
    problem = build_problem_unstructured(
        umesh, heating, cfg, watcher_points=coupler_watcher_points(cfg))
    return cfg, problem


def test_unstructured_vmem_sweep_sharded_matches_unsharded(overlay_problem):
    _cfg, problem = overlay_problem
    B = 8
    ks = np.linspace(2.0, 8.0, B)
    fs = np.linspace(4e-6, 9e-6, B)
    ref = np.asarray(make_sweep_fn_unstructured(
        problem, dtype=jnp.float64, fixed_iters=12, solver="vmem")(ks, fs))
    dmesh = config_mesh(8, z_shards=1)
    sh = np.asarray(make_sweep_fn_unstructured(
        problem, dtype=jnp.float64, fixed_iters=12, solver="vmem",
        mesh=dmesh)(ks, fs))
    np.testing.assert_allclose(sh, ref, rtol=1e-11,
                               atol=1e-11 * np.abs(ref).max())


def test_unstructured_xla_sweep_sharded_matches_unsharded(overlay_problem):
    _cfg, problem = overlay_problem
    B = 8
    ks = np.linspace(2.0, 8.0, B)
    fs = np.linspace(4e-6, 9e-6, B)
    ref = np.asarray(make_sweep_fn_unstructured(
        problem, dtype=jnp.float64, fixed_iters=12)(ks, fs))
    dmesh = config_mesh(8, z_shards=1)
    sh = np.asarray(make_sweep_fn_unstructured(
        problem, dtype=jnp.float64, fixed_iters=12, mesh=dmesh)(ks, fs))
    np.testing.assert_allclose(sh, ref, rtol=1e-11,
                               atol=1e-11 * np.abs(ref).max())


def test_unstructured_time_chunked_matches_full(overlay_problem):
    """Chunked overlay sweeps through the generic run_sweep_time_chunked:
    equal to the single-call run, bitwise for warm_start='extrapolate'
    (the threaded u_pp history + single-rounding times)."""
    from heatflow_tpu.sim.sweepkernel import run_sweep_time_chunked
    _cfg, problem = overlay_problem
    ks = np.linspace(2.0, 8.0, 5)
    fs = np.linspace(4e-6, 9e-6, 5)
    for ws in ("previous", "extrapolate"):
        full = np.asarray(make_sweep_fn_unstructured(
            problem, dtype=jnp.float64, fixed_iters=8, solver="vmem",
            warm_start=ws)(ks, fs))
        ch = run_sweep_time_chunked(problem, ks, fs, step_chunk=2,
                                    dtype=jnp.float64, fixed_iters=8,
                                    solver="vmem", warm_start=ws)
        assert np.array_equal(full, ch), ws


def test_unstructured_time_chunked_sharded(overlay_problem):
    from heatflow_tpu.sim.sweepkernel import run_sweep_time_chunked
    _cfg, problem = overlay_problem
    ks = np.linspace(2.0, 8.0, 5)          # padded to 8 inside
    fs = np.linspace(4e-6, 9e-6, 5)
    ref = run_sweep_time_chunked(problem, ks, fs, step_chunk=2,
                                 dtype=jnp.float64, fixed_iters=8,
                                 solver="vmem")
    sh = run_sweep_time_chunked(problem, ks, fs, step_chunk=2,
                                dtype=jnp.float64, fixed_iters=8,
                                solver="vmem", mesh=config_mesh(8,
                                                                z_shards=1))
    assert sh.shape == ref.shape == (5, problem.num_steps, 2)
    np.testing.assert_allclose(sh, ref, rtol=1e-11,
                               atol=1e-11 * np.abs(ref).max())


def test_driver_unstructured_sharded_honest_metadata(overlay_problem,
                                                     tmp_path):
    """run_parameter_sweep with an unstructured mesh style over all 8
    virtual devices: results equal the single-device run, and the recorded
    metadata reflects the sharding that actually happened."""
    import json
    import pandas as pd
    from heatflow_tpu.config import with_parameters
    from heatflow_tpu.drivers.run2d import _prepare_mesh
    from heatflow_tpu.drivers.sweep import (mesh_folder_for_width,
                                            run_parameter_sweep)
    cfg, _problem = overlay_problem
    cfg = dict(cfg)

    heat_csv = tmp_path / "heat.csv"
    synthetic_heating(heat_csv)
    cfg["heating"]["file"] = str(heat_csv)
    width = 1.84e-6
    kwargs = dict(fwhm_range=(4e-6, 9e-6), k_range=(2.0, 8.0),
                  width_range=(width, width), num_points=(2, 3, 1),
                  suppress_print=True, dtype=jnp.float64,
                  save_run_dirs=True)
    # the driver consumes unstructured meshes from prepared width folders
    # (it generates structured ones by default) — pre-build the overlay
    # mesh the way an imported gmsh mesh would arrive
    for base in ("m1", "m8"):
        folder = mesh_folder_for_width(str(tmp_path / base), width)
        _prepare_mesh(with_parameters(cfg, sample_z=width), folder,
                      True, "auto", "unstructured")
    out1 = str(tmp_path / "single")
    r1, f1 = run_parameter_sweep(cfg, out1,
                                 base_mesh_folder=str(tmp_path / "m1"),
                                 devices=[jax.devices()[0]], **kwargs)
    out8 = str(tmp_path / "sharded")
    r8, f8 = run_parameter_sweep(cfg, out8,
                                 base_mesh_folder=str(tmp_path / "m8"),
                                 devices=jax.devices(), **kwargs)
    assert len(r1) == len(r8) == 6 and not f1 and not f8
    for rec1, rec8 in zip(r1, r8):
        assert rec1["run_name"] == rec8["run_name"]
        a = pd.read_csv(f"{out1}/{rec1['run_name']}/watcher_points.csv")
        b = pd.read_csv(f"{out8}/{rec8['run_name']}/watcher_points.csv")
        np.testing.assert_allclose(b.to_numpy(), a.to_numpy(), rtol=1e-9)
    meta = json.load(open(f"{out8}/sweep_metadata.json"))
    assert "sharded over 8 devices" in meta["engine"]


def test_unstructured_vmem_rline_matches_jacobi(overlay_problem):
    """Overlay stepper with in-kernel r-line PCR preconditioning: same
    converged traces as the jacobi VMEM path, fewer CG iterations."""
    from heatflow_tpu.sim.unstructured import make_simulate_fn_unstructured
    _cfg, problem = overlay_problem
    ys_j = make_simulate_fn_unstructured(
        problem, dtype=jnp.float64, rtol=1e-10, solver="vmem",
        record_gradient=False)()
    ys_r = make_simulate_fn_unstructured(
        problem, dtype=jnp.float64, rtol=1e-10, solver="vmem",
        record_gradient=False, precondition="rline")()
    a, b = np.asarray(ys_j["watch"]), np.asarray(ys_r["watch"])
    np.testing.assert_allclose(b, a, rtol=1e-8, atol=1e-8 * np.abs(a).max())
    assert (np.asarray(ys_r["cg_iters"]).sum()
            < np.asarray(ys_j["cg_iters"]).sum())
    import pytest as _pytest
    with _pytest.raises(ValueError, match="VMEM"):
        make_simulate_fn_unstructured(problem, solver="xla",
                                      precondition="rline")


def test_unstructured_vmem_adi_matches_jacobi(overlay_problem):
    """Overlay stepper AND overlay sweep with the split-additive ADI
    preconditioner (both PCR stacks on the lattice): same converged
    traces as the jacobi VMEM paths, fewer CG iterations than rline on
    the stepper."""
    from heatflow_tpu.sim.unstructured import (make_simulate_fn_unstructured,
                                               make_sweep_fn_unstructured)
    _cfg, problem = overlay_problem
    ys_j = make_simulate_fn_unstructured(
        problem, dtype=jnp.float64, rtol=1e-10, solver="vmem",
        record_gradient=False)()
    ys_r = make_simulate_fn_unstructured(
        problem, dtype=jnp.float64, rtol=1e-10, solver="vmem",
        record_gradient=False, precondition="rline")()
    ys_a = make_simulate_fn_unstructured(
        problem, dtype=jnp.float64, rtol=1e-10, solver="vmem",
        record_gradient=False, precondition="adi")()
    a, b = np.asarray(ys_j["watch"]), np.asarray(ys_a["watch"])
    np.testing.assert_allclose(b, a, rtol=1e-8, atol=1e-8 * np.abs(a).max())
    assert (np.asarray(ys_a["cg_iters"]).sum()
            < np.asarray(ys_r["cg_iters"]).sum())
    # overlay sweep twin through the shared batched kernel
    ks = np.linspace(2.0, 8.0, 3)
    fs = np.linspace(4e-6, 9e-6, 3)
    ref = np.asarray(make_sweep_fn_unstructured(
        problem, dtype=jnp.float64, rtol=1e-10, solver="vmem")(ks, fs))
    got = np.asarray(make_sweep_fn_unstructured(
        problem, dtype=jnp.float64, rtol=1e-10, solver="vmem",
        precondition="adi")(ks, fs))
    np.testing.assert_allclose(got, ref, rtol=1e-8,
                               atol=1e-8 * np.abs(ref).max())
    import pytest as _pytest
    with _pytest.raises(ValueError, match="VMEM"):
        make_simulate_fn_unstructured(problem, solver="xla",
                                      precondition="adi")
