"""Coverage for remaining paths: with-diamond geometry, time-chunked sweeps,
stopping-criterion modes, config mutation, profiling hook."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from heatflow_tpu.config import with_parameters
from heatflow_tpu.geometry import build_layout, coupler_watcher_points
from heatflow_tpu.mesh.structured import build_structured_mesh
from heatflow_tpu.ops.cg import pcg
from heatflow_tpu.sim.bc import HeatingCurve
from heatflow_tpu.sim.problem import build_problem, radial_band_analysis
from heatflow_tpu.sim.sweepkernel import (make_sweep_fn,
                                          run_sweep_time_chunked)
from heatflow_tpu.utils import profile_trace
from tests.fixtures import synthetic_heating, tiny_no_diamond_cfg


def _with_diamond_cfg():
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    for name, r in (("p_diam", 12e-6), ("o_diam", 12e-6)):
        cfg["mats"][name] = {"rho": 3500, "cv": 510, "k": 2000, "z": 8e-6,
                             "r": r, "mesh": 4e-6}
    cfg["mats"]["gasket"] = {"rho": 21000, "cv": 140, "k": 100, "z": 1.0,
                             "r": 4e-6, "mesh": 4e-6}
    cfg["mats"]["g_ins"] = {"rho": 4131, "cv": 668, "k": 10, "z": 1.0,
                            "r": 2e-6, "mesh": 1e-6}
    return cfg


def test_with_diamond_layout_geometry():
    """Hand-derived bounds of the 9-material stack (ref run_with_diamond.py
    :58-97): culets span full r; gasket z-span between the culets; the ring
    structure g_ins/gasket sits radially outside the sample."""
    cfg = _with_diamond_cfg()
    domain, mats = build_layout(cfg)
    by = {m.name: m for m in mats}
    r_sample = 6e-6
    r_diamond = r_sample + 4e-6 + 2e-6
    assert by["p_diam"].bounds[3] == pytest.approx(r_diamond)
    assert by["o_diam"].bounds[3] == pytest.approx(r_diamond)
    assert domain[3] == pytest.approx(r_diamond)
    # gasket spans between the culets in z
    assert by["gasket"].bounds[0] == pytest.approx(by["p_diam"].bounds[1])
    assert by["gasket"].bounds[1] == pytest.approx(by["o_diam"].bounds[0])
    # ring radii: sample | g_ins | gasket
    assert by["g_ins"].bounds[2] == pytest.approx(r_sample)
    assert by["gasket"].bounds[2] == pytest.approx(by["g_ins"].bounds[3])
    # the stack tiles a mesh
    mesh = build_structured_mesh(domain, mats)
    assert mesh.num_nodes > 0
    # diamond-aware watcher points sit inside the couplers
    wp = coupler_watcher_points(cfg)
    assert by["p_coupler"].bounds[0] < wp["pside"][0] < \
        by["p_coupler"].bounds[1]


def test_time_chunked_sweep_matches_unchunked():
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    cfg["timing"]["num_steps"] = 7
    df = synthetic_heating()
    heating = HeatingCurve(time=df["time"].to_numpy(),
                           temp=df["temp"].to_numpy())
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    problem = build_problem(mesh, heating, cfg,
                            watcher_points=coupler_watcher_points(cfg))
    ks = np.array([3.0, 4.5, 6.0])
    fs = np.array([5e-6, 6e-6, 7e-6])
    full = np.asarray(make_sweep_fn(problem, dtype=jnp.float64,
                                    rtol=1e-12)(ks, fs))
    chunked = run_sweep_time_chunked(problem, ks, fs, step_chunk=3,
                                     dtype=jnp.float64, rtol=1e-12)
    assert chunked.shape == full.shape == (3, 7, 2)
    scale = np.abs(full).max()
    assert np.abs(chunked - full).max() / scale < 1e-10


def test_balanced_chunk_len():
    """Chunk lengths are ceil-balanced over ceil(total/step_chunk) chunks:
    never above step_chunk, and the discarded surplus of the ragged final
    chunk is below n_chunks (40@25 runs 20+20, not 25+25-discard-10)."""
    from heatflow_tpu.sim.sweepkernel import balanced_chunk_len
    assert balanced_chunk_len(40, 25) == 20
    assert balanced_chunk_len(40, 40) == 40
    assert balanced_chunk_len(40, 100) == 40     # clamped to total
    assert balanced_chunk_len(7, 3) == 3         # 3+3+1, already minimal
    assert balanced_chunk_len(100, 30) == 25     # 4 x 25, zero surplus
    assert balanced_chunk_len(1, 1) == 1
    for total in range(1, 200):
        for sc in range(1, 64):
            cl = balanced_chunk_len(total, sc)
            n_chunks = -(-total // cl)
            assert 1 <= cl <= min(sc, total)
            # same number of device calls as naive fixed-length chunking
            assert n_chunks == -(-total // min(sc, total))
            # surplus solves of the ragged tail < one per chunk
            assert n_chunks * cl - total < n_chunks


def test_pcg_rtol_modes():
    rng = np.random.default_rng(0)
    n = 30
    Q = rng.standard_normal((n, n))
    A = Q @ Q.T + n * np.eye(n)
    x_true = rng.standard_normal(n)
    b = A @ x_true
    # warm start very close to the solution: r0-relative must do MORE
    # refinement than b-relative at the same rtol
    x0 = jnp.asarray(x_true + 1e-6 * rng.standard_normal(n))
    apply_op = lambda v: jnp.asarray(A) @ v
    r_b = pcg(apply_op, jnp.asarray(b), x0, rtol=1e-4, maxiter=500,
              rtol_wrt="b")
    r_r0 = pcg(apply_op, jnp.asarray(b), x0, rtol=1e-4, maxiter=500,
               rtol_wrt="r0")
    assert int(r_b.iters) == 0          # already below 1e-4 ||b||
    assert int(r_r0.iters) > 0          # keeps refining the increment
    err_b = np.abs(np.asarray(r_b.x) - x_true).max()
    err_r0 = np.abs(np.asarray(r_r0.x) - x_true).max()
    assert err_r0 < err_b


def test_with_parameters_does_not_mutate():
    cfg = tiny_no_diamond_cfg()
    k0 = cfg["mats"]["p_sample"]["k"]
    cfg2 = with_parameters(cfg, sample_k=99.0, fwhm=1e-5, sample_z=2e-6)
    assert cfg["mats"]["p_sample"]["k"] == k0
    assert cfg2["mats"]["p_sample"]["k"] == 99.0
    assert cfg2["mats"]["p_sample"]["z"] == 2e-6


def test_radial_band_analysis():
    cfg = tiny_no_diamond_cfg()
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    out = radial_band_analysis(mesh)
    assert out["n_band_nodes"] > 0
    assert 0.0 < out["beta"] <= 1.0


def test_profile_trace_writes_files(tmp_path):
    import jax
    with profile_trace(str(tmp_path / "trace")):
        jnp.ones(16).sum().block_until_ready()
    files = list((tmp_path / "trace").rglob("*"))
    assert files, "profiler produced no files"


def test_profile_trace_noop():
    with profile_trace(None):
        pass
