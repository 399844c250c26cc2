"""Round-5 advisor-fix regressions: sweep group-cache staleness, the
adaptive+cheb validation, and the rtol_wrt-aware precondition resolution
(ADVICE.md round 4)."""

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
import yaml

from heatflow_tpu.utils import resolve_recording_precondition
from tests.fixtures import synthetic_heating, tiny_no_diamond_cfg


def test_group_cache_invalidates_on_heating_rewrite(tmp_path):
    """Rewriting the heating CSV at the same path between
    run_parameter_sweep invocations must be a cache miss — the cached
    problem embeds the parsed heating contents (ADVICE r4 medium)."""
    from heatflow_tpu.drivers import sweep as sweep_mod

    heat_csv = tmp_path / "heat.csv"
    synthetic_heating(heat_csv)
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    cfg["heating"]["file"] = str(heat_csv)
    cfg["timing"]["num_steps"] = 3
    mesh_folder = str(tmp_path / "meshes" / "w0")

    sweep_mod._GROUP_CACHE.clear()
    mesh1, problem1, heating1 = sweep_mod._cached_group(cfg, mesh_folder)
    # unchanged files: hit returns the identical objects
    mesh2, problem2, heating2 = sweep_mod._cached_group(cfg, mesh_folder)
    assert mesh2 is mesh1 and problem2 is problem1 and heating2 is heating1

    # rewrite the heating CSV at the SAME path with different contents
    df = synthetic_heating(n=40)
    df["temp"] = df["temp"] + 500.0
    df.to_csv(heat_csv, index=False)
    _m3, _p3, heating3 = sweep_mod._cached_group(cfg, mesh_folder)
    assert heating3 is not heating1
    assert np.max(np.abs(np.asarray(heating3.temp)
                         - np.asarray(heating1.temp))) > 100.0


def test_adaptive_rejects_cheb_degree():
    """precondition='adaptive' must refuse vmem_cheb_degree instead of
    silently dropping it in the lax.cond branches (ADVICE r4 low)."""
    from heatflow_tpu.geometry import build_layout
    from heatflow_tpu.mesh.structured import build_structured_mesh
    from heatflow_tpu.sim.bc import HeatingCurve
    from heatflow_tpu.sim.problem import build_problem
    from heatflow_tpu.sim.stepper import make_simulate_fn

    cfg = tiny_no_diamond_cfg(coarse=3.0)
    cfg["timing"]["num_steps"] = 2
    df = synthetic_heating()
    heating = HeatingCurve(time=df["time"].to_numpy(),
                           temp=df["temp"].to_numpy(),
                           oside=df["oside"].to_numpy())
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    problem = build_problem(mesh, heating, cfg)
    with pytest.raises(ValueError, match="adaptive"):
        make_simulate_fn(problem, dtype=jnp.float32,
                         precondition="adaptive", vmem_cheb_degree=2)


def test_resolve_precondition_rtol_wrt():
    """Non-default loose stopping keeps the accuracy-safe preconditioners:
    the adi single-run default is measured only under wrt-'r0'."""
    f32 = jnp.float32
    assert resolve_recording_precondition(False, f32) == "adi"
    assert resolve_recording_precondition(False, f32, rtol_wrt="b") \
        == "jacobi"
    assert resolve_recording_precondition(True, f32, rtol_wrt="b") \
        == "rline"
    # refined runs are normalized to inner wrt-'b' stopping already and
    # keep their own resolution
    assert resolve_recording_precondition(
        False, f32, f64_refine=1, vmem_single=True) == "adaptive"


def test_batched_adaptive_matches_static_lanes():
    """The per-config adaptive rline/adi switch (round-5, VERDICT r4 item
    8) is bitwise the static kernel per lane: flagged lanes equal the adi
    kernel's trajectory, unflagged lanes the rline kernel's."""
    import jax
    from heatflow_tpu.geometry import build_layout, coupler_watcher_points
    from heatflow_tpu.mesh.structured import build_structured_mesh
    from heatflow_tpu.ops.pallas_cg import cg_vmem_batched_tol
    from heatflow_tpu.ops.stencil import combine_operator
    from heatflow_tpu.sim.bc import HeatingCurve
    from heatflow_tpu.sim.problem import build_problem

    cfg = tiny_no_diamond_cfg(coarse=3.0)
    df = synthetic_heating()
    heating = HeatingCurve(time=df["time"].to_numpy(),
                           temp=df["temp"].to_numpy(),
                           oside=df["oside"].to_numpy())
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    problem = build_problem(mesh, heating, cfg,
                            watcher_points=coupler_watcher_points(cfg))
    dev = problem.device_arrays(jnp.float32)
    dt = jnp.asarray(problem.dt, jnp.float32)
    A0, _M = combine_operator(dev["K"], dev["M"], dev["kappas"],
                              dev["rho_cvs"], dt)
    Kv = dev["K"][list(problem.mesh.material_tags).index("p_sample")]
    free, dirich = dev["free"], dev["dirichlet"]
    B = 4
    rng = np.random.default_rng(0)
    dks = jnp.asarray(np.linspace(0, 2e-7, B), jnp.float32)
    diag = A0[0][None] + dks[:, None, None] * Kv[0][None]
    s = jax.lax.rsqrt(jnp.where(diag > 0, diag, 1.0)) * free + dirich
    sm = s * free
    nz, nr = problem.mesh.shape
    b = jnp.asarray(rng.standard_normal((B, nz, nr)).astype(np.float32)) \
        * sm
    x0 = jnp.zeros_like(b)
    flags = jnp.asarray([1, 0, 1, 0], jnp.int32)
    kw = dict(maxiter=2000, interpret=True)
    xa, ita = cg_vmem_batched_tol(A0, Kv, dks, sm, b, x0, 1e-6,
                                  adi_flags=flags, **kw)
    xr, itr = cg_vmem_batched_tol(A0, Kv, dks, sm, b, x0, 1e-6,
                                  rline=True, **kw)
    xd, itd = cg_vmem_batched_tol(A0, Kv, dks, sm, b, x0, 1e-6,
                                  adi=True, **kw)
    xa, xr, xd = map(np.asarray, (xa, xr, xd))
    for i in range(B):
        ref = xd[i] if int(flags[i]) else xr[i]
        its_ref = (itd if int(flags[i]) else itr)[i]
        np.testing.assert_array_equal(xa[i], ref)
        assert int((ita if True else 0)[i]) == int(its_ref)
    with pytest.raises(ValueError, match="adi_flags"):
        cg_vmem_batched_tol(A0, Kv, dks, sm, b, x0, 1e-6,
                            adi_flags=flags, rline=True, **kw)


def test_sweep_scan_adaptive_runs():
    """make_sweep_fn(precondition='adaptive'): finite traces, tolerance-
    equal to the static rline engine."""
    from heatflow_tpu.geometry import build_layout, coupler_watcher_points
    from heatflow_tpu.mesh.structured import build_structured_mesh
    from heatflow_tpu.sim.bc import HeatingCurve
    from heatflow_tpu.sim.problem import build_problem
    from heatflow_tpu.sim.sweepkernel import make_sweep_fn

    cfg = tiny_no_diamond_cfg(coarse=3.0)
    cfg["timing"]["num_steps"] = 4
    df = synthetic_heating()
    heating = HeatingCurve(time=df["time"].to_numpy(),
                           temp=df["temp"].to_numpy(),
                           oside=df["oside"].to_numpy())
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    problem = build_problem(mesh, heating, cfg,
                            watcher_points=coupler_watcher_points(cfg))
    ks = np.array([2.0, 3.8, 7.5])
    fs = np.full(3, 6e-6)
    fn_a = make_sweep_fn(problem, dtype=jnp.float32, solver="vmem",
                         precondition="adaptive", rtol=1e-5,
                         rtol_wrt="r0")
    fn_r = make_sweep_fn(problem, dtype=jnp.float32, solver="vmem",
                         precondition="rline", rtol=1e-5, rtol_wrt="r0")
    ta = np.asarray(fn_a(ks, fs))
    tr = np.asarray(fn_r(ks, fs))
    assert np.isfinite(ta).all()
    scale = np.abs(tr).max()
    assert np.abs(ta - tr).max() / scale < 1e-3   # tolerance-class equal
    with pytest.raises(ValueError, match="tolerance-based"):
        make_sweep_fn(problem, dtype=jnp.float32, solver="vmem",
                      precondition="adaptive", fixed_iters=5)
