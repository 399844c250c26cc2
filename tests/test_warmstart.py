"""Extrapolated warm starts: same per-step cost, strictly better accuracy.

Measured on the TPU flagship (BENCHMARKS.md): at an identical mean CG
iteration count the linearly-extrapolated seed (2u_n - u_{n-1}) cuts the
f32 trace-peak error ~2x vs seeding with u_n. This test pins the mechanism
at small scale: with a FIXED iteration budget per step, the extrapolated
seed must end closer to the tightly-converged trajectory."""

import numpy as np
import jax.numpy as jnp

import __graft_entry__ as g
from heatflow_tpu.sim.stepper import make_simulate_fn


def test_extrapolated_seed_beats_previous_at_fixed_iters():
    problem, _ = g._tiny_flagship(size_scale=16.0)

    truth = make_simulate_fn(problem, dtype=jnp.float64, rtol=1e-13,
                             record_gradient=False)()["final_u"]

    def err(ws):
        fn = make_simulate_fn(problem, dtype=jnp.float64, fixed_iters=12,
                              record_gradient=False, warm_start=ws)
        return float(jnp.max(jnp.abs(fn()["final_u"] - truth)))

    e_prev = err("previous")
    e_extr = err("extrapolate")
    assert e_extr < e_prev, (e_extr, e_prev)


def test_sweep_extrapolated_seed_beats_previous_at_fixed_iters():
    """Sweep-engine version: with a fixed per-step iteration budget, the
    extrapolated seed lands the whole batch closer to the converged
    trajectories — and the vmem kernel (interpreter mode here) matches the
    XLA path under the same seeding."""
    from heatflow_tpu.sim.sweepkernel import make_sweep_fn

    problem, _ = g._tiny_flagship(size_scale=16.0)
    ks = np.array([2.0, 6.0])
    fs = np.array([problem.fwhm, 1.2 * problem.fwhm])

    truth = make_sweep_fn(problem, dtype=jnp.float64, rtol=1e-12,
                          maxiter=20000)(ks, fs)

    def err(ws, solver="xla"):
        fn = make_sweep_fn(problem, dtype=jnp.float64, fixed_iters=10,
                           solver=solver, warm_start=ws)
        return fn(ks, fs), float(jnp.max(jnp.abs(fn(ks, fs) - truth)))

    _, e_prev = err("previous")
    _, e_extr = err("extrapolate")
    assert e_extr < e_prev, (e_extr, e_prev)

    # vmem/XLA trajectory equality under the same seeding. Checked on a
    # short scan: at deliberately-unconverged fixed budgets, reduction-order
    # noise between the two implementations is re-amplified every step (the
    # extrapolated seed has gain 2 on carry perturbations), so long-scan
    # equality is not a well-posed target — converged-budget equality is
    # covered by tests/test_pallas_cg.py.
    kw = dict(dtype=jnp.float64, fixed_iters=10, num_steps=6,
              warm_start="extrapolate")
    tr_x = make_sweep_fn(problem, solver="xla", **kw)(ks, fs)
    tr_v = make_sweep_fn(problem, solver="vmem", **kw)(ks, fs)
    np.testing.assert_allclose(np.asarray(tr_v), np.asarray(tr_x),
                               rtol=0, atol=1e-7)


def test_unstructured_warm_start_honored_and_seed_independent():
    """ELL/overlay-path wiring: warm_start='extrapolate' genuinely changes
    the unconverged fixed-budget trajectory, and at tight tolerance the
    result is seed-independent. (Whether extrapolation WINS on unstructured
    meshes is regime-dependent — at the coarse dt of tiny test problems the
    field changes too fast between steps for linear extrapolation to help,
    unlike the measured flagship regime in BENCHMARKS.md — so the
    accuracy-ordering assertion lives in the structured tests above.)"""
    from heatflow_tpu.geometry import build_layout
    from heatflow_tpu.mesh.unstructured_gen import build_unstructured_mesh
    from heatflow_tpu.sim.bc import HeatingCurve
    from heatflow_tpu.sim.unstructured import (build_problem_unstructured,
                                               make_simulate_fn_unstructured)
    from tests.fixtures import synthetic_heating, tiny_no_diamond_cfg

    cfg = tiny_no_diamond_cfg(coarse=2.0)
    cfg["timing"]["num_steps"] = 6
    domain, mats = build_layout(cfg)
    umesh = build_unstructured_mesh(domain, mats, jitter=0.25, seed=3)
    df = synthetic_heating()
    heating = HeatingCurve(time=df["time"].to_numpy(),
                           temp=df["temp"].to_numpy())
    problem = build_problem_unstructured(umesh, heating, cfg)

    def run(ws, **kw):
        fn = make_simulate_fn_unstructured(
            problem, dtype=jnp.float64, record_gradient=False,
            warm_start=ws, **kw)
        return np.asarray(fn()["final_u"])

    # the knob is honored: unconverged trajectories differ
    u_prev = run("previous", fixed_iters=10)
    u_extr = run("extrapolate", fixed_iters=10)
    assert np.max(np.abs(u_prev - u_extr)) > 1e-6

    # converged answers are seed-independent
    t_prev = run("previous", rtol=1e-12)
    t_extr = run("extrapolate", rtol=1e-12)
    np.testing.assert_allclose(t_extr, t_prev, rtol=0,
                               atol=1e-8 * np.abs(t_prev).max())


def test_extrapolation_converges_to_same_solution():
    problem, _ = g._tiny_flagship(size_scale=24.0)
    outs = []
    for ws in ("previous", "extrapolate"):
        fn = make_simulate_fn(problem, dtype=jnp.float64, rtol=1e-12,
                              record_gradient=False, warm_start=ws)
        outs.append(np.asarray(fn()["final_u"]))
    np.testing.assert_allclose(outs[1], outs[0], rtol=0, atol=1e-9)

def test_extrapolate2_converges_and_is_honored():
    """Quadratic seed (3u_n - 3u_{n-1} + u_{n-2}): converged answers are
    seed-independent, and at a fixed unconverged budget the trajectory
    genuinely differs from the linear seed (the knob is wired)."""
    problem, _ = g._tiny_flagship(size_scale=24.0)

    ref = make_simulate_fn(problem, dtype=jnp.float64, rtol=1e-12,
                           record_gradient=False,
                           warm_start="previous")()["final_u"]
    q = make_simulate_fn(problem, dtype=jnp.float64, rtol=1e-12,
                         record_gradient=False,
                         warm_start="extrapolate2")()["final_u"]
    np.testing.assert_allclose(np.asarray(q), np.asarray(ref),
                               rtol=0, atol=1e-9)

    def fixed(ws):
        fn = make_simulate_fn(problem, dtype=jnp.float64, fixed_iters=10,
                              record_gradient=False, warm_start=ws)
        return np.asarray(fn()["final_u"])

    assert np.abs(fixed("extrapolate2") - fixed("extrapolate")).max() > 1e-6

    import pytest
    with pytest.raises(ValueError, match="warm_start"):
        make_simulate_fn(problem, warm_start="cubic")


def test_chunked_extrapolate_matches_unchunked_bitwise():
    """Warm-start history is threaded across time chunks: a chunked
    'extrapolate' run must reproduce the unchunked trajectory BITWISE in
    f64 (the penultimate field re-enters each chunk — VERDICT r2 item 6)."""
    from heatflow_tpu.sim.sweepkernel import (make_sweep_fn,
                                              run_sweep_time_chunked)

    problem, _ = g._tiny_flagship(size_scale=16.0)
    ks = np.array([2.0, 6.0])
    fs = np.array([problem.fwhm, 1.2 * problem.fwhm])

    for solver in ("xla", "vmem"):
        full = make_sweep_fn(problem, dtype=jnp.float64, fixed_iters=8,
                             warm_start="extrapolate", solver=solver)(ks, fs)
        chunked = run_sweep_time_chunked(
            problem, ks, fs, step_chunk=3, dtype=jnp.float64,
            fixed_iters=8, warm_start="extrapolate", solver=solver)
        assert np.array_equal(np.asarray(full), np.asarray(chunked)), solver
