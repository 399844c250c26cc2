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


def test_extrapolation_converges_to_same_solution():
    problem, _ = g._tiny_flagship(size_scale=24.0)
    outs = []
    for ws in ("previous", "extrapolate"):
        fn = make_simulate_fn(problem, dtype=jnp.float64, rtol=1e-12,
                              record_gradient=False, warm_start=ws)
        outs.append(np.asarray(fn()["final_u"]))
    np.testing.assert_allclose(outs[1], outs[0], rtol=0, atol=1e-9)
