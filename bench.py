#!/usr/bin/env python
"""Headline benchmark: implicit backward-Euler steps/sec on the full-DAC
(geballe_with_diamond) mesh, run on the default JAX backend (TPU).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference publishes no numbers (BASELINE.md), so the baseline
is measured live on this machine — a factor-once sparse-LU backward-Euler
step (scipy SuperLU on the identical operator), which is the same algorithm
the reference delegates to PETSc/MUMPS (ref run_no_diamond.py:339-344,
529-541). The baseline measurement is cached on disk keyed by mesh shape.
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)
CACHE = os.path.join(ROOT, ".bench_baseline_cache.json")


def _enable_compilation_cache():
    """Persist compiled executables across bench invocations (first flagship
    compile is minutes through this environment's remote-compile path)."""
    try:
        import jax
        cache_dir = os.path.join(ROOT, ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        # the official point's one f64 refinement pass needs x64 (the f32
        # compute path is explicitly cast and unaffected)
        jax.config.update("jax_enable_x64", True)
    except Exception as e:
        print(f"# compilation cache unavailable: {e}", file=sys.stderr)


def build_flagship():
    import jax.numpy as jnp
    from heatflow_tpu.config import load_config
    from heatflow_tpu.geometry import build_layout, coupler_watcher_points
    from heatflow_tpu.mesh.structured import build_structured_mesh
    from heatflow_tpu.sim.bc import HeatingCurve
    from heatflow_tpu.sim.problem import build_problem

    cfg = load_config(os.path.join(ROOT, "cfgs", "geballe_with_diamond.yaml"))
    cfg["heating"]["file"] = os.path.join(ROOT, "experimental_data",
                                          "geballe_heat_data.csv")
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    heating = HeatingCurve.from_csv(cfg["heating"]["file"])
    problem = build_problem(mesh, heating, cfg,
                            watcher_points=coupler_watcher_points(cfg))
    return problem


def bench_tpu(problem, *, rtol=1e-4, maxiter=8000):
    import jax
    import jax.numpy as jnp
    from heatflow_tpu.sim.stepper import make_simulate_fn

    # the with_diamond reference loop does watcher sampling + XDMF only (no
    # gradient projection, ref run_with_diamond.py:469-504) — benchmark the
    # same per-step work. solver='auto' engages the VMEM-resident Pallas CG
    # preconditioned with the r-line PCR block-Jacobi
    # (precondition='rline', ops/linesolve.py), seeded with the linear
    # time extrapolation, plus ONE f64-residual refinement pass per step
    # (f64_refine=1 — the f64 outer removes the f32 operator-representation
    # floor from the achievable error; sim/stepper._solve_refined).
    # Accuracy at this official point vs the f64 ground truth: o-side
    # trace peak 0.58 K (rms 0.16 K) — strictly better than round 3's
    # earlier rline-only point (485 steps/s, 1.92 K) on BOTH axes; the
    # full frontier incl. f64-indistinguishable modes is in BENCHMARKS.md.
    # CHECK_EVERY=1 (ops/pallas_cg.py) stops the inner CG exactly at the
    # rule instead of overshooting by up to 7 iterations: +4.5% steps/s at
    # +0.03 K peak vs the CHECK_EVERY=8 rows (retune rows incl. the
    # accuracy-matched inner 8e-5 point are in BENCHMARKS.md).
    # precondition='adaptive' (round 4): per-step rline/adi switch — deep
    # solves (cold start, heating-curve kinks; detected by the previous
    # step's iteration count > 100) run the split-additive ADI kernel,
    # shallow warm-started steps the cheaper rline kernel. Interleaved
    # same-process A/B at this exact recipe: 608.2 steps/s vs 582.3
    # (static rline, the round-3 official) vs 554.6 (static adi) —
    # +4.4%, tolerance-class traces (benchmarks/expt_adaptive_ab.py;
    # round-3 verdict stretch item 8 landed).
    fn = make_simulate_fn(problem, dtype=jnp.float32, rtol=rtol,
                          maxiter=maxiter, record_gradient=False,
                          record_fields=False, rtol_wrt="r0",
                          solver="auto", precondition="adaptive",
                          warm_start="extrapolate", f64_refine=1)

    def timed_call(retries=2):
        # the axon relay occasionally drops a call (UNAVAILABLE: TPU device
        # error) and recovers on the next one — retry rather than lose the
        # round's official measurement to a transient
        for attempt in range(retries + 1):
            try:
                t0 = time.time()
                out = fn()
                out["final_u"].block_until_ready()
                return time.time() - t0, out
            except Exception as e:
                if attempt == retries:
                    raise
                print(f"# device call failed ({type(e).__name__}: {e}); "
                      f"retrying", file=sys.stderr)
                time.sleep(10)

    compile_and_run, ys = timed_call()

    # best of 3 timed reps (each ~0.2 s): the axon relay adds ±3-5%
    # run-to-run jitter, so a single rep under-reports on a bad draw
    runs = []
    for _ in range(3):
        dt_s, ys = timed_call()
        runs.append(dt_s)
    run = min(runs)

    iters = np.asarray(ys["cg_iters"])
    steps_per_sec = problem.num_steps / run
    return {
        "steps_per_sec": steps_per_sec,
        "run_s": run,
        "runs_s": [round(r, 4) for r in runs],
        "compile_and_run_s": compile_and_run,
        "cg_iters_mean": float(iters.mean()),
        "cg_iters_max": int(iters.max()),
        "watch_final": np.asarray(ys["watch"])[-1].tolist(),
    }


def bench_sweep(n_configs=1024, step_chunk=25):
    """Second headline metric (BASELINE.md): vmapped sweep configs/sec per
    chip at the >=1000-config north-star, on the standing sweep protocol
    (BENCHMARKS.md "Sweeps": geballe_no_diamond mesh 243x1001, kappa
    log-spaced in [1, 100], the config's full 40-step transients, f32
    production defaults — batched VMEM engine, rtol 1e-4 wrt ||b||,
    jacobi — time-chunked to keep device calls bounded)."""
    import jax.numpy as jnp
    from heatflow_tpu.config import load_config
    from heatflow_tpu.geometry import build_layout, coupler_watcher_points
    from heatflow_tpu.mesh.structured import build_structured_mesh
    from heatflow_tpu.sim.bc import HeatingCurve
    from heatflow_tpu.sim.problem import build_problem
    from heatflow_tpu.sim.sweepkernel import run_sweep_time_chunked

    cfg = load_config(os.path.join(ROOT, "cfgs", "geballe_no_diamond.yaml"))
    cfg["heating"]["file"] = os.path.join(ROOT, "experimental_data",
                                          "geballe_heat_data.csv")
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    heating = HeatingCurve.from_csv(cfg["heating"]["file"])
    problem = build_problem(mesh, heating, cfg,
                            watcher_points=coupler_watcher_points(cfg))
    B = n_configs
    ks = np.logspace(0.0, 2.0, B)
    fs = np.full(B, float(cfg["heating"]["fwhm"]))

    def once():
        t0 = time.time()
        tr = np.asarray(run_sweep_time_chunked(
            problem, ks, fs, step_chunk=step_chunk, solver="vmem",
            rtol=1e-4, dtype=jnp.float32))
        return time.time() - t0, tr

    for attempt in range(3):       # relay retry, same as timed_call
        try:
            cold, tr = once()
            break
        except Exception as e:
            if attempt == 2:
                raise
            print(f"# sweep call failed ({type(e).__name__}); retrying",
                  file=sys.stderr)
            time.sleep(10)
    warm = min(once()[0], once()[0])
    return {"configs_per_sec": B / warm, "batch": B, "warm_s": warm,
            "cold_s": cold, "finite_frac": float(np.isfinite(tr).mean())}


def bench_baseline(problem):
    """Factor-once sparse LU backward-Euler steps/sec (reference algorithm)
    on this machine's CPU, on the identical operator."""
    key = f"splu_{problem.mesh.shape[0]}x{problem.mesh.shape[1]}_{problem.dt:.3e}"
    if os.path.exists(CACHE):
        try:
            cache = json.load(open(CACHE))
            if key in cache:
                return cache[key]
        except Exception:
            cache = {}
    else:
        cache = {}

    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    from heatflow_tpu.ops.stencil import stencil_to_coo

    st = problem.stencils
    A7 = (np.einsum("m,mkij->kij", problem.rho_cvs, st.M)
          + problem.dt * np.einsum("m,mkij->kij", problem.kappas, st.K))
    M7 = np.einsum("m,mkij->kij", problem.rho_cvs, st.M)
    n = problem.mesh.num_nodes
    rows, cols, vals = stencil_to_coo(A7)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsc()
    rows, cols, vals = stencil_to_coo(M7)
    M = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()

    free = problem.free_mask.ravel()
    A_ff = A[free][:, free].tocsc()
    A_fd = A[free][:, ~free].tocsr()

    t0 = time.time()
    lu = spla.splu(A_ff)
    factor_s = time.time() - t0

    u = np.full(n, problem.ic_temp)
    g = np.full((~free).sum(), problem.ic_temp)
    n_steps = 5
    t0 = time.time()
    for _ in range(n_steps):
        b = M @ u                      # rhs assembly equivalent
        rhs = b[free] - A_fd @ g       # lifting
        x = lu.solve(rhs)              # MUMPS-equivalent back-substitution
        u[free] = x
    per_step = (time.time() - t0) / n_steps
    out = {"steps_per_sec": 1.0 / per_step, "factor_s": factor_s,
           "per_step_s": per_step}
    cache[key] = out
    try:
        json.dump(cache, open(CACHE, "w"))
    except Exception:
        pass
    return out


def main():
    _enable_compilation_cache()
    problem = build_flagship()
    tpu = bench_tpu(problem)
    base = bench_baseline(problem)
    result = {
        "metric": "implicit_steps_per_sec_2d_dac",
        "value": round(tpu["steps_per_sec"], 3),
        "unit": "steps/s",
        "vs_baseline": round(tpu["steps_per_sec"] / base["steps_per_sec"], 3),
    }
    # second headline metric (BASELINE.md): >=1000 concurrent sweep
    # configs/sec per chip — reported in the same JSON line
    try:
        sw = bench_sweep()
        result["sweep_cfgs_per_sec"] = round(sw["configs_per_sec"], 2)
        result["sweep_batch"] = sw["batch"]
    except Exception as e:
        sw = {"error": f"{type(e).__name__}: {e}"}
    # diagnostics to stderr; the contract is ONE json line on stdout
    print(f"# mesh {problem.mesh.shape}, {problem.mesh.num_nodes} nodes; "
          f"tpu: {tpu}; baseline: {base}; sweep: {sw}", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
