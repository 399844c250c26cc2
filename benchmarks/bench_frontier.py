#!/usr/bin/env python
"""Measure arbitrary flagship speed-accuracy frontier points.

One row per (rtol, f64_refine, warm_start, precondition, solver) combo:
warm steps/s (best of --reps calls of the memoized simulate fn) plus
full-trace watcher error vs the cached f64 rtol-1e-11 ground truth
(benchmarks/.flagship_truth_f64.npz — build it once with
`python benchmarks/expt_seed_order.py --truth-only`).

This is the harness behind the BENCHMARKS.md frontier table rows; the
protocol matches bench.py (251x1107 geballe_with_diamond mesh, 100 steps,
watcher sampling each step).

Usage examples:
  python benchmarks/bench_frontier.py --rtols 1e-3,1e-4,1e-5   # pure f32
  python benchmarks/bench_frontier.py --rtols 1e-4 --refine 1  # official
  python benchmarks/bench_frontier.py --rtols 1e-3 --refine 2 --ws extrapolate
  python benchmarks/bench_frontier.py --rtols 1e-4 --refine 1 --unstructured

--unstructured runs the perturbed-flagship non-grid triangulation through
the grid-overlay 9-point engine (make_simulate_fn_unstructured); accuracy
is reported vs its OWN f64 ground truth (cached separately — the
triangulated operator differs from the structured one).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


UTRUTH = os.path.join(ROOT, "benchmarks", ".flagship_truth_unstructured.npz")


def _unstructured_flagship():
    """Perturbed-flagship non-grid triangulation (grid overlay retained)
    plus its own f64 rtol-1e-11 watcher-trace ground truth (cached — the
    triangulated operator is NOT the structured one, so the structured
    truth does not apply)."""
    import time as _time

    import jax.numpy as jnp

    from heatflow_tpu.mesh.unstructured_gen import perturb_structured_mesh
    from heatflow_tpu.sim.unstructured import (build_problem_unstructured,
                                               make_simulate_fn_unstructured)

    from heatflow_tpu.config import load_config
    from heatflow_tpu.geometry import build_layout, coupler_watcher_points
    from heatflow_tpu.mesh.structured import build_structured_mesh
    from heatflow_tpu.sim.bc import HeatingCurve

    cfg = load_config(os.path.join(ROOT, "cfgs",
                                   "geballe_with_diamond.yaml"))
    cfg["heating"]["file"] = os.path.join(ROOT, "experimental_data",
                                          "geballe_heat_data.csv")
    domain, mats = build_layout(cfg)
    smesh = build_structured_mesh(domain, mats)
    umesh = perturb_structured_mesh(smesh, jitter=0.25, seed=3)
    problem = build_problem_unstructured(
        umesh, HeatingCurve.from_csv(cfg["heating"]["file"]), cfg,
        watcher_points=coupler_watcher_points(cfg))
    if os.path.exists(UTRUTH):
        truth = np.load(UTRUTH)["watch"]
    else:
        # the unstructured truth is the f64-indistinguishable refine2 @
        # inner 1e-4 mode (<1e-5 K from the f64 trajectory on the
        # structured twin, BENCHMARKS.md — the all-f64 rline engine is
        # structured-only, and jacobi f64 at rtol 1e-11 would grind for
        # minutes through the relay's 60 s call limit)
        jax = __import__("jax")
        jax.config.update("jax_enable_x64", True)
        t0 = _time.time()
        ys = make_simulate_fn_unstructured(
            problem, dtype=jnp.float32, rtol=1e-4, maxiter=8000,
            record_gradient=False, record_fields=False, rtol_wrt="r0",
            precondition="rline", solver="auto", warm_start="extrapolate",
            f64_refine=2)()
        truth = np.asarray(ys["watch"], np.float64)
        print(f"# unstructured truth (refine2@1e-4) computed in "
              f"{_time.time()-t0:.0f}s, final watchers "
              f"{truth[-1].tolist()}", file=sys.stderr)
        np.savez(UTRUTH, watch=truth)
    return problem, truth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rtols", default="1e-4")
    ap.add_argument("--refine", type=int, default=0)
    ap.add_argument("--ws", default="extrapolate")
    ap.add_argument("--precondition", default="rline")
    ap.add_argument("--solver", default="auto")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--unstructured", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    # x64 unconditionally: get_truth() computes the f64 rtol-1e-11 ground
    # truth on first use — without x64 it would silently degrade to f32 and
    # poison the cached truth for every later measurement
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from bench import build_flagship
    from benchmarks.expt_seed_order import get_truth
    from heatflow_tpu.sim.stepper import make_simulate_fn

    if args.unstructured:
        problem, truth = _unstructured_flagship()
        def maker(rtol):
            from heatflow_tpu.sim.unstructured import \
                make_simulate_fn_unstructured
            return make_simulate_fn_unstructured(
                problem, dtype=jnp.float32, rtol=rtol, maxiter=8000,
                record_gradient=False, record_fields=False, rtol_wrt="r0",
                solver=args.solver, precondition=args.precondition,
                warm_start=args.ws, f64_refine=args.refine)
    else:
        problem = build_flagship()
        truth, _ = get_truth(problem)
        def maker(rtol):
            return make_simulate_fn(
                problem, dtype=jnp.float32, rtol=rtol, maxiter=8000,
                record_gradient=False, record_fields=False, rtol_wrt="r0",
                solver=args.solver, precondition=args.precondition,
                warm_start=args.ws, f64_refine=args.refine)

    for rtol in (float(r) for r in args.rtols.split(",")):
        fn = maker(rtol)
        best = np.inf
        for _ in range(args.reps):
            t0 = time.time()
            ys = fn()
            ys["final_u"].block_until_ready()
            best = min(best, time.time() - t0)
        watch = np.asarray(ys["watch"])
        iters = np.asarray(ys["cg_iters"])
        err = watch - truth
        print(json.dumps({
            "rtol": rtol, "refine": args.refine, "ws": args.ws,
            "precondition": args.precondition,
            "steps_per_sec": round(problem.num_steps / best, 1),
            "iters_mean": round(float(iters.mean()), 1),
            "iters_max": int(iters.max()),
            "oside_peak_K": round(float(np.abs(err[:, 1]).max()), 4),
            "oside_rms_K": round(float(np.sqrt((err[:, 1] ** 2).mean())), 4),
            "pside_peak_K": round(float(np.abs(err[:, 0]).max()), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
