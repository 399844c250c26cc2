#!/usr/bin/env python
"""Warm-start seed order at the official refined point: does a quadratic
seed buy a looser inner tolerance at equal trace accuracy?

Mechanism under test: at the official point (rline VMEM CG + ONE
f64-residual refinement pass, bench.py) the per-step absolute solve error
is ~inner_rtol x ||r_seed||, so a better seed either (a) lowers the error
at the same rtol, or (b) holds the error while the rtol is loosened — and
a looser rtol is fewer inner iterations. 'extrapolate' (2u_n - u_{n-1})
already moved the bill 121 -> 86 mean iters/step vs 'previous';
'extrapolate2' (3u_n - 3u_{n-1} + u_{n-2}) is the next rung, at the cost
of one extra carried field and gain-4 (vs gain-2) amplification of carry
noise.

Protocol: flagship geballe_with_diamond mesh (251x1107 = 277,857 nodes),
100 steps, the official solver stack, warm timings (2nd call of the
memoized fn). Errors are full-trace o-side peak/rms vs the f64 rtol-1e-11
ground truth (computed once on-TPU through the chunked runner to respect
the ~60 s relay call limit, cached next to this script).

Usage:
  python benchmarks/expt_seed_order.py --truth-only        # stage 1
  python benchmarks/expt_seed_order.py --ws extrapolate2 --rtols 1e-4
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
TRUTH = os.path.join(ROOT, "benchmarks", ".flagship_truth_f64.npz")


def get_truth(problem):
    if os.path.exists(TRUTH):
        d = np.load(TRUTH)
        return d["watch"], d["times"]
    import jax.numpy as jnp
    from heatflow_tpu.sim.sweepkernel import run_sweep_time_chunked

    base_k = float(problem.kappas[
        list(problem.mesh.material_tags).index("p_sample")])
    t0 = time.time()
    tr = run_sweep_time_chunked(
        problem, np.array([base_k]), np.array([problem.fwhm]),
        step_chunk=20, dtype=jnp.float64, rtol=1e-11, maxiter=40000,
        precondition="rline", solver="xla", rtol_wrt="b", verbose=True)
    watch = np.asarray(tr)[0]                     # (S, W)
    times = np.arange(1, problem.num_steps + 1) * float(problem.dt)
    print(f"# truth computed in {time.time()-t0:.0f}s, final watchers "
          f"{watch[-1].tolist()}", file=sys.stderr)
    np.savez(TRUTH, watch=watch, times=times)
    return watch, times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--truth-only", action="store_true")
    ap.add_argument("--ws", default="extrapolate,extrapolate2")
    ap.add_argument("--rtols", default="1e-4")
    ap.add_argument("--inner-seed", default="zero",
                    help="refined inner-CG seed: zero | carry")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from bench import build_flagship
    from heatflow_tpu.sim.stepper import make_simulate_fn

    problem = build_flagship()
    truth, _ = get_truth(problem)
    if args.truth_only:
        return

    for ws in args.ws.split(","):
        for rtol in (float(r) for r in args.rtols.split(",")):
            fn = make_simulate_fn(problem, dtype=jnp.float32, rtol=rtol,
                                  maxiter=8000, record_gradient=False,
                                  record_fields=False, rtol_wrt="r0",
                                  solver="auto", precondition="rline",
                                  warm_start=ws, f64_refine=1,
                                  inner_seed=args.inner_seed)
            best = np.inf
            for _ in range(args.reps):
                t0 = time.time()
                ys = fn()
                ys["final_u"].block_until_ready()
                best = min(best, time.time() - t0)
            watch = np.asarray(ys["watch"])       # (S, W)
            iters = np.asarray(ys["cg_iters"])
            err = watch - truth
            print(json.dumps({
                "ws": ws, "rtol": rtol, "inner_seed": args.inner_seed,
                "steps_per_sec": round(problem.num_steps / best, 1),
                "iters_mean": round(float(iters.mean()), 1),
                "iters_max": int(iters.max()),
                "oside_peak_K": round(float(np.abs(err[:, 1]).max()), 4),
                "oside_rms_K": round(float(np.sqrt((err[:, 1]**2).mean())),
                                     4),
                "pside_peak_K": round(float(np.abs(err[:, 0]).max()), 4),
            }))


if __name__ == "__main__":
    main()
