#!/usr/bin/env python
"""CHECK_EVERY granularity at the official flagship point.

The VMEM tol kernels USED to check convergence every CHECK_EVERY=8
iterations (ops/pallas_cg.py): iteration counts overshot the stopping rule
by up to 7, a mean of ~3.5 — ~4% of the official point's 86.6 mean
iters/step. The residual norm ``rr`` is already computed every iteration
(it drives the stopping rule), so a finer check costs only while-loop
bookkeeping — measured ~zero, which is why CHECK_EVERY=1 is now the
default (promoted after the runs recorded in BENCHMARKS.md: official
564.7→590.2 steps/s; plain-jacobi guard 168.7→176.2; recording driver
default 34.6→38.6 cfg/s). This experiment measures CHECK_EVERY values on
a chosen recipe (--precondition/--rtol/--f64-refine), interleaved in one
process so relay drift cancels.

Each variant is a separate compile (CHECK_EVERY is a trace-time constant);
variants get distinct maxiter values to bust the maker memoization without
changing behavior (maxiter is never reached at this rtol).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--values", default="8,4,2,1")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--precondition", default="rline")
    ap.add_argument("--rtol", type=float, default=1e-4)
    ap.add_argument("--f64-refine", type=int, default=1)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import heatflow_tpu.ops.pallas_cg as pc
    from bench import build_flagship

    problem = build_flagship()
    from heatflow_tpu.sim.stepper import make_simulate_fn

    values = [int(s) for s in args.values.split(",")]
    fns = {}
    for i, ce in enumerate(values):
        pc.CHECK_EVERY = ce
        fns[ce] = make_simulate_fn(
            problem, dtype=jnp.float32, rtol=args.rtol, maxiter=8000 + i,
            record_gradient=False, rtol_wrt="r0", solver="auto",
            precondition=args.precondition, warm_start="extrapolate",
            f64_refine=args.f64_refine)
        t0 = time.time()
        ys = fns[ce]()
        ys["final_u"].block_until_ready()
        print(f"# CHECK_EVERY={ce}: compile+run {time.time()-t0:.1f}s, "
              f"iters mean {float(np.asarray(ys['cg_iters']).mean()):.2f} "
              f"max {int(np.asarray(ys['cg_iters']).max())}, "
              f"watch_final {np.asarray(ys['watch'])[-1].tolist()}",
              file=sys.stderr)

    results = {ce: [] for ce in values}
    iters = {}
    for _r in range(args.rounds):
        for ce in values:          # interleave: relay drift cancels
            t0 = time.time()
            ys = fns[ce]()
            ys["final_u"].block_until_ready()
            results[ce].append(time.time() - t0)
            iters[ce] = float(np.asarray(ys["cg_iters"]).mean())

    out = {str(ce): {
        "steps_per_sec_best": round(problem.num_steps / min(ts), 1),
        "steps_per_sec_mean": round(problem.num_steps
                                    / (sum(ts) / len(ts)), 1),
        "runs_s": [round(t, 4) for t in ts],
        "iters_mean": round(iters[ce], 2),
    } for ce, ts in results.items()}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
