#!/usr/bin/env python
"""Per-step rline/adi switch (`precondition='adaptive'`) vs the static
preconditioners, interleaved at a chosen flagship recipe — the round-4
stretch experiment (round-3 verdict item 8: "an adaptive z-phase could
dominate both current points").

Opportunity analysis (per-step iteration profiles at the official refine1
recipe, probe recorded in BENCHMARKS.md): adi's 1.67x cut concentrates in
the cold start (381→121 iters) and a mid-transient kink (steps ~38-53);
88% of steps are shallow and favor rline. The switch uses the previous
step's iteration count as a one-step-lagged depth predictor.

Usage: python benchmarks/expt_adaptive_ab.py [--rounds 4]
         [--rtol 1e-4] [--f64-refine 1] [--thresholds 100,140]
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
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--rtol", type=float, default=1e-4)
    ap.add_argument("--f64-refine", type=int, default=1)
    ap.add_argument("--thresholds", default="120")
    ap.add_argument("--with-mgz", action="store_true",
                    help="add the round-5 in-kernel z-semicoarsened "
                         "MG-rline variant (precondition='mgz')")
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
    variants = [("rline", dict(precondition="rline")),
                ("adi", dict(precondition="adi"))]
    for th in (int(s) for s in args.thresholds.split(",")):
        variants.append((f"adaptive{th}",
                         dict(precondition="adaptive",
                              adaptive_thresh=th)))
    if args.with_mgz:
        # sweeps=1 only: the s2 variant's kernel (embedded coarse stencil
        # + larger live set) exceeds the 128M physical VMEM at flagship
        # scale (142.6M measured — round-5 mgz notes in BENCHMARKS.md)
        variants.append(("mgz_s1", dict(precondition="mgz",
                                        mgz_sweeps=1)))

    fns = {}
    for name, kw in variants:
        fns[name] = make_simulate_fn(
            problem, dtype=jnp.float32, rtol=args.rtol, maxiter=8000,
            record_gradient=False, rtol_wrt="r0", solver="auto",
            warm_start="extrapolate", f64_refine=args.f64_refine, **kw)
        t0 = time.time()
        ys = fns[name]()
        ys["final_u"].block_until_ready()
        its = np.asarray(ys["cg_iters"])
        print(f"# {name}: compile+run {time.time()-t0:.1f}s, iters mean "
              f"{its.mean():.2f} max {int(its.max())}, watch_final "
              f"{np.asarray(ys['watch'])[-1].tolist()}", file=sys.stderr)

    results = {n: [] for n, _ in variants}
    iters = {}
    for _r in range(args.rounds):
        for name, _ in variants:        # interleave: relay drift cancels
            t0 = time.time()
            ys = fns[name]()
            ys["final_u"].block_until_ready()
            results[name].append(time.time() - t0)
            iters[name] = np.asarray(ys["cg_iters"])

    out = {n: {
        "steps_per_sec_best": round(problem.num_steps / min(ts), 1),
        "steps_per_sec_mean": round(problem.num_steps
                                    / (sum(ts) / len(ts)), 1),
        "runs_s": [round(t, 4) for t in ts],
        "iters_mean": round(float(iters[n].mean()), 2),
        "iters_max": int(iters[n].max()),
    } for n, ts in results.items()}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
