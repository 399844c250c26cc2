#!/usr/bin/env python
"""Merged-dot (Chronopoulos–Gear) vs standard CG recurrence, interleaved
A/B at the official flagship point — the promotion gate for
pallas_cg.MERGED_DEFAULT (round-2 kernel-variant exploration measured the
merged recurrence at ~4.5%/iteration on the plain kernel via the
marginal-slope protocol; this experiment re-runs the comparison on the
production recipe end-to-end).

Both variants are separate compiles (MERGED_DEFAULT is read at trace
time); distinct maxiter values bust the maker memoization without changing
behavior. Interleaved rounds cancel relay drift. Also reports the batched
sweep engine (--sweep B) under the same toggle.

Usage: python benchmarks/expt_merged_ab.py [--rounds 4] [--sweep 16]
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
    ap.add_argument("--precondition", default="rline")
    ap.add_argument("--rtol", type=float, default=1e-4)
    ap.add_argument("--f64-refine", type=int, default=1)
    ap.add_argument("--sweep", type=int, default=0,
                    help="also A/B the batched sweep engine at this batch")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import heatflow_tpu.ops.pallas_cg as pc
    from bench import build_flagship
    from heatflow_tpu.sim.stepper import make_simulate_fn

    problem = build_flagship()
    variants = [("merged", True), ("standard", False)]
    fns = {}
    for i, (name, flag) in enumerate(variants):
        pc.MERGED_DEFAULT = flag
        fns[name] = make_simulate_fn(
            problem, dtype=jnp.float32, rtol=args.rtol, maxiter=8000 + i,
            record_gradient=False, rtol_wrt="r0", solver="auto",
            precondition=args.precondition, warm_start="extrapolate",
            f64_refine=args.f64_refine)
        t0 = time.time()
        ys = fns[name]()
        ys["final_u"].block_until_ready()
        print(f"# {name}: compile+run {time.time()-t0:.1f}s, iters mean "
              f"{float(np.asarray(ys['cg_iters']).mean()):.2f} max "
              f"{int(np.asarray(ys['cg_iters']).max())}, watch_final "
              f"{np.asarray(ys['watch'])[-1].tolist()}", file=sys.stderr)

    results = {n: [] for n, _ in variants}
    iters = {}
    for _r in range(args.rounds):
        for name, _ in variants:        # interleave: relay drift cancels
            t0 = time.time()
            ys = fns[name]()
            ys["final_u"].block_until_ready()
            results[name].append(time.time() - t0)
            iters[name] = float(np.asarray(ys["cg_iters"]).mean())

    out = {n: {
        "steps_per_sec_best": round(problem.num_steps / min(ts), 1),
        "steps_per_sec_mean": round(problem.num_steps
                                    / (sum(ts) / len(ts)), 1),
        "runs_s": [round(t, 4) for t in ts],
        "iters_mean": round(iters[n], 2),
    } for n, ts in results.items()}

    if args.sweep:
        from heatflow_tpu.sim.sweepkernel import make_sweep_fn
        B = args.sweep
        ks = np.linspace(2.0, 20.0, B)
        fs = np.full(B, problem.fwhm)
        sfns = {}
        for i, (name, flag) in enumerate(variants):
            pc.MERGED_DEFAULT = flag
            sfns[name] = make_sweep_fn(
                problem, dtype=jnp.float32, rtol=1e-4, maxiter=4000 + i,
                solver="vmem", precondition="rline", rtol_wrt="r0",
                warm_start="extrapolate")
            tr = sfns[name](ks, fs)
            tr.block_until_ready()
        sres = {n: [] for n, _ in variants}
        for _r in range(args.rounds):
            for name, _ in variants:
                t0 = time.time()
                tr = sfns[name](ks, fs)
                tr.block_until_ready()
                sres[name].append(time.time() - t0)
        for n, ts in sres.items():
            out[n]["sweep_cfgs_per_sec_best"] = round(B / min(ts), 2)
            out[n]["sweep_runs_s"] = [round(t, 3) for t in ts]

    sp_m = out["merged"]["steps_per_sec_best"]
    sp_s = out["standard"]["steps_per_sec_best"]
    out["merged_gain_pct"] = round(100.0 * (sp_m / sp_s - 1.0), 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
