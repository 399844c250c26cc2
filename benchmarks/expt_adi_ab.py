#!/usr/bin/env python
"""Interleaved flagship A/B: precondition='rline' vs 'adi' (split-additive
r-line + z-line) in one process so relay drift cancels.

Two operating points per run:
  --refine 1 --rtol 1e-4   the official recipe (vmem + extrapolate + refine1)
  --refine 0 --rtol 1e-4   the pure-f32 rline point (wrt-r0)

Prints one JSON line with per-engine best-of times, steps/s, mean CG
iterations, and (if the cached f64 truth exists) full-trace o-side peak
error. CPU-probe context (expt_adi_probe.py): the warm-started transient
regime cuts iterations 1.33x (60-step mean; tail 1.19x) for split-additive
ADI vs rline — against ~1.4x per-iteration cost, so this A/B decides
whether the kernel's real cost ratio lets it pay at the official point.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rtol", type=float, default=1e-4)
    ap.add_argument("--refine", type=int, default=1)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from heatflow_tpu.config import load_config
    from heatflow_tpu.geometry import build_layout, coupler_watcher_points
    from heatflow_tpu.mesh.structured import build_structured_mesh
    from heatflow_tpu.sim.bc import HeatingCurve
    from heatflow_tpu.sim.problem import build_problem
    from heatflow_tpu.sim.stepper import make_simulate_fn

    cfg = load_config(os.path.join(ROOT, "cfgs",
                                   "geballe_with_diamond.yaml"))
    cfg["heating"]["file"] = os.path.join(ROOT, "experimental_data",
                                          "geballe_heat_data.csv")
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    heating = HeatingCurve.from_csv(cfg["heating"]["file"])
    problem = build_problem(mesh, heating, cfg,
                            watcher_points=coupler_watcher_points(cfg))
    steps = problem.num_steps
    print(f"# mesh {mesh.shape}, {steps} steps", file=sys.stderr)

    kw = dict(dtype=jnp.float32, rtol=args.rtol, solver="auto",
              warm_start="extrapolate", record_gradient=False)
    if args.refine:
        kw["f64_refine"] = args.refine
    else:
        kw["rtol_wrt"] = "r0"

    fns = {p: make_simulate_fn(problem, precondition=p, **kw)
           for p in ("rline", "adi")}

    truth = None
    if os.path.exists(TRUTH):
        truth = np.load(TRUTH)["watch"]

    out = {}
    res = {}
    for name, fn in fns.items():
        t0 = time.time()
        res[name] = jax.block_until_ready(fn())
        out[name] = {"cold_s": round(time.time() - t0, 1), "times": []}
    for _ in range(args.reps):                       # interleave A/B/A/B
        for name, fn in fns.items():
            t0 = time.time()
            r = jax.block_until_ready(fn())
            out[name]["times"].append(round(time.time() - t0, 4))
            res[name] = r
    for name, r in res.items():
        best = min(out[name]["times"])
        o = out[name]
        o["steps_per_sec"] = round(steps / best, 1)
        o["cg_iters_mean"] = round(float(np.asarray(r["cg_iters"]).mean()),
                                   1)
        w = np.asarray(r["watch"])
        o["finite"] = bool(np.isfinite(w).all())
        if truth is not None and truth.shape == w.shape:
            o["opeak_K"] = round(float(np.abs(w - truth)[:, 1].max()), 4)
    print(json.dumps({"protocol": f"flagship refine={args.refine} "
                                  f"rtol={args.rtol:g} ws=extrapolate "
                                  f"solver=auto, interleaved best-of-"
                                  f"{args.reps}",
                      "rows": out}))


if __name__ == "__main__":
    main()
