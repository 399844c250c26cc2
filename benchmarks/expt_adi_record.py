#!/usr/bin/env python
"""Interleaved flagship RECORDING A/B: precondition='rline' vs 'adi' with
the per-step gradient projection on (the run2d --record-gradient single-run
regime: f32, wrt-r0, extrapolate, solver=auto).

Artifact accuracy matters here: at f32, unconverged solve error lives in
the near-axis radial modes the gradient CSVs amplify ~1/h_r (the round-3
finding that made rline the recording default over jacobi). This script
reports watcher/band/raw-axis max errors vs a cached f64 rtol-1e-11
recording reference alongside speed, so a default switch is justified on
BOTH axes or not at all.

Usage: python benchmarks/expt_adi_record.py [--rtol 1e-4] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TRUTH = os.path.join(ROOT, "benchmarks", ".flagship_truth_recording.npz")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rtol", type=float, default=1e-4)
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

    if os.path.exists(TRUTH):
        t = np.load(TRUTH)
        truth = {k: t[k] for k in ("watch", "band", "axis")}
        print("# recording truth loaded from cache", file=sys.stderr)
    else:
        t0 = time.time()
        r = make_simulate_fn(problem, dtype=jnp.float64, rtol=1e-11,
                             record_gradient=True)()
        truth = {k: np.asarray(r[k]) for k in ("watch", "band", "axis")}
        np.savez(TRUTH, **truth)
        print(f"# recording truth built in {time.time()-t0:.0f}s",
              file=sys.stderr)

    kw = dict(dtype=jnp.float32, rtol=args.rtol, solver="auto",
              warm_start="extrapolate", record_gradient=True,
              rtol_wrt="r0")
    fns = {p: make_simulate_fn(problem, precondition=p, **kw)
           for p in ("rline", "adi")}

    out = {}
    res = {}
    for name, fn in fns.items():
        t0 = time.time()
        res[name] = jax.block_until_ready(fn())
        out[name] = {"cold_s": round(time.time() - t0, 1), "times": []}
    for _ in range(args.reps):
        for name, fn in fns.items():
            t0 = time.time()
            r = jax.block_until_ready(fn())
            out[name]["times"].append(round(time.time() - t0, 4))
            res[name] = r
    for name, r in res.items():
        o = out[name]
        o["steps_per_sec"] = round(steps / min(o["times"]), 1)
        o["cg_iters_mean"] = round(float(np.asarray(r["cg_iters"]).mean()),
                                   1)
        o["proj_iters_mean"] = round(
            float(np.asarray(r["proj_iters"]).mean()), 1)
        for k, scale in (("watch", 1.0), ("band", 1.0), ("axis", 1.0)):
            a = np.asarray(r[k])
            o[f"{k}_err"] = float(np.abs(a - truth[k]).max())
            o[f"{k}_finite"] = bool(np.isfinite(a).all())
    print(json.dumps({"protocol": f"flagship recording f32 wrt-r0 "
                                  f"rtol={args.rtol:g} extrapolate "
                                  f"solver=auto, interleaved best-of-"
                                  f"{args.reps}; errors vs f64 1e-11",
                      "rows": out}))


if __name__ == "__main__":
    main()
