#!/usr/bin/env python
"""Recording (artifact-parity) sweep throughput + accuracy: XLA vs VMEM engines.

The reference's sweep workers each produce the complete artifact set —
watcher traces plus the two radial-gradient CSVs — per config
(ref parameter_sweep.py:157-166 -> run_no_diamond.py:602-617). This repo's
equivalent is make_sweep_fn_recording(...): the full stepper (backward-Euler
solve + per-step r-weighted gradient projection) vmapped over configs.

Protocol: geballe_no_diamond mesh (243x1001 = 243,243 nodes), B kappa
log-spaced in [2, 20] W/m/K, full 40-step transients, f32, warm timings
(best of --reps calls of the memoized fn). Engines at each rtol in --rtols:

  xla          — make_sweep_fn_recording(solver='xla')
  vmem         — solver='vmem', precondition='jacobi'
  vmem-rline   — solver='vmem', precondition='rline'

Accuracy: every artifact family is compared against a mixed-precision
reference (solver='vmem', f64_refine=2, inner rtol 1e-4 — the
f64-indistinguishable mode, BENCHMARKS.md) as max|diff| / range(ref),
so engine-vs-engine gaps can be attributed to solve tolerance.

Usage: python benchmarks/bench_recording.py [--batch 8] [--rtols 1e-4,1e-5]
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--rtols", default="1e-4,1e-5")
    ap.add_argument("--rtol-wrt", default="b", choices=["b", "r0"])
    ap.add_argument("--warm-start", default="previous",
                    choices=["previous", "extrapolate"])
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--no-ref", action="store_true",
                    help="skip the f64_refine reference (timing only)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_enable_x64", True)   # for the refined reference
    import jax.numpy as jnp

    from heatflow_tpu.config import load_config
    from heatflow_tpu.geometry import build_layout, coupler_watcher_points
    from heatflow_tpu.mesh.structured import build_structured_mesh
    from heatflow_tpu.sim.bc import HeatingCurve
    from heatflow_tpu.sim.problem import build_problem
    from heatflow_tpu.sim.sweepkernel import make_sweep_fn_recording

    cfg = load_config(os.path.join(ROOT, "cfgs", "geballe_no_diamond.yaml"))
    cfg["heating"]["file"] = os.path.join(
        ROOT, "experimental_data", "geballe_heat_data.csv")
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    heating = HeatingCurve.from_csv(cfg["heating"]["file"])
    problem = build_problem(mesh, heating, cfg,
                            watcher_points=coupler_watcher_points(cfg))
    print(f"# mesh {mesh.shape} = {mesh.num_nodes} nodes, "
          f"{problem.num_steps} steps", file=sys.stderr)

    B = args.batch
    ks = np.logspace(np.log10(2.0), np.log10(20.0), B)
    fs = np.full(B, float(cfg["heating"]["fwhm"]))
    fams = ("watch", "band", "axis")

    def run(label, **kw):
        fn = make_sweep_fn_recording(problem, dtype=jnp.float32,
                                     warm_start=args.warm_start, **kw)
        t0 = time.time()
        ys = fn(ks, fs)
        jax.block_until_ready(ys["watch"])
        cold = time.time() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            ys = fn(ks, fs)
            jax.block_until_ready(ys["watch"])
            times.append(time.time() - t0)
        warm = min(times)
        out = {k: np.asarray(ys[k]) for k in fams}
        finite = bool(all(np.isfinite(out[k]).all() for k in fams))
        res = {"configs_per_sec": round(B / warm, 2), "warm_s": round(warm, 3),
               "cold_s": round(cold, 1), "finite": finite}
        print(f"# {label}: {res}", file=sys.stderr)
        return res, out

    ref_art = None
    if not args.no_ref:
        _, ref_art = run("reference f64_refine=2 @1e-4",
                         solver="vmem", rtol=1e-4, f64_refine=2)

    specs = {
        "xla": dict(solver="xla"),
        "vmem": dict(solver="vmem", precondition="jacobi"),
        "vmem-rline": dict(solver="vmem", precondition="rline"),
    }
    report = {}
    wrt = {} if args.rtol_wrt == "b" else {"rtol_wrt": args.rtol_wrt}
    for rtol in [float(s) for s in args.rtols.split(",")]:
        for name, spec in specs.items():
            res, art = run(f"{name} @{rtol:g} wrt {args.rtol_wrt}",
                           rtol=rtol, **wrt, **spec)
            if ref_art is not None:
                res["err_vs_ref"] = {
                    k: round(float(np.abs(art[k] - ref_art[k]).max())
                             / (float(ref_art[k].max() - ref_art[k].min()) or 1.0), 6)
                    for k in fams}
            report[f"{name}@{rtol:g}"] = res

    print(json.dumps({"protocol": f"B={B} recording sweep, 40 steps, "
                                  f"243k nodes, f32",
                      "engines": report}))


if __name__ == "__main__":
    main()
