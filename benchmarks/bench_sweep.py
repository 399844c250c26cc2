#!/usr/bin/env python
"""Plain (trace-only) sweep throughput + accuracy — the reproduction script
for BENCHMARKS.md's "Sweeps: concurrent transient solves per chip" and
"Increment-relative sweep stopping" tables.

Protocol (unchanged across rounds): geballe_no_diamond mesh (243x1001 =
243,243 nodes), B kappa log-spaced in [1, 100] W/m/K (deliberately
ill-conditioned), the config's full 40-step transients, f32, time-chunked
(--step-chunk 25) through the public run_sweep_time_chunked API; the fn
makers are memoized, so repeated calls time the engine, not re-tracing.
Accuracy = worst-lane / median of max|trace diff| per lane vs the
rtol-1e-7 (wrt b) converged VMEM reference.

Rows: a comma-separated --rows list of
  fixed120          vmem, fixed 120 iters/step
  b:RTOL            vmem tolerance, wrt ||b||      (e.g. b:1e-5)
  r0:RTOL           vmem tolerance, wrt ||r0||     (e.g. r0:1e-5)
  refineN:RTOL      vmem f64_refine=N, inner RTOL, extrapolated seed
  xla-b:RTOL        XLA engine, wrt ||b||
Any row accepts a trailing +PRECOND (e.g. r0:1e-5+rline, r0:1e-4+adi) to
switch the preconditioner from the jacobi default.

Usage: python benchmarks/bench_sweep.py [--batch 64]
         [--rows fixed120,b:1e-5,r0:1e-4,r0:1e-5] [--no-ref] [--reps 3]
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--rows", default="fixed120,b:1e-5,r0:1e-4,r0:1e-5")
    ap.add_argument("--step-chunk", type=int, default=25)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-ref", action="store_true",
                    help="skip the rtol-1e-7 reference (timing only)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_enable_x64", True)   # for the refine rows
    import jax.numpy as jnp

    from heatflow_tpu.config import load_config
    from heatflow_tpu.geometry import build_layout, coupler_watcher_points
    from heatflow_tpu.mesh.structured import build_structured_mesh
    from heatflow_tpu.sim.bc import HeatingCurve
    from heatflow_tpu.sim.problem import build_problem
    from heatflow_tpu.sim.sweepkernel import run_sweep_time_chunked

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
    ks = np.logspace(0.0, 2.0, B)                     # kappa in [1, 100]
    fs = np.full(B, float(cfg["heating"]["fwhm"]))

    def run(label, **kw):
        t0 = time.time()
        tr = np.asarray(run_sweep_time_chunked(
            problem, ks, fs, step_chunk=args.step_chunk, **kw))
        cold = time.time() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            tr = np.asarray(run_sweep_time_chunked(
                problem, ks, fs, step_chunk=args.step_chunk, **kw))
            times.append(time.time() - t0)
        warm = min(times)
        res = {"configs_per_sec": round(B / warm, 2),
               "warm_s": round(warm, 3), "cold_s": round(cold, 1),
               "finite": bool(np.isfinite(tr).all())}
        print(f"# {label}: {res}", file=sys.stderr)
        return res, tr

    ref = None
    if not args.no_ref:
        _, ref = run("reference vmem tol 1e-7 wrt b",
                     solver="vmem", rtol=1e-7, maxiter=20000,
                     dtype=jnp.float32)

    def parse_row(row):
        pre = "jacobi"
        if "+" in row:
            # split on the LAST '+' so an rtol with an explicit positive
            # exponent (b:1e+3) is not mis-split into 'b:1e' + precond '3'
            head, tail = row.rsplit("+", 1)   # e.g. r0:1e-4+adi
            if tail.isalpha():
                if tail not in ("rline", "adi", "adaptive", "mg", "zline",
                                "jacobi"):
                    raise SystemExit(
                        f"unknown preconditioner suffix {tail!r} in row "
                        f"{row!r} (known: rline, adi, adaptive, mg, "
                        "zline, jacobi)")
                row, pre = head, tail
            # else: the '+' is part of the rtol (e.g. b:1e+3) — no split
        if row == "fixed120":
            return row + ("" if pre == "jacobi" else f"+{pre}"), dict(
                solver="vmem", fixed_iters=120, precondition=pre)
        kind, rtol_s = row.split(":")
        rtol = float(rtol_s)
        if kind == "b":
            kw = dict(solver="vmem", rtol=rtol)
        elif kind == "r0":
            kw = dict(solver="vmem", rtol=rtol, rtol_wrt="r0")
        elif kind == "xla-b":
            kw = dict(solver="xla", rtol=rtol)
        elif kind.startswith("refine"):
            kw = dict(solver="vmem", rtol=rtol, f64_refine=int(kind[6:]),
                      warm_start="extrapolate")
        else:
            raise SystemExit(f"unknown row kind {kind!r}")
        kw["precondition"] = pre
        label = row + ("" if pre == "jacobi" else f"+{pre}")
        return label, kw

    report = {}
    for row in args.rows.split(","):
        label, kw = parse_row(row.strip())
        res, tr = run(label, dtype=jnp.float32, **kw)
        if ref is not None and tr.shape == ref.shape:
            per_lane = np.abs(tr - ref).reshape(B, -1).max(axis=1)
            res["worst_lane_K"] = round(float(per_lane.max()), 3)
            res["median_lane_K"] = round(float(np.median(per_lane)), 3)
        report[label] = res

    print(json.dumps({"protocol": f"B={B} sweep, {problem.num_steps} steps,"
                                  f" 243k nodes, f32, chunked "
                                  f"{args.step_chunk}",
                      "rows": report}))


if __name__ == "__main__":
    main()
