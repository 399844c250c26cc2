#!/usr/bin/env python
"""Driver-level sweep throughput: what `run_parameter_sweep` actually
sustains, including config handling, problem reuse, device calls and CSV
artifact writes — vs the bare engine rate (benchmarks/bench_recording.py).

Round-3 gap: the production driver measured 0.72 cfg/s at B=8 and 6.5 at
B=32 against the engine's 38.6 — a fixed ~3 s/invocation of host-side
.msh parse + problem assembly + jit retrace, because every invocation
rebuilt the Problem2D (emptying the makers' memoization with it). Round 4
added the width-group LRU cache (drivers/sweep.py _GROUP_CACHE), so warm
invocations reuse the problem AND its compiled fns; this script measures
cold and warm driver rates at several batch sizes.

Protocol: geballe_no_diamond mesh, single width group, k log-spaced,
--record-gradient (the full artifact path: every run writes
watcher_points.csv + both radial-gradient CSVs + used_config.yaml).
Each batch size runs the driver twice into fresh output dirs — the first
is cold (build + compile), the second warm (cache hits end-to-end).

Usage: python benchmarks/bench_driver_sweep.py [--batches 8,32] [--plain]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,32")
    ap.add_argument("--plain", action="store_true",
                    help="watcher-only sweeps (no gradient recording)")
    ap.add_argument("--rtol", type=float, default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from heatflow_tpu.config import load_config
    from heatflow_tpu.drivers.sweep import run_parameter_sweep

    cfg_path = os.path.join(ROOT, "cfgs", "geballe_no_diamond.yaml")
    cfg = load_config(cfg_path)
    cfg["heating"]["file"] = os.path.join(ROOT, cfg["heating"]["file"])
    width = float(cfg["mats"]["p_sample"]["z"])

    work = tempfile.mkdtemp(prefix="bench_driver_sweep_")
    mesh_dir = os.path.join(work, "meshes")
    record = not args.plain
    rows = {}
    try:
        for B in [int(s) for s in args.batches.split(",")]:
            times = []
            for rep in range(2):            # cold, then warm
                out = os.path.join(work, f"out_B{B}_rep{rep}")
                t0 = time.time()
                results, failed = run_parameter_sweep(
                    cfg, out, (1.0e-5, 1.6e-5), (2.0, 20.0),
                    (width, width), (1, B, 1),
                    base_mesh_folder=mesh_dir, suppress_print=True,
                    record_gradient=record, rtol=args.rtol)
                times.append(time.time() - t0)
                assert len(results) == B and not failed, (len(results),
                                                          len(failed))
            rows[B] = {"cold_s": round(times[0], 2),
                       "warm_s": round(times[1], 2),
                       "cold_cfgs_per_sec": round(B / times[0], 2),
                       "warm_cfgs_per_sec": round(B / times[1], 2)}
            print(f"# B={B}: {rows[B]}", file=sys.stderr)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"record_gradient": record, "rows": rows}))


if __name__ == "__main__":
    main()
