#!/usr/bin/env python
"""In-process A/B: folded (2L+1) vs raw (L,3) PCR factor layout in the
rline-preconditioned VMEM CG kernel.

The cross-day bench.py comparison attributed +5.5% at the official point
to the fold; this pins the per-iteration cost difference directly with
the marginal-slope protocol (the same one used for the round-2 kernel
variants): run the kernel at rtol=0 (never converges) for two maxiter
values and take slope = (t2 - t1) / (m2 - m1), which cancels the relay's
per-call dispatch/fetch latency. The raw-layout kernel is loaded from the
pre-fold revision (git show <rev>:heatflow_tpu/ops/pallas_cg.py written
to --raw-module) so both run in one process on the identical operator.

Usage:
  git show 819daf8~1:heatflow_tpu/ops/pallas_cg.py > /tmp/pallas_cg_raw.py
  python benchmarks/expt_fold_ab.py --raw-module /tmp/pallas_cg_raw.py

Result (TPU v5e, 2026-08-18): the rtol=0 slope protocol is too noisy to
resolve the fold (two runs gave fold_speedup 0.96 and 1.03 — the ±4%
run-to-run spread exceeds the effect). The decisive measurement is a
same-day INTERLEAVED whole-bench A/B against a pre-fold worktree
(git worktree add /tmp/prefold 811b9bc; alternate `python bench.py`
between the two checkouts): folded 547.8-556.6 steps/s (mean 552.0,
4 reps) vs raw 532.9-547.0 (mean 540.9, 6 reps, one 494 outlier
dropped) — the fold is worth ~+2% at the official point, NOT the +5.5%
a cross-day comparison suggested (day-to-day relay drift is ±3-5%,
larger than the effect). Recorded in BENCHMARKS.md.
"""

import argparse
import importlib.util
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw-module", default="/tmp/pallas_cg_raw.py")
    ap.add_argument("--iters", default="400,1600")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from bench import build_flagship
    from heatflow_tpu.ops import pallas_cg as folded
    from heatflow_tpu.ops.stencil import combine_operator

    raw = _load(args.raw_module, "pallas_cg_raw")

    problem = build_flagship()
    dev = problem.device_arrays(jnp.float32)
    A, _ = combine_operator(dev["K"], dev["M"], dev["kappas"],
                            dev["rho_cvs"], jnp.asarray(problem.dt,
                                                        jnp.float32))
    free, dirich = dev["free"], dev["dirichlet"]
    s = jax.lax.rsqrt(jnp.where(A[0] > 0, A[0], 1.0)) * free + dirich
    sm = (s * free).astype(jnp.float32)
    rng = np.random.default_rng(0)
    b = (jnp.asarray(rng.standard_normal(free.shape), jnp.float32)
         * free)
    x0 = jnp.zeros_like(b)

    m1, m2 = (int(v) for v in args.iters.split(","))
    out = {}
    for tag, mod, pcr in (
            ("folded", folded, folded.pcr_pack(A, s, free)),
            ("raw", raw, raw.pcr_pack(A, s, free))):
        f = jax.jit(lambda bb, p, m=mod, mi=m2: m.cg_vmem_tol(
            A, sm, bb, x0, rtol=0.0, maxiter=mi, pcr=p)[0])
        f1 = jax.jit(lambda bb, p, m=mod, mi=m1: m.cg_vmem_tol(
            A, sm, bb, x0, rtol=0.0, maxiter=mi, pcr=p)[0])
        f(b, pcr).block_until_ready()   # compile
        f1(b, pcr).block_until_ready()
        best1 = best2 = np.inf
        for _ in range(args.reps):
            t0 = time.time(); f1(b, pcr).block_until_ready()
            best1 = min(best1, time.time() - t0)
            t0 = time.time(); f(b, pcr).block_until_ready()
            best2 = min(best2, time.time() - t0)
        slope = (best2 - best1) / (m2 - m1) * 1e6
        out[tag] = {"t_m1_s": round(best1, 4), "t_m2_s": round(best2, 4),
                    "us_per_iter": round(slope, 3)}
    out["fold_speedup"] = round(
        out["raw"]["us_per_iter"] / out["folded"]["us_per_iter"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
