#!/usr/bin/env python
"""Gradient-based experimental fit: reproduction script for the headline
fit numbers (BENCHMARKS.md "End-to-end science workflows").

The reference's whole fitting story is brute-force grid scans minimizing
the normalized o-side RMSE (ref sweep_test.py:96-115,
analysis_utils.py:66-93). This repo's fit (drivers/fit.py) is a coarse
vmapped sweep + Adam refinement through the implicit-diff solve — and as
of round 4 its refinement runs on the fast engines too
(make_sweep_fn(solver='vmem').one_config -> pallas_cg.cg_vmem_solve, the
rline-preconditioned VMEM kernel inside custom_linear_solve).

Protocol: geballe_no_diamond_read_flux (real Geballe heating + o-side
data), flagship mesh, (kappa, FWHM) free over the default search box.
Two engines, same fit settings otherwise:

  fast — f32 defaults (resolve_fit_solver: rtol 1e-5 wrt r0; as of
         round 5 'auto' resolves to the VMEM rline engine on TPU when
         the problem fits — measured fastest in every fit phase,
         expt_fit_engines_r5.py) — what
         `python -m heatflow_tpu.drivers.fit` runs
  xla  — the round-3 path: f32 XLA solver, jacobi, same rtol/rtol_wrt
         (the converging variant of the old default; the old rtol=1e-10
         wrt 'b' literally grinds every solve to maxiter=20000)

Reports per engine: wall s (coarse sweep / Adam / total), best RMSE,
(k, FWHM), and the speedup ratio. Device calls stay bounded (chunked
coarse sweep, one Adam step per call) for the ~60 s TPU relay limit.

Usage: python benchmarks/bench_fit.py [--adam-steps 30] [--skip-xla]
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
    ap.add_argument("--config", default="cfgs/geballe_no_diamond_read_flux.yaml")
    ap.add_argument("--adam-steps", type=int, default=30)
    ap.add_argument("--coarse", type=int, nargs=2, default=[8, 6])
    ap.add_argument("--n-starts", type=int, default=2)
    ap.add_argument("--skip-xla", action="store_true",
                    help="only run the fast engine")
    ap.add_argument("--size-scale", type=float, default=1.0,
                    help="mesh coarsening factor (1.0 = flagship)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from heatflow_tpu.config import load_config
    from heatflow_tpu.drivers.fit import fit_parameters
    from heatflow_tpu.geometry import build_layout, coupler_watcher_points
    from heatflow_tpu.mesh.structured import build_structured_mesh
    from heatflow_tpu.sim.bc import HeatingCurve
    from heatflow_tpu.sim.problem import build_problem

    cfg = load_config(os.path.join(ROOT, args.config))
    cfg["heating"]["file"] = os.path.join(ROOT, cfg["heating"]["file"])
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats, size_scale=args.size_scale)
    heating = HeatingCurve.from_csv(cfg["heating"]["file"])
    problem = build_problem(mesh, heating, cfg,
                            watcher_points=coupler_watcher_points(cfg))
    nz, nr = mesh.shape
    print(f"# mesh {nz}x{nr} = {mesh.num_nodes} nodes, "
          f"{problem.num_steps} steps, backend {jax.default_backend()}",
          file=sys.stderr)

    def run(label, **kw):
        t0 = time.time()
        res = fit_parameters(problem, coarse=tuple(args.coarse),
                             n_starts=args.n_starts,
                             adam_steps=args.adam_steps,
                             dtype=jnp.float32, uncertainty=False,
                             verbose=True, **kw)
        wall = time.time() - t0
        out = {"engine": label, "wall_s": round(wall, 1),
               "rmse": round(res.rmse, 6), "k": round(res.k, 4),
               "fwhm": float(f"{res.fwhm:.4e}")}
        print(f"# {label}: {out}", file=sys.stderr)
        return out

    rows = []
    # defaults: the measured-fastest recipe (resolve_fit_solver — XLA
    # jacobi at the f32 converging stopping rule). The round-3 default
    # (rtol 1e-10 wrt 'b' at f32) is not a measurable comparator: every
    # solve grinds to maxiter=20000 and a single objective eval exceeds
    # the TPU relay limit.
    rows.append(run("defaults"))
    if not args.skip_xla:
        # the explicit engine variants, same stopping rule — kept for the
        # record (BENCHMARKS.md "gradient-based fit engines" explains why
        # the vmapped multi-start recipe inverts their single-trajectory
        # ranking)
        rows.append(run("xla-rline", solver="xla", precondition="rline"))
        rows.append(run("vmem-rline", solver="vmem",
                        precondition="rline"))
        for r in rows[1:]:
            r["slowdown_vs_defaults"] = round(r["wall_s"]
                                              / rows[0]["wall_s"], 2)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
