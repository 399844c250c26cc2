#!/usr/bin/env python
"""Diagnose the f32 recording-sweep raw-axis artifact: projection-solve
convergence per engine, and a second independent reference.

bench_recording.py found the r=0 raw-axis gradient artifact from
jacobi-preconditioned f32 recording engines sits 20-300x the reference
range away from the f64_refine=2 reference, while precondition='rline'
agrees with it. Two candidate mechanisms: (a) the r-weighted projection
system's axis rows are radially ill-conditioned and jacobi CG stalls on
them within proj_maxiter=400; (b) solve-error amplification ~1/h_r at the
axis. This script separates them: projection iteration counts + residuals
per engine, plus a refine2+rline reference to confirm the refine2+jacobi
reference is itself converged (two independent algorithms agreeing).
"""

import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from heatflow_tpu.config import load_config
    from heatflow_tpu.geometry import build_layout, coupler_watcher_points
    from heatflow_tpu.mesh.structured import build_structured_mesh
    from heatflow_tpu.sim.bc import HeatingCurve
    from heatflow_tpu.sim.problem import build_problem
    from heatflow_tpu.sim.stepper import make_simulate_fn
    from heatflow_tpu.sim.sweepkernel import make_sweep_fn_recording

    cfg = load_config(os.path.join(ROOT, "cfgs", "geballe_no_diamond.yaml"))
    cfg["heating"]["file"] = os.path.join(
        ROOT, "experimental_data", "geballe_heat_data.csv")
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    heating = HeatingCurve.from_csv(cfg["heating"]["file"])
    problem = build_problem(mesh, heating, cfg,
                            watcher_points=coupler_watcher_points(cfg))

    # single-config stepper at the sweep's kappa=2 corner: proj_iters stats
    for label, kw in [
        ("xla jacobi rtol 1e-4", dict(rtol=1e-4)),
        ("xla rline rtol 1e-4", dict(rtol=1e-4, precondition="rline")),
    ]:
        fn = make_simulate_fn(problem, dtype=jnp.float32, record_gradient=True,
                              solver="xla", **kw)
        ys = fn()
        pi = np.asarray(ys["proj_iters"]) if ys.get("proj_iters") is not None \
            else None
        ax = np.asarray(ys["axis"])
        print(f"# {label}: proj_iters mean/max = "
              f"{pi.mean():.0f}/{pi.max()}" if pi is not None else
              f"# {label}: no proj_iters", file=sys.stderr)
        print(f"#   axis artifact |max| {np.abs(ax).max():.3e}, "
              f"final-step range [{ax[-1].min():.3e}, {ax[-1].max():.3e}]",
              file=sys.stderr)

    # two independent refined references at B=2
    ks = np.array([2.0, 20.0])
    fs = np.full(2, float(cfg["heating"]["fwhm"]))
    arts = {}
    for name, spec in [("ref-jacobi", dict(solver="vmem", f64_refine=2)),
                       ("ref-rline", dict(solver="vmem", f64_refine=2,
                                          precondition="rline"))]:
        fn = make_sweep_fn_recording(problem, dtype=jnp.float32, rtol=1e-4,
                                     **spec)
        ys = fn(ks, fs)
        arts[name] = {k: np.asarray(ys[k]) for k in ("watch", "band", "axis")}
    out = {}
    for k in ("watch", "band", "axis"):
        a, b = arts["ref-jacobi"][k], arts["ref-rline"][k]
        rng = float(a.max() - a.min()) or 1.0
        out[k] = {"rel_of_range": round(float(np.abs(a - b).max()) / rng, 8),
                  "ref_range": rng}
    print(json.dumps({"ref_jacobi_vs_ref_rline": out}))


if __name__ == "__main__":
    main()
