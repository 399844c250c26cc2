#!/usr/bin/env python
"""Round-5 fit-engine re-A/B after two changes invalidated the round-4
default rationale (VERDICT r4 items 3 and 4):

1. The scoped-VMEM compile failure that blocked reverse mode through the
   VMEM kernel is fixed (optimization_barrier in cg_vmem_solve) — the
   "measured-2.1x-faster" rline engine is now usable for gradients.
2. The batched-vmem cross-process cache miss does NOT reproduce: the
   flagship coarse program was verified to hit the persistent cache from
   a fresh process (36 s compile -> cross-process hit, round-5 probes).

This script re-measures the three fit phases on the read_flux flagship
point, interleaved in one process (relay drift cancels):

  A. coarse batch (8 cfgs, warm):       xla+jacobi vs vmem+rline
  B. vmapped 3-start Adam step (warm):  xla+jacobi vs vmem+rline
  C. Gauss-Newton linearize (1 theta):  xla+jacobi vs vmem+rline

Timing uses a host fetch per call (np.asarray of the result) AND a
fresh (perturbed) operand per rep — the roofline round's findings that
block_until_ready alone returns before execution under the axon plugin
and that the loopback relay can serve repeated identical
(program, input) calls from a result cache. (The original round-5
measurements repeated identical inputs; re-measured with perturbed
inputs the numbers reproduce — the 0.3-1.0 s phase times were real
executions, not cache hits.)

Usage: python benchmarks/expt_fit_engines_r5.py [--reps 3]
"""

import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--adam-steps", type=int, default=5)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import optax

    from heatflow_tpu.config import load_config
    from heatflow_tpu.drivers.fit import experimental_objective
    from heatflow_tpu.geometry import build_layout, coupler_watcher_points
    from heatflow_tpu.mesh.structured import build_structured_mesh
    from heatflow_tpu.sim.bc import HeatingCurve
    from heatflow_tpu.sim.problem import build_problem

    cfg = load_config(os.path.join(ROOT, "cfgs",
                                   "geballe_no_diamond_read_flux.yaml"))
    cfg["heating"]["file"] = os.path.join(ROOT, "experimental_data",
                                          "geballe_heat_data.csv")
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    heating = HeatingCurve.from_csv(cfg["heating"]["file"])
    problem = build_problem(mesh, heating, cfg,
                            watcher_points=coupler_watcher_points(cfg))

    engines = {
        "xla+jacobi": dict(solver="xla", precondition="jacobi"),
        "vmem+rline": dict(solver="vmem", precondition="rline"),
    }
    objs = {name: experimental_objective(
        problem, dtype=jnp.float32, rtol=1e-5, rtol_wrt="r0",
        maxiter=20000, **kw) for name, kw in engines.items()}

    ks8 = jnp.asarray(np.linspace(3.0, 4.0, 8), jnp.float32)
    fs8 = jnp.asarray(np.full(8, 1.26e-5), jnp.float32)
    theta = jnp.asarray([3.5, 1.26e-5], jnp.float32)

    def force(x):
        return np.asarray(x)

    def timeit(f, reps):
        """f(eps) must fold the scalar eps into its operands — a fresh
        value per rep defeats the relay's identical-call result cache."""
        f(0.0)       # warm/compile
        best = np.inf
        for i in range(reps):
            eps = 1e-6 * (i + 1)
            t0 = time.time()
            f(eps)
            best = min(best, time.time() - t0)
        return best

    report = {}

    # --- A: coarse batch ------------------------------------------------
    for name, obj in objs.items():
        t = timeit(lambda eps: force(obj.batch(ks8 + eps, fs8)),
                   args.reps)
        report[f"coarse8_{name}_s"] = t
        print(f"# coarse 8 cfgs  {name:11s}: {t:6.3f} s warm", flush=True)

    # --- B: vmapped 3-start Adam step ----------------------------------
    for name, obj in objs.items():
        opt = optax.adam(0.05)
        lo_k, hi_k = np.log(1.0), np.log(100.0)

        def loss(params):
            return obj(jnp.exp(jnp.clip(params[0], lo_k, hi_k)),
                       jnp.exp(params[1]))

        grad_fn = jax.value_and_grad(loss)

        @jax.jit
        def adam_step(params, state):
            def one(p, s):
                v, g = grad_fn(p)
                updates, s = opt.update(g, s)
                return optax.apply_updates(p, updates), s, v
            return jax.vmap(one)(params, state)

        params = jnp.log(jnp.asarray([[3.2, 1.2e-5], [3.5, 1.3e-5],
                                      [3.8, 1.25e-5]], jnp.float32))
        state = jax.vmap(opt.init)(params)

        def run_steps(eps):
            p, s = params + eps, state
            v = None
            for _ in range(args.adam_steps):
                p, s, v = adam_step(p, s)
            return force(v)

        t = timeit(run_steps, args.reps) / args.adam_steps
        report[f"adam_step_{name}_s"] = t
        print(f"# adam step (3 starts) {name:11s}: {t:6.3f} s/step warm",
              flush=True)

    # --- C: Gauss-Newton linearize -------------------------------------
    for name, obj in objs.items():
        res_fn = lambda th: obj.residuals(th[0], th[1])

        @jax.jit
        def rJ_fn(th):
            r, jvp = jax.linearize(res_fn, th)
            J = jax.vmap(jvp)(jnp.eye(2, dtype=jnp.float32))
            return r, J.T

        t = timeit(lambda eps: force(rJ_fn(theta + eps)[1]), args.reps)
        report[f"gn_linearize_{name}_s"] = t
        print(f"# GN linearize  {name:11s}: {t:6.3f} s warm", flush=True)

    import json
    print(json.dumps({k: round(v, 4) for k, v in report.items()}))


if __name__ == "__main__":
    main()
