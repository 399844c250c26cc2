#!/usr/bin/env python
"""Roofline measurement for the VMEM CG kernel (ops/pallas_cg.py) at the
official flagship point (round-5 verdict item 1).

The perf story's hot path is the VMEM-resident preconditioned CG; this
script answers "how far from the chip's achievable bandwidth is it
actually running?" empirically, with four measurements on the REAL
flagship operator shape (251x1107 f32, ~1.11 MB/plane):

1. **Streaming speed-of-light**: a Pallas pass-kernel that performs the
   apply's multiply-add chain with NO shifts (read 7 coefficient planes +
   the operand, write the result) — the best elementwise-streaming rate
   the VPU+VMEM achieve on this shape. This is the honest roofline for a
   memory-bound stencil code (FLOP-MFU is meaningless here).
2. **Apply cost**: the same pass-kernel with the real 7-point `_apply7`
   (pad+slice) and with a roll-based variant — isolates what the
   neighbor shifts cost over pure streaming.
3. **PCR cost**: a pass-kernel applying the folded r-line PCR
   preconditioner (11 levels on Nr=1107), pad+slice vs `pltpu.roll` —
   the dominant per-iteration phase of the official rline/adi kernels
   (~8 of ~14.8 us/iter, round-3 numbers).
4. **Whole-iteration marginal slope** of the production `cg_vmem_tol`
   (plain / rline / adi) via chained dependent solves at two maxiter
   values (the round-2 marginal-slope protocol: slope removes the relay's
   per-call latency).

Every phase is reported as achieved GB/s against BOTH a minimum-traffic
model (each operand plane read once, each output written once — perfect
fusion) and the measured streaming SOL. vs_sol > ~85% means the phase is
at speed-of-light for this access pattern; less means slack.

Usage: python benchmarks/bench_roofline.py [--json out.json]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def build_operator():
    """Flagship f32 operator exactly as the official stepper builds it:
    (A, sm, pcr, pcr_z, b) on device."""
    import jax
    import jax.numpy as jnp
    from bench import build_flagship
    from heatflow_tpu.ops.pallas_cg import pcr_pack
    from heatflow_tpu.ops.stencil import combine_operator

    problem = build_flagship()
    dev = problem.device_arrays(jnp.float32)
    kp = jnp.asarray(problem.kappas, jnp.float32)
    rc = jnp.asarray(problem.rho_cvs, jnp.float32)
    A, M_op = combine_operator(dev["K"], dev["M"], kp, rc,
                               jnp.asarray(problem.dt, jnp.float32))
    free, dirich = dev["free"], dev["dirichlet"]
    diag = A[0]
    s = jax.lax.rsqrt(jnp.where(diag > 0, diag, 1.0)) * free + dirich
    sm = s * free
    pcr = pcr_pack(A, s, free)
    pcr_z = pcr_pack(A, s, free, axis=-2)
    # physical-ish rhs vanishing at constrained dofs
    from heatflow_tpu.ops.stencil import apply_stencil
    u0 = jnp.full(A.shape[1:], float(problem.ic_temp), jnp.float32)
    b = sm * apply_stencil(M_op, u0)
    return A, sm, pcr, pcr_z, b, problem


# ---------------------------------------------------------------- kernels
def _roll_shift_lane(v, d):
    """out[:, j] = v[:, j+d] via lane rotation, wrapped values masked."""
    import jax
    import jax.numpy as jnp
    nz, nr = v.shape
    rolled = _roll_shift_lane_nomask(v, d)
    j = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    mask = (j < nr - d) if d > 0 else (j >= -d)
    return jnp.where(mask, rolled, 0.0)


def _roll_shift_lane_nomask(v, d):
    # pltpu.roll requires a non-negative shift: out[j] = v[j - shift],
    # want v[j + d] -> shift = (-d) mod nr
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.roll(v, (-d) % v.shape[1], 1)


def _roll_shift_sublane_nomask(v, d):
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.roll(v, (-d) % v.shape[0], 0)


def _apply7_roll(C_ref, u):
    """_apply7 with roll+mask shifts instead of pad+slice."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    nz, nr = u.shape
    i = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
    j = jax.lax.broadcasted_iota(jnp.int32, u.shape, 1)

    def sh(di, dj):
        r = u
        if di:
            r = pltpu.roll(r, (-di) % nz, 0)
        if dj:
            r = pltpu.roll(r, (-dj) % nr, 1)
        m = jnp.ones((), jnp.bool_)
        if di > 0:
            m = m & (i < nz - di)
        elif di < 0:
            m = m & (i >= -di)
        if dj > 0:
            m = m & (j < nr - dj)
        elif dj < 0:
            m = m & (j >= -dj)
        return jnp.where(m, r, 0.0)

    out = C_ref[0] * u
    out += C_ref[1] * sh(1, 0)
    out += C_ref[2] * sh(-1, 0)
    out += C_ref[3] * sh(0, 1)
    out += C_ref[4] * sh(0, -1)
    out += C_ref[5] * sh(1, 1)
    out += C_ref[6] * sh(-1, -1)
    return out


def _pcr_roll(pcr_ref, rr, n_levels):
    """_pcr_precond with unmasked rolls: the folded factor planes are
    identically zero wherever the shifted operand is out-of-range (the
    zero-fill factorization preserves 'no coupling past the boundary'
    inductively), so wrapped values are annihilated exactly."""
    d = rr
    s = 1
    for k in range(n_levels):
        d = (d - pcr_ref[2 * k] * _roll_shift_lane_nomask(d, -s)
             - pcr_ref[2 * k + 1] * _roll_shift_lane_nomask(d, s))
        s *= 2
    return pcr_ref[2 * n_levels] * d


def make_pass_kernel(mode, passes, n_levels=0):
    """One pallas_call running ``passes`` dependent applications of the
    selected phase entirely in VMEM; marginal cost per pass = phase cost."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from heatflow_tpu.ops.pallas_cg import (VMEM_BUDGET, _apply7,
                                            _pcr_precond)

    def kernel(C_ref, u_ref, out_ref):
        u = u_ref[:]

        def one(k, u):
            if mode == "stream":
                out = C_ref[0] * u
                for i in range(1, 7):
                    out += C_ref[i] * u
            elif mode == "apply_pad":
                out = _apply7(C_ref, u)
            elif mode == "apply_roll":
                out = _apply7_roll(C_ref, u)
            elif mode == "pcr_pad":
                out = _pcr_precond(C_ref, u, n_levels)
            elif mode == "pcr_roll":
                out = _pcr_roll(C_ref, u, n_levels)
            elif mode == "pcr_pad_z":
                out = _pcr_precond(C_ref, u, n_levels, axis=-2)
            else:
                raise ValueError(mode)
            # keep magnitudes bounded across passes (free: constant mult)
            return out * 0.25

        out_ref[:] = jax.lax.fori_loop(0, passes, one, u)

    @jax.jit
    def run(C, u):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_BUDGET),
        )(C, u)

    return run


def time_best(f, reps=5):
    f()  # warm (compile)
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        f()
        best = min(best, time.time() - t0)
    return best


_RNG = np.random.default_rng(20250820)


def _force(x):
    """Force EXECUTION, not just dispatch: under the axon plugin
    block_until_ready() returns before the enqueued program has run
    (measured: block 0.1 ms, then a host fetch of the output waits 2.4 s
    for the actual execution). Fetching a device-reduced scalar to host
    is the only reliable completion fence; the 4-byte transfer adds one
    relay round-trip, which the two-point slope protocol subtracts."""
    import jax.numpy as jnp
    return float(jnp.sum(x * 0.0 + jnp.max(jnp.abs(x)) * 0.0 + jnp.sum(x)))


def _fresh_like(b):
    """A new random operand per timed call: the axon loopback relay can
    serve repeated identical (program, input) calls from a result cache,
    which reads as impossibly-fast kernels (measured round 5 — 0.1 ms for
    a 12000-pass kernel that takes 58 ms when fed fresh data)."""
    import jax.numpy as jnp
    u = jnp.asarray(_RNG.standard_normal(b.shape).astype(np.float32))
    return u.block_until_ready()


def slope_per_pass(mode, C, u, n_levels=0, p1=2000, p2=12000, reps=5):
    f1 = make_pass_kernel(mode, p1, n_levels)
    f2 = make_pass_kernel(mode, p2, n_levels)

    def timed(f):
        _force(f(C, u))                  # compile + execute
        best = np.inf
        for _ in range(reps):
            v = _fresh_like(u)
            t0 = time.time()
            _force(f(C, v))
            best = min(best, time.time() - t0)
        return best

    t1, t2 = timed(f1), timed(f2)
    if not t2 > t1:
        print(f"# WARNING {mode}: non-increasing times t{p1}={t1 * 1e3:.2f}"
              f"ms t{p2}={t2 * 1e3:.2f}ms (relay artifact?) — re-timing",
              file=sys.stderr)
        t1, t2 = timed(f1), timed(f2)
    return (t2 - t1) / (p2 - p1)


def cg_marginal_slope(variant, A, sm, b, pcr, pcr_z, m1=40, m2=440,
                      chain=8, reps=5):
    """Marginal per-iteration cost of the production tolerance kernel:
    chained dependent solves (one dispatch), slope over maxiter."""
    import jax
    import jax.numpy as jnp
    from heatflow_tpu.ops.pallas_cg import cg_vmem_tol

    kw = {}
    if variant in ("rline", "adi"):
        kw["pcr"] = pcr
    if variant == "adi":
        kw["pcr_z"] = pcr_z

    def make(maxiter):
        @jax.jit
        def run(b):
            x = jnp.zeros_like(b)
            tot = jnp.zeros((), jnp.int32)
            for _ in range(chain):
                x, it = cg_vmem_tol(A, sm, b + 0.0 * x, 0.0 * x,
                                    1e-30, maxiter=maxiter,
                                    rtol_wrt="b", **kw)
                tot = tot + it
            return x, tot

        return run

    f1, f2 = make(m1), make(m2)
    # verify the solves actually ran to maxiter (not converged early)
    _x, it1 = f1(b)
    _x, it2 = f2(b)
    assert int(it1) == chain * m1 and int(it2) == chain * m2, \
        (int(it1), int(it2))
    mask = (sm != 0).astype(b.dtype)

    def timed(f):
        best = np.inf
        for _ in range(reps):
            v = _fresh_like(b) * mask    # fresh rhs per rep (see _fresh_like)
            t0 = time.time()
            _force(f(v)[0])
            best = min(best, time.time() - t0)
        return best

    t1, t2 = timed(f1), timed(f2)
    return (t2 - t1) / (chain * (m2 - m1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    from heatflow_tpu.ops.pallas_cg import rline_levels

    print(f"# backend: {jax.default_backend()}", file=sys.stderr)
    A, sm, pcr, pcr_z, b, problem = build_operator()
    nz, nr = b.shape
    P = nz * nr * 4  # bytes/plane
    Lr = rline_levels(nr)
    Lz = rline_levels(nz)
    u = sm * 1.0  # a full-range operand plane

    res = {"shape": [nz, nr], "plane_mb": P / 1e6,
           "levels_r": Lr, "levels_z": Lz}

    # --- phase kernels -------------------------------------------------
    # minimum-traffic models (planes moved per pass, perfect fusion):
    #   stream:    7 C reads + u read + out write                  = 9
    #   apply:     same + the shifted reads are of the same plane  = 9
    #              (pad adds a padded-copy write+read when materialized)
    #   pcr:       (2L+1) factor reads + per level (d read + write)= 2L+1+2L+1
    models = {
        "stream": 9, "apply_pad": 9, "apply_roll": 9,
        "pcr_pad": 4 * Lr + 2, "pcr_roll": 4 * Lr + 2,
        "pcr_pad_z": 4 * Lz + 2,
        # bf16 factor stacks: the (2L+1) factor planes count half
        # (2 bytes/elem); the f32 d traffic (2L+1 planes) is unchanged
        "pcr_bf16": 1.5 * (2 * Lr + 1),
        "pcr_z_bf16": 1.5 * (2 * Lz + 1),
    }
    phases = {}
    rows = [("stream", "stream", A, 0), ("apply_pad", "apply_pad", A, 0),
            ("apply_roll", "apply_roll", A, 0),
            ("pcr_pad", "pcr_pad", pcr, Lr),
            ("pcr_roll", "pcr_roll", pcr, Lr),
            ("pcr_pad_z", "pcr_pad_z", pcr_z, Lz),
            # measured NEGATIVES kept reproducible: bf16 factor storage
            # (halved load traffic, but the per-level converts cost more
            # than the loads saved — 7.7->8.6 us r, 6.2->7.8 us z)
            ("pcr_bf16", "pcr_pad", pcr.astype(jnp.bfloat16), Lr),
            ("pcr_z_bf16", "pcr_pad_z", pcr_z.astype(jnp.bfloat16), Lz)]
    for name, mode, C, lv in rows:
        s = slope_per_pass(mode, C, u, n_levels=lv, reps=args.reps)
        gbs = models[name] * P / s / 1e9
        phases[name] = {"us_per_pass": s * 1e6, "model_planes": models[name],
                        "achieved_gb_s": gbs}
        print(f"# {name:11s}: {s * 1e6:7.2f} us/pass  "
              f"({models[name]:4.1f} planes min-traffic -> {gbs:7.1f} GB/s)",
              file=sys.stderr)
    sol = phases["stream"]["achieved_gb_s"]
    for mode in phases:
        phases[mode]["vs_stream_sol"] = phases[mode]["achieved_gb_s"] / sol
    res["phases"] = phases
    res["stream_sol_gb_s"] = sol

    # --- whole-iteration marginal slopes -------------------------------
    # minimum-traffic per CG iteration (planes): apply 9 + sm 2 (on-the-fly
    # scaling reads) + vector updates x,r,p,z ~ 9 + reductions free = 20;
    # rline adds the pcr application; adi both.
    iter_models = {"plain": 20, "rline": 20 + 4 * Lr + 2,
                   "adi": 20 + 4 * Lr + 2 + 4 * Lz + 2}
    iters = {}
    for variant in ("plain", "rline", "adi"):
        s = cg_marginal_slope(variant, A, sm, b, pcr, pcr_z)
        gbs = iter_models[variant] * P / s / 1e9
        iters[variant] = {"us_per_iter": s * 1e6,
                          "model_planes": iter_models[variant],
                          "achieved_gb_s": gbs,
                          "vs_stream_sol": gbs / sol}
        print(f"# cg_{variant:6s}: {s * 1e6:7.2f} us/iter "
              f"({iter_models[variant]:2d} planes -> {gbs:7.1f} GB/s, "
              f"{100 * gbs / sol:5.1f}% of stream SOL)", file=sys.stderr)
    res["cg_iterations"] = iters

    print(json.dumps(res))
    if args.json:
        json.dump(res, open(args.json, "w"), indent=1)


if __name__ == "__main__":
    main()
