#!/usr/bin/env python
"""Iteration-count probe: ADI-style r-line + z-line compositions as CG
preconditioners on the flagship operator.

Round 3 established (BENCHMARKS.md): r-line block-Jacobi cuts flagship CG
iterations 6-8x, z-line ALONE does nothing (the post-scaling stiffness is
the radial grading), and z-semicoarsened MG over the rline smoother cuts
5-9.3x but at 4-6x cycle cost (<=1.2x projected end-to-end). The untried
composition is classic ADI: solve BOTH directions' line systems per
application. After exact r-line solves the remaining error is smooth in r
but arbitrary in z — exactly what a z-line solve handles. Two candidates,
with their cost bars in stencil-apply equivalents per PCG iteration
(folded-PCR costs: rline ~= 23 planes ~= 3.3 A, zline ~= 17 planes
~= 2.4 A; rline-PCG baseline ~= 1 + 3.3 = 4.3 A-equiv):

  additive       M^-1 = R + Z          (~6.7 A-equiv: needs >1.55x cut)
  additive-split M^-1 = R + Z - I      (subtracts the doubly-counted unit
                                        diagonal; SPD not guaranteed)
  adi (sym mult) x = R r; x += Z(r-Ax); x += R(r-Ax)
                                       (~12.3 A-equiv: needs >2.9x cut)

Both R and Z are SPD (principal-submatrix block Jacobi of the scaled SPD
operator), so R+Z is SPD; the symmetric multiplicative composition is the
palindromic (R,Z,R) Schwarz preconditioner. Exact banded factorizations
stand in for the VMEM PCR solves — the BEST case a kernel could approach.

Usage: python benchmarks/expt_adi_probe.py [--rtol 1e-5]
"""

import argparse
import os
import sys

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from expt_mg_rline import build_scaled_operator, rline_solver, pcg  # noqa: E402


def zline_solver(Ah, shape):
    """Exact block-tridiagonal solve along z (all r-columns at once): the
    z-couplings of the row-major (z-major) lattice are the +-nr bands;
    permute to r-major so each z-line is contiguous, then one banded
    factorization covers the whole vector (ops/linesolve axis=-2
    analogue)."""
    nz, nr = shape
    n = nz * nr
    # permutation flat(z, r) -> flat_T(r, z)
    perm = (np.arange(n).reshape(nz, nr).T).ravel()       # gather indices
    P = sp.coo_matrix((np.ones(n), (np.arange(n), perm)), shape=(n, n))
    At = (P @ Ah @ P.T).tocoo()
    d0 = At.tocsr().diagonal()
    up = np.zeros(n)
    lo = np.zeros(n)
    sel = At.col == At.row + 1
    up[At.row[sel]] = At.data[sel]
    sel = At.col == At.row - 1
    lo[At.row[sel] - 1] = At.data[sel]
    edge = (np.arange(n) % nz) == nz - 1   # zero couplings across r-columns
    up[edge] = 0.0
    lo[edge] = 0.0
    T = sp.diags([lo[:-1], d0, up[:-1]], [-1, 0, 1], format="csc")
    f = spla.splu(T)
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)
    return lambda r: f.solve(r[perm])[inv]


def pcg_r0(Ah, b, x0, prec, rtol, maxiter=8000):
    """Increment-relative PCG (rtol wrt ||r0||, warm start x0) — the
    official stepper's stopping regime (ops/cg.pcg rtol_wrt='r0')."""
    x = x0.copy()
    r = b - Ah @ x
    n0 = np.linalg.norm(r)
    if n0 == 0:
        return x, 0
    z = prec(r)
    p = z.copy()
    rz = r @ z
    for it in range(maxiter):
        Ap = Ah @ p
        alpha = rz / (p @ Ap)
        x += alpha * p
        r -= alpha * Ap
        if np.linalg.norm(r) <= rtol * n0:
            return x, it + 1
        z = prec(r)
        rz_new = r @ z
        p = z + (rz_new / rz) * p
        rz = rz_new
    return x, maxiter


def transient_iters(precs, rtol, steps):
    """Total warm-started iterations over the first `steps` backward-Euler
    steps of the flagship transient (extrapolated seeds, wrt-r0 stopping) —
    the official regime, per preconditioner. Rebuilds the problem to get
    the mass matrix and the real heating BC values."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from heatflow_tpu.config import load_config
    from heatflow_tpu.geometry import build_layout, coupler_watcher_points
    from heatflow_tpu.mesh.structured import build_structured_mesh
    from heatflow_tpu.sim.bc import HeatingCurve
    from heatflow_tpu.sim.problem import build_problem
    from heatflow_tpu.ops.stencil import stencil_to_coo

    cfg = load_config(os.path.join(ROOT, "cfgs",
                                   "geballe_with_diamond.yaml"))
    cfg["heating"]["file"] = os.path.join(ROOT, "experimental_data",
                                          "geballe_heat_data.csv")
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    heating = HeatingCurve.from_csv(cfg["heating"]["file"])
    problem = build_problem(mesh, heating, cfg,
                            watcher_points=coupler_watcher_points(cfg))
    st = problem.stencils
    A7 = (np.einsum("m,mkij->kij", problem.rho_cvs, st.M)
          + problem.dt * np.einsum("m,mkij->kij", problem.kappas, st.K))
    M7 = np.einsum("m,mkij->kij", problem.rho_cvs, st.M)
    nz, nr = problem.mesh.shape
    n = nz * nr
    rows, cols, vals = stencil_to_coo(A7)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    rowsM, colsM, valsM = stencil_to_coo(M7)
    M = sp.coo_matrix((valsM, (rowsM, colsM)), shape=(n, n)).tocsr()
    free = np.asarray(problem.free_mask).ravel()
    d = A.diagonal().copy()
    s = np.where(free, 1.0 / np.sqrt(d), 0.0)
    S = sp.diags(s)
    Ah = (S @ A @ S).tocsr() + sp.diags((~free).astype(float))
    shape = (nz, nr)

    # the stepper's affine heating BC (stepper.py _core): g(t) = g0 + amp·g1
    ic = float(problem.ic_temp)
    profile = (np.exp(-4.0 * np.log(2.0) / problem.fwhm ** 2
                      * problem.r_sq)
               * problem.heat_mask.astype(float)).ravel()
    dirich = (~free).astype(float)
    g0 = ic * (dirich - profile)
    g1 = profile
    amp_offset = float(problem.heating.temp[0]) - ic

    built = {name: mk(Ah, shape) for name, mk in precs.items()}
    totals = {}
    for name, prec in built.items():
        u = np.full(n, ic)
        y_prev = np.zeros(n)      # scaled-solution history for extrapolation
        y_pp = np.zeros(n)
        total = 0
        per_step = []
        for step in range(steps):
            t = (step + 1) * problem.dt
            amp = np.interp(t, problem.heating.time,
                            problem.heating.temp) - amp_offset
            g = g0 + amp * g1
            b = M @ u
            bh = s * (b - A @ g)
            x0 = (2 * y_prev - y_pp) if step >= 2 else y_prev
            y, it = pcg_r0(Ah, bh, x0, prec, rtol)
            total += it
            per_step.append(it)
            y_pp, y_prev = y_prev, y
            u = s * y + g
        totals[name] = (total, per_step)
    return totals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rtol", type=float, default=1e-5)
    ap.add_argument("--maxiter", type=int, default=8000)
    ap.add_argument("--transient", type=int, default=0,
                    help="also measure N warm-started steps at the "
                         "official wrt-r0 rtol 1e-4 regime")
    args = ap.parse_args()

    Ah, bh, shape, free, mesh = build_scaled_operator()
    print(f"# operator {shape}, {Ah.nnz} nnz", file=sys.stderr)

    R = rline_solver(Ah, shape)
    Z = zline_solver(Ah, shape)

    _, it_rl = pcg(Ah, bh, R, args.rtol, args.maxiter)
    print(f"rline PCG @ {args.rtol:g}: {it_rl} iters")

    _, it_z = pcg(Ah, bh, Z, args.rtol, args.maxiter)
    print(f"zline PCG @ {args.rtol:g}: {it_z} iters")

    _, it_add = pcg(Ah, bh, lambda r: R(r) + Z(r), args.rtol, args.maxiter)
    print(f"additive R+Z PCG @ {args.rtol:g}: {it_add} iters "
          f"(cut vs rline {it_rl / max(it_add, 1):.2f}x, "
          f"bar 1.55x)")

    _, it_spl = pcg(Ah, bh, lambda r: R(r) + Z(r) - r, args.rtol,
                    args.maxiter)
    print(f"additive-split R+Z-I PCG @ {args.rtol:g}: {it_spl} iters "
          f"(cut vs rline {it_rl / max(it_spl, 1):.2f}x; indefiniteness "
          f"shows as stagnation)")

    def adi(r):
        x = R(r)
        x = x + Z(r - Ah @ x)
        x = x + R(r - Ah @ x)
        return x

    _, it_adi = pcg(Ah, bh, adi, args.rtol, args.maxiter)
    print(f"sym-mult ADI (R,Z,R) PCG @ {args.rtol:g}: {it_adi} iters "
          f"(cut vs rline {it_rl / max(it_adi, 1):.2f}x, bar 2.9x)")

    if args.transient:
        precs = {
            "rline": lambda Ah, shape: rline_solver(Ah, shape),
            "split": lambda Ah, shape: (
                lambda R, Zp: (lambda r: R(r) + Zp(r) - r)
            )(rline_solver(Ah, shape), zline_solver(Ah, shape)),
            "adi": lambda Ah, shape: (
                lambda R, Zp: (lambda r:
                               (lambda x: x + R(r - Ah @ x))(
                                   (lambda x0: x0 + Zp(r - Ah @ x0))(R(r))))
            )(rline_solver(Ah, shape), zline_solver(Ah, shape)),
        }
        res = transient_iters(precs, 1e-4, args.transient)
        base_total = res["rline"][0]
        base_tail = sum(res["rline"][1][-args.transient // 3:])
        for name, (total, per_step) in res.items():
            tail = per_step[-args.transient // 3:]
            print(f"transient wrt-r0 1e-4 x{args.transient} steps — {name}: "
                  f"{total} iters total, mean {total/len(per_step):.1f} "
                  f"(cut vs rline {base_total/max(total,1):.2f}x); "
                  f"tail mean {np.mean(tail):.1f} "
                  f"(tail cut {base_tail/max(sum(tail),1):.2f}x); "
                  f"first/last: {per_step[0]}/{per_step[-1]}")


if __name__ == "__main__":
    main()
