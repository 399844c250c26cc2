#!/usr/bin/env python
"""Iteration-count experiment: z-semicoarsened 2-level MG with an exact
r-line smoother, as a CG preconditioner on the flagship operator.

Round 3 established (BENCHMARKS.md): r-line block-Jacobi cuts flagship CG
iterations 6-8x (the post-scaling stiffness is the radial grading), z-line
does nothing, and full-coarsening RAP-MG with a Chebyshev smoother cuts
iterations ~7x but loses wall-clock. The remaining textbook candidate is
the robust combo for line-resolved anisotropy: smooth the strong (r)
direction exactly with line solves, coarsen the complementary (z)
direction only. This script measures its iteration cut on CPU with exact
components (banded line factor, sparse-LU coarse solve) — the BEST case a
VMEM implementation could approach — to decide whether an in-kernel
implementation is worth building.

Cost model for the decision (apply-equivalents per PCG iteration, from the
measured VMEM numbers): plain rline-PCG ~5 (1 apply + ~4 for the 11-level
PCR rhs phase); V(1,1) z-semicoarsened MG-PCG ~13-15 (2 fine line solves +
1 fine residual apply + transfers + a half-cost coarse sweep). MG must cut
iterations >~2.8x vs rline to win wall-clock.

Usage: python benchmarks/expt_mg_rline.py [--rtol 1e-5] [--omegas 1.0,0.8]
"""

import argparse
import os
import sys
import time

import numpy as np
import scipy.linalg as sla
import scipy.sparse as sp
import scipy.sparse.linalg as spla

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def build_scaled_operator():
    """Flagship backward-Euler operator, Dirichlet-masked and symmetrically
    Jacobi-scaled, as scipy CSR on the full lattice (identity Dirichlet
    rows), plus the lattice shape and free mask."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from heatflow_tpu.config import load_config
    from heatflow_tpu.geometry import build_layout, coupler_watcher_points
    from heatflow_tpu.mesh.structured import build_structured_mesh
    from heatflow_tpu.sim.bc import HeatingCurve
    from heatflow_tpu.sim.problem import build_problem
    from heatflow_tpu.ops.stencil import stencil_to_coo

    cfg = load_config(os.path.join(ROOT, "cfgs", "geballe_with_diamond.yaml"))
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
    free = np.asarray(problem.free_mask).ravel()

    # mask: zero Dirichlet rows/cols, identity diagonal there (the kernel's
    # sf = s*free construction, ops/linesolve.line_couplings)
    d = A.diagonal().copy()
    s = np.where(free, 1.0 / np.sqrt(d), 0.0)
    S = sp.diags(s)
    Ah = (S @ A @ S).tocsr()
    Ah = Ah + sp.diags((~free).astype(float))

    # physical first-step rhs (scaled): b = M u0 with lifting folded in via
    # the masked system's rhs convention b_hat = s*(b - A g), g = ic on BCs
    rowsM, colsM, valsM = stencil_to_coo(M7)
    M = sp.coo_matrix((valsM, (rowsM, colsM)), shape=(n, n)).tocsr()
    u0 = np.full(n, problem.ic_temp)
    g = np.where(~free, u0, 0.0)
    b = M @ u0
    bh = s * (b - A @ g)
    return Ah, bh, (nz, nr), free, mesh


def rline_solver(Ah, shape):
    """Exact block-tridiagonal solve along r (all z-lines at once): the
    r-couplings of the row-major (z-major) lattice are the +-1 bands, and
    z-lines are independent blocks, so one banded factorization covers the
    whole vector."""
    nz, nr = shape
    n = nz * nr
    d0 = Ah.diagonal()
    # bands: Ah[(i, i+1)] and Ah[(i, i-1)] — extract via per-diagonal slices
    up = np.zeros(n)
    lo = np.zeros(n)
    c = Ah.tocoo()
    sel = c.col == c.row + 1
    up[c.row[sel]] = c.data[sel]
    sel = c.col == c.row - 1
    lo[c.row[sel] - 1] = c.data[sel]
    # zero the couplings that cross z-line boundaries (none exist in the
    # 7-point stencil: (0,+-1) couplings never wrap, but be safe)
    edge = (np.arange(n) % nr) == nr - 1
    up[edge] = 0.0
    lo[edge] = 0.0
    ab = np.zeros((3, n))
    ab[0, 1:] = up[:-1]
    ab[1] = d0
    ab[2, :-1] = lo[:-1]
    lu = sla.cholesky_banded(np.vstack([ab[0], ab[1]]), lower=False) \
        if False else None
    # use LU-banded (general) — SPD banded cholesky needs care with the
    # identity Dirichlet rows; solve_banded refactors per call, so
    # prefactor via splu on the tridiagonal matrix instead
    T = sp.diags([lo[:-1], d0, up[:-1]], [-1, 0, 1], format="csc")
    f = spla.splu(T)
    return lambda r: f.solve(r)


def z_semicoarsen_P(mesh, shape, free):
    """Prolongation: linear interpolation in z between every-other fine
    z-levels, identity in r; zero rows on Dirichlet fine nodes."""
    nz, nr = shape
    zc_idx = np.arange(0, nz, 2)
    nzc = len(zc_idx)
    z = np.asarray(mesh.z)
    rows, cols, vals = [], [], []
    pos = {int(zf): j for j, zf in enumerate(zc_idx)}
    for i in range(nz):
        if i in pos:
            rows.append(i); cols.append(pos[i]); vals.append(1.0)
        else:
            lo_j = pos[i - 1]
            if i + 1 in pos:
                hi_j = pos[i + 1]
                w = (z[i] - z[i - 1]) / (z[i + 1] - z[i - 1])
                rows += [i, i]; cols += [lo_j, hi_j]; vals += [1 - w, w]
            else:  # top fine level with odd nz — inject from below
                rows.append(i); cols.append(lo_j); vals.append(1.0)
    Pz = sp.coo_matrix((vals, (rows, cols)), shape=(nz, nzc))
    P = sp.kron(Pz, sp.eye(nr), format="csr")
    # Dirichlet fine rows get no correction
    mask = sp.diags(free.astype(float))
    return (mask @ P).tocsr(), (nzc, nr)


def make_mg_prec(Ah, shape, mesh, free, omega, nu=1, coarse="splu"):
    line = rline_solver(Ah, shape)
    P, cshape = z_semicoarsen_P(mesh, shape, free)
    Ac = (P.T @ Ah @ P).tocsc()
    # coarse rows under zeroed (Dirichlet) fine rows are empty — identity
    # them so the coarse solve is nonsingular (their residual is 0 anyway)
    dz = np.asarray(Ac.diagonal() == 0, float)
    Ac = (Ac + sp.diags(dz)).tocsc()
    if coarse == "splu":
        t0 = time.time()
        fc = spla.splu(Ac)
        print(f"# coarse splu ({Ac.shape[0]} nodes): {time.time()-t0:.1f}s",
              file=sys.stderr)
        csolve = fc.solve
    else:
        n_sweeps = int(coarse.split(":")[1]) if ":" in coarse else 8
        cl = rline_solver(Ac.tocsr(), cshape)
        def csolve(rc):
            xc = np.zeros_like(rc)
            for _ in range(n_sweeps):
                xc += omega * cl(rc - Ac @ xc)
            return xc

    def prec(r):
        # symmetric V(nu,nu): damped line-Jacobi pre-smooth, exact coarse
        # correction, damped line-Jacobi post-smooth
        x = np.zeros_like(r)
        for _ in range(nu):
            x += omega * line(r - Ah @ x)
        rc = P.T @ (r - Ah @ x)
        x += P @ csolve(rc)
        for _ in range(nu):
            x += omega * line(r - Ah @ x)
        return x
    return prec


def pcg(Ah, b, prec, rtol, maxiter=8000):
    x = np.zeros_like(b)
    r = b.copy()
    z = prec(r)
    p = z.copy()
    rz = r @ z
    nb = np.linalg.norm(b)
    for it in range(maxiter):
        Ap = Ah @ p
        alpha = rz / (p @ Ap)
        x += alpha * p
        r -= alpha * Ap
        if np.linalg.norm(r) <= rtol * nb:
            return x, it + 1
        z = prec(r)
        rz_new = r @ z
        p = z + (rz_new / rz) * p
        rz = rz_new
    return x, maxiter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rtol", type=float, default=1e-5)
    ap.add_argument("--omegas", default="1.0,0.8")
    ap.add_argument("--nu", type=int, default=1)
    ap.add_argument("--coarse", default="splu",
                    help="coarse solves, '/'-separated: 'splu' (exact) or "
                         "'rline:N' (N damped line-Jacobi sweeps — the "
                         "in-kernel-realizable variant)")
    ap.add_argument("--with-identity", action="store_true",
                    help="also run the slow jacobi-only baseline "
                         "(known: 3228 iters at 1e-5)")
    args = ap.parse_args()

    Ah, bh, shape, free, mesh = build_scaled_operator()
    print(f"# operator {shape}, {Ah.nnz} nnz", file=sys.stderr)

    if args.with_identity:
        _, it_id = pcg(Ah, bh, lambda r: r, args.rtol)
        print(f"identity (jacobi-scaled) PCG @ {args.rtol:g}: {it_id} iters")

    line = rline_solver(Ah, shape)
    _, it_rl = pcg(Ah, bh, line, args.rtol)
    print(f"rline block-Jacobi PCG @ {args.rtol:g}: {it_rl} iters")

    for omega in [float(s) for s in args.omegas.split(",")]:
        for coarse in args.coarse.split("/"):
            prec = make_mg_prec(Ah, shape, mesh, free, omega, nu=args.nu,
                                coarse=coarse)
            _, it_mg = pcg(Ah, bh, prec, args.rtol)
            print(f"MG(z-semi, rline, omega={omega}, nu={args.nu}, "
                  f"coarse={coarse}) PCG @ {args.rtol:g}: {it_mg} iters "
                  f"(cut vs rline: {it_rl / max(it_mg, 1):.1f}x)")


if __name__ == "__main__":
    main()
