"""z-semicoarsened 2-level MG over the r-line smoother — operand builder.

Round 3 measured (CPU, exact components — benchmarks/expt_mg_rline.py)
that the textbook robust-MG combo for line-resolved anisotropy (solve the
strong r direction exactly per line, coarsen only z) cuts flagship CG
iterations 5-9.3x over the rline baseline, but projected the wall-clock
gain at <=1.2x because the coarse level keeps the full r extent (its line
solves barely shrink). The round-4 verdict asked for the projection to be
replaced by an IN-KERNEL measurement (item 5). This module builds the
VMEM-resident operands for that kernel; the V-cycle itself lives in
ops/pallas_cg._cg_tol_kernel (precondition branch ``mgz``).

Representation: EMBEDDED. The coarse grid (every other z level, full r)
lives on the even sublanes of fine-shaped (Nz, Nr) planes; odd sublanes
carry identity rows. Every V-cycle component is then pure elementwise
work plus sublane/lane shifts — the only patterns Mosaic lowers well (no
gathers, no strided slices, no reshapes):

  restriction   rc = e_free*r + sh(pp*r, -1) + sh(pm*r, +1)
  coarse apply  9 shifted multiply-adds, z-offsets {0, +-2}, r {0, +-1}
  coarse line   folded PCR along lanes of the scaled embedded operator
  prolongation  x += e_free*xc + pm*sh(xc, -1) + pp*sh(xc, +1)

with pm/pp the linear-in-z interpolation weights (zero on even rows and
on Dirichlet fine rows), so restriction is exactly P^T and the V-cycle is
symmetric.

The coarse operator is the Galerkin triple product P^T (S A S) P of the
SCALED masked fine operator, computed host-side with scipy ONCE per
(problem, coefficients) — the same maker-time-RAP convention as
ops/multigrid.build_hierarchy. It therefore bakes the problem's DEFAULT
material coefficients; callers overriding kappas at simulate() time must
not use precondition='mgz' (the stepper raises).

Reference context: this replaces the reference's exact MUMPS factor-solve
(ref run_no_diamond.py:339-344) with the strongest TPU-native
preconditioner candidate for the DAC operator's 3-decade mesh grading
(SURVEY §7 hard parts).
"""

from __future__ import annotations

import numpy as np

# embedded coarse stencil plane order: (dz, dr) offsets in FINE index
# space (coarse z-offset 1 == fine 2)
MGZ_OFFSETS = [(0, 0), (2, 0), (-2, 0), (0, 1), (0, -1),
               (2, 1), (-2, -1), (2, -1), (-2, 1)]


def mgz_pack(A7: np.ndarray, s: np.ndarray, free: np.ndarray,
             dtype=np.float32) -> dict:
    """Build the embedded mgz operand dict for the VMEM kernel.

    A7: (7, Nz, Nr) UNSCALED backward-Euler stencil (ops/stencil.OFFSETS
    order); s: the scaling vector (rsqrt(diag)*free + dirichlet); free:
    the free mask. Returns numpy arrays of ``dtype``:
      Ac9   (9, Nz, Nr)  embedded scaled coarse stencil (unit diagonal on
                         live even rows, identity odd/dead rows)
      pcrc  (2L+1, Nz, Nr) folded lane-PCR factors of Ac9's tridiag part
      aux   (4, Nz, Nr)  [sc, pm, pp, e_free]
    """
    import scipy.sparse as sp
    from heatflow_tpu.ops.stencil import stencil_to_coo

    A7 = np.asarray(A7, np.float64)
    s = np.asarray(s, np.float64)
    free = np.asarray(free, np.float64)
    npts, nz, nr = A7.shape
    if npts != 7:
        raise ValueError("mgz_pack expects the 7-point structured stencil")
    n = nz * nr

    # scaled masked fine operator (identity Dirichlet rows) — the system
    # the kernel's apply_op realizes
    rows, cols, vals = stencil_to_coo(A7)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    sf = (s * free).ravel()
    S = sp.diags(sf)
    Ah = (S @ A @ S).tocsr()
    Ah = Ah + sp.diags((free.ravel() == 0).astype(np.float64))

    # prolongation: linear interpolation between every-other z rows,
    # identity in r, zero rows on Dirichlet fine nodes. Uniform 0.5
    # weights in INDEX space are sufficient for a preconditioner-grade
    # transfer (the Galerkin product absorbs the grading); they also
    # keep pm + pp == 1 exactly in f32.
    zc = np.arange(0, nz, 2)
    nzc = len(zc)
    rows_p, cols_p, vals_p = [], [], []
    pm = np.zeros((nz, nr))
    pp = np.zeros((nz, nr))
    for i in range(nz):
        if i % 2 == 0:
            rows_p.append(i)
            cols_p.append(i // 2)
            vals_p.append(1.0)
        else:
            lo_j, hi_j = (i - 1) // 2, (i + 1) // 2
            if hi_j < nzc:
                rows_p += [i, i]
                cols_p += [lo_j, hi_j]
                vals_p += [0.5, 0.5]
                pm[i, :] = 0.5
                pp[i, :] = 0.5
            else:           # top odd row with no upper coarse neighbor
                rows_p.append(i)
                cols_p.append(lo_j)
                vals_p.append(1.0)
                pm[i, :] = 1.0
    Pz = sp.coo_matrix((vals_p, (rows_p, cols_p)), shape=(nz, nzc))
    P = sp.kron(Pz, sp.eye(nr), format="csr")
    mask = sp.diags(free.ravel())
    P = (mask @ P).tocsr()
    pm *= free
    pp *= free
    e_free = np.zeros((nz, nr))
    e_free[0::2, :] = 1.0
    e_free *= free

    # Galerkin coarse operator + its symmetric scaling (unit diagonal)
    Ac = (P.T @ Ah @ P).tocsr()
    dc = Ac.diagonal().copy()
    live = dc > 0
    sc_c = np.where(live, 1.0 / np.sqrt(np.where(live, dc, 1.0)), 0.0)
    Sc = sp.diags(sc_c)
    Ach = (Sc @ Ac @ Sc).tocsr()
    Ach = Ach + sp.diags((~live).astype(np.float64))

    # embed the scaled coarse stencil: coarse (j, ir) -> fine (2j, ir)
    Ac9 = np.zeros((9, nz, nr))
    Ac9[0][1::2, :] = 1.0            # identity odd rows
    coo = Ach.tocoo()
    jz_r, ir_r = np.divmod(coo.row, nr)
    jz_c, ir_c = np.divmod(coo.col, nr)
    dz = (jz_c - jz_r) * 2           # fine-index z offset
    dr = ir_c - ir_r
    for k, (oz, orr) in enumerate(MGZ_OFFSETS):
        sel = (dz == oz) & (dr == orr)
        Ac9[k][2 * jz_r[sel], ir_r[sel]] = coo.data[sel]

    # embedded coarse scaling plane (odd rows 1 — inert)
    sc = np.ones((nz, nr))
    sc[0::2, :] = sc_c.reshape(nzc, nr)

    # folded lane-PCR factors of the embedded coarse tridiagonal part.
    # Boundary-lane couplings are zero by construction (no dr=+1 coupling
    # at the last column in Ach); odd rows have zero couplings + unit
    # diagonal, so their PCR levels are exact identities.
    import jax.numpy as jnp
    from heatflow_tpu.ops.linesolve import pcr_factor, pcr_fold
    u = jnp.asarray(Ac9[3])
    lo = jnp.asarray(Ac9[4])
    levels2, g = pcr_fold(pcr_factor(lo, u, axis=-1), axis=-1)
    pcrc = np.stack([np.asarray(p) for lv in levels2 for p in lv]
                    + [np.asarray(g)])

    return {"Ac9": Ac9.astype(dtype), "pcrc": pcrc.astype(dtype),
            "aux": np.stack([sc, pm, pp, e_free]).astype(dtype)}


def mgz_reference_vcycle(A7, s, free, pack, *, omega=0.8, omega_c=0.8,
                         sweeps=2):
    """Numpy reference of the kernel's V-cycle (testing only): returns
    precond(r) operating on the SCALED system, mirroring the in-kernel
    branch op for op."""
    import jax.numpy as jnp
    from heatflow_tpu.ops.linesolve import (line_couplings, pcr_factor,
                                            pcr_fold, pcr_apply_folded)

    A7 = jnp.asarray(A7, jnp.float64)
    s = jnp.asarray(s, jnp.float64)
    free = jnp.asarray(free, jnp.float64)
    sf = s * free
    l, u = line_couplings(A7, sf, -1)
    lv2, g = pcr_fold(pcr_factor(l, u, axis=-1), axis=-1)
    line = lambda r: pcr_apply_folded(lv2, g, r, axis=-1) * free

    from heatflow_tpu.ops.stencil import apply_stencil
    # annihilated-Dirichlet convention, same as the kernel's apply_op
    # (r and x are identically zero on constrained rows)
    apply_h = lambda y: sf * apply_stencil(A7, sf * y)

    Ac9 = np.asarray(pack["Ac9"], np.float64)
    pcrc = np.asarray(pack["pcrc"], np.float64)
    sc, pm, pp, e_free = [np.asarray(x, np.float64) for x in pack["aux"]]
    Lc = (pcrc.shape[0] - 1) // 2
    lvc = [(jnp.asarray(pcrc[2 * k]), jnp.asarray(pcrc[2 * k + 1]))
           for k in range(Lc)]
    gc = jnp.asarray(pcrc[2 * Lc])
    line_c = lambda r: pcr_apply_folded(lvc, gc, jnp.asarray(r), axis=-1)

    def sh(v, d):
        """out[i] = v[i+d] along sublanes, zero fill."""
        out = np.zeros_like(v)
        if d > 0:
            out[:-d] = v[d:]
        elif d < 0:
            out[-d:] = v[:d]
        else:
            out = v.copy()
        return out

    def sh2(v, dz, dr):
        """out[i, j] = v[i+dz, j+dr], zero fill both axes."""
        out = sh(v, dz)
        if dr > 0:
            out = np.concatenate(
                [out[:, dr:], np.zeros((v.shape[0], dr))], axis=1)
        elif dr < 0:
            out = np.concatenate(
                [np.zeros((v.shape[0], -dr)), out[:, :dr]], axis=1)
        return out

    def apply_c(y):
        out = Ac9[0] * y
        for k, (oz, orr) in enumerate(MGZ_OFFSETS[1:], start=1):
            out = out + Ac9[k] * sh2(y, oz, orr)
        return out

    def precond(r):
        r = np.asarray(r, np.float64)
        x = omega * np.asarray(line(jnp.asarray(r)))
        r1 = r - np.asarray(apply_h(jnp.asarray(x)))
        rc = e_free * r1 + sh(pp * r1, -1) + sh(pm * r1, 1)
        rcs = sc * rc
        yc = omega_c * np.asarray(line_c(rcs))
        for _ in range(sweeps - 1):
            res = rcs - apply_c(yc)
            yc = yc + omega_c * np.asarray(line_c(res))
        xc = sc * yc
        x = x + e_free * xc + pm * sh(xc, -1) + pp * sh(xc, 1)
        r2 = r - np.asarray(apply_h(jnp.asarray(x)))
        x = x + omega * np.asarray(line(jnp.asarray(r2)))
        return x

    return precond
