"""VMEM-resident multigrid-preconditioned CG: the whole MG-PCG solve in one
Pallas TPU kernel.

Motivation (measured, BENCHMARKS.md): plain VMEM CG needs ~456 iterations
per implicit step on the flagship operator at the bench tolerance; the RAP
multigrid cuts iterations ~15× but at XLA level each V-cycle pays HBM for
every operand, so it loses (108 vs 337 steps/s). Keeping the WHOLE V-cycle
in VMEM combines both wins.

TPU constraints shape the design:
  * no gathers and no strided slices in Mosaic → transfers use the two
    lowerable primitives (probed on hardware): sublane-splitting reshapes
    for the z axis and transpose+reshape for the r axis. That forces exact
    factor-2 index coarsening on odd-sized grids, so every level is padded
    to odd sizes with identity rows (the pad rows carry zero couplings and
    a unit diagonal — invisible to the solve).
  * the CG operator stays the accuracy-preserving on-the-fly scaled form
    sm·A·(sm·y) (ops/pallas_cg.py's lesson: baking the scaling into f32
    coefficients biases traces ~1 K). The PRECONDITIONER, which only needs
    to be some fixed SPD approximation, uses baked scaled operators — there
    the rounding is harmless.
  * smoothers are fixed-degree Chebyshev polynomials (ops/multigrid.py's
    scheme) with host-side Gershgorin bounds — linear, symmetric, SPD-safe.

Host-side setup (build_mg_setup) computes the scaled fine operator, the
Galerkin (RAP) coarse hierarchy via scipy, transfer weights from the graded
axes, and Chebyshev bounds; the kernel (mgcg_vmem_tol) runs tolerance-based
PCG with the unrolled V-cycle preconditioner.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from heatflow_tpu.ops.pallas_cg import VMEM_BUDGET, _apply7

CHEB_LO_FRAC = 0.08
CHEB_HI_FRAC = 1.05


# ----------------------------------------------------------------------
# host-side setup
# ----------------------------------------------------------------------

def _pad_odd(n: int) -> int:
    return n if n % 2 == 1 else n + 1


def _axis_weights(axis: np.ndarray) -> np.ndarray:
    """w[i] for fine node 2i+1 between coarse nodes i, i+1 (odd-sized axis):
    value = w·c_i + (1-w)·c_{i+1}."""
    zc = axis[0::2]
    zo = axis[1::2]
    denom = zc[1:] - zc[:-1]
    return (zc[1:] - zo) / np.where(denom != 0, denom, 1.0)


def _transfer_matrix(axis: np.ndarray):
    """Sparse 1D bilinear P (n_fine, n_coarse) for factor-2 coarsening of an
    odd-sized axis, matching the kernel's reshape-based transfers exactly."""
    import scipy.sparse as sp
    n = len(axis)
    m = (n + 1) // 2
    w = _axis_weights(axis)
    rows = np.concatenate([np.arange(0, n, 2),
                           np.arange(1, n, 2), np.arange(1, n, 2)])
    cols = np.concatenate([np.arange(m),
                           np.arange(m - 1), np.arange(1, m)])
    vals = np.concatenate([np.ones(m), w, 1.0 - w])
    return sp.coo_matrix((vals, (rows, cols)), shape=(n, m)).tocsr()


def build_mg_setup(A: np.ndarray, free: np.ndarray, z: np.ndarray,
                   r: np.ndarray, *, n_levels: int = 4,
                   dtype=jnp.float32) -> dict:
    """Precompute everything the kernel needs.

    A: (7|9, Nz, Nr) unscaled implicit operator; free: (Nz, Nr) mask;
    z/r: grid axes. Returns a dict of device arrays + static metadata.
    """
    import scipy.sparse as sp
    from heatflow_tpu.ops.stencil import (sparse_to_stencil, stencil_to_coo)

    A = np.asarray(A, np.float64)
    free = np.asarray(free, np.float64)
    nz, nr = A.shape[-2:]
    pz, pr = _pad_odd(nz), _pad_odd(nr)

    # pad with identity rows (zero couplings, unit diagonal, constrained)
    def pad_op(C, shape_to):
        k = C.shape[0]
        out = np.zeros((k,) + shape_to)
        out[:, :C.shape[1], :C.shape[2]] = C
        out[0, C.shape[1]:, :] = 1.0
        out[0, :, C.shape[2]:] = 1.0
        return out

    Af = pad_op(A, (pz, pr))
    freef = np.zeros((pz, pr))
    freef[:nz, :nr] = free
    zf = np.concatenate([z, z[-1:] + (z[-1] - z[-2])]) if pz != nz else z
    rf = np.concatenate([r, r[-1:] + (r[-1] - r[-2])]) if pr != nr else r

    # scaled operator with identity rows at constrained dofs (baked form for
    # the preconditioner levels)
    from heatflow_tpu.ops.stencil import offsets_for

    diag = Af[0]
    s = 1.0 / np.sqrt(np.where(diag > 0, diag, 1.0)) * freef \
        + (1.0 - freef)

    def bake(C, fmask, svec):
        offs = offsets_for(C.shape[0])
        sf = svec * fmask
        out = np.zeros_like(C)
        npz, npr = C.shape[1:]
        for k, (di, dj) in enumerate(offs):
            shifted = np.zeros((npz, npr))
            src = sf
            zs = slice(max(0, di), npz + min(0, di))
            zd = slice(max(0, -di), npz + min(0, -di))
            rs = slice(max(0, dj), npr + min(0, dj))
            rd = slice(max(0, -dj), npr + min(0, -dj))
            shifted[zd, rd] = src[zs, rs]
            out[k] = C[k] * sf * shifted
        out[0] += (1.0 - fmask)
        return out

    levels = []
    C_hat = bake(Af, freef, s)       # scaled fine operator (baked)
    cur_z, cur_r, cur_C = zf, rf, C_hat
    for lv in range(n_levels):
        npz, npr = len(cur_z), len(cur_r)
        # Gershgorin bound on D⁻¹C (coarse RAP diagonals are not unit)
        dg = np.where(cur_C[0] != 0, cur_C[0], 1.0)
        lmax = float((np.abs(cur_C).sum(axis=0) / dg).max())
        levels.append({"C": cur_C, "lmax": lmax, "shape": (npz, npr),
                       "wz": _axis_weights(cur_z)[:, None],
                       "wr": _axis_weights(cur_r)[None, :]})
        if lv == n_levels - 1 or min(npz, npr) <= 9:
            break
        # Galerkin coarse operator on the strict stride-2 grid
        Pz = _transfer_matrix(cur_z)
        Pr = _transfer_matrix(cur_r)
        P = sp.kron(Pz, Pr).tocsr()
        rows, cols, vals = stencil_to_coo(cur_C)
        n_f = npz * npr
        Afine = sp.coo_matrix((vals, (rows, cols)), shape=(n_f, n_f)).tocsr()
        mz, mr = (npz + 1) // 2, (npr + 1) // 2
        Cc = sparse_to_stencil((P.T @ Afine @ P).tocoo(), (mz, mr), 9)
        # pad the coarse level to odd sizes with identity rows
        pmz, pmr = _pad_odd(mz), _pad_odd(mr)
        Cc = pad_op(Cc, (pmz, pmr))
        cz = cur_z[0::2]
        cr = cur_r[0::2]
        cur_z = np.concatenate([cz, cz[-1:] * 2 - cz[-2:-1]]) \
            if pmz != mz else cz
        cur_r = np.concatenate([cr, cr[-1:] * 2 - cr[-2:-1]]) \
            if pmr != mr else cr
        cur_C = Cc

    dev_levels = []
    for lv in levels:
        dev_levels.append({
            "C": jnp.asarray(lv["C"], dtype),
            "wz": jnp.asarray(lv["wz"], dtype),
            "wr": jnp.asarray(lv["wr"], dtype),
        })
    return {
        "A": jnp.asarray(pad_op(np.asarray(A), (pz, pr)), dtype),
        "sm": jnp.asarray(s * freef, dtype),
        "levels": dev_levels,
        "meta": {"shapes": [lv["shape"] for lv in levels],
                 "lmaxs": [lv["lmax"] for lv in levels],
                 "orig": (nz, nr), "padded": (pz, pr)},
    }


# ----------------------------------------------------------------------
# in-kernel building blocks
# ----------------------------------------------------------------------

def _coarsen_rows(v):
    """(2m-1, n) → even rows (m, n), odd rows (m-1, n) via reshape (no
    strided slices — Mosaic constraint)."""
    nz, nr = v.shape
    m = (nz + 1) // 2
    vp = jnp.concatenate([v, jnp.zeros((1, nr), v.dtype)], axis=0)
    v2 = vp.reshape(m, 2, nr)
    return v2[:, 0, :], v2[:, 1, :][:m - 1]


def _interleave_rows(even, odd):
    """(m, n), (m-1, n) → (2m-1, n)."""
    m, nr = even.shape
    oddp = jnp.concatenate([odd, jnp.zeros((1, nr), even.dtype)], axis=0)
    out = jnp.stack([even, oddp], axis=1).reshape(2 * m, nr)
    return out[:2 * m - 1]


def _restrict1d_rows(v, w):
    """Rᵀ of linear interpolation along rows: (2m-1, n) → (m, n)."""
    ev, od = _coarsen_rows(v)
    nr = v.shape[1]
    z1 = jnp.zeros((1, nr), v.dtype)
    return ev + jnp.concatenate([w * od, z1], axis=0) \
        + jnp.concatenate([z1, (1.0 - w) * od], axis=0)


def _prolong1d_rows(c, w):
    """Linear interpolation along rows: (m, n) → (2m-1, n)."""
    od = w * c[:-1] + (1.0 - w) * c[1:]
    return _interleave_rows(c, od)


def _restrict2d(v, wz, wr):
    x = _restrict1d_rows(v, wz)
    x = _restrict1d_rows(x.T, wr.T).T
    return x


def _prolong2d(c, wz, wr):
    x = _prolong1d_rows(c.T, wr.T).T
    return _prolong1d_rows(x, wz)


def _pad_to(v, shape):
    return jnp.pad(v, ((0, shape[0] - v.shape[0]),
                       (0, shape[1] - v.shape[1])))


def _cheb(applyC, dinv, b, x, lmax, degree, dtype):
    """Chebyshev smoothing on D⁻¹C (cf. ops/multigrid.smooth_cheb)."""
    lo = CHEB_LO_FRAC * lmax
    hi = CHEB_HI_FRAC * lmax
    theta = jnp.asarray(0.5 * (hi + lo), dtype)
    delta = jnp.asarray(0.5 * (hi - lo), dtype)
    sigma = theta / delta
    rho = 1.0 / sigma
    r = b - applyC(x)
    d = dinv * r / theta
    x = x + d
    for _ in range(degree - 1):
        rho_new = 1.0 / (2.0 * sigma - rho)
        r = b - applyC(x)
        d = (rho_new * rho) * d + (2.0 * rho_new / delta) * (dinv * r)
        x = x + d
        rho = rho_new
    return x


def _make_vcycle(level_refs, meta, dtype, nu, nu_coarse):
    """Unrolled V-cycle over the baked scaled operators (closure over refs)."""
    shapes = meta["shapes"]
    lmaxs = meta["lmaxs"]
    n_lv = len(level_refs)

    def applyC(l):
        return lambda v: _apply7(level_refs[l]["C"], v)

    def dinv_of(l):
        d = level_refs[l]["C"][0]
        return jnp.where(d != 0, 1.0 / d, 1.0)

    def vcycle(l, b):
        if l == n_lv - 1:
            return _cheb(applyC(l), dinv_of(l), b, jnp.zeros_like(b),
                         lmaxs[l], nu_coarse, dtype)
        wz = level_refs[l]["wz"][:]
        wr = level_refs[l]["wr"][:]
        dinv = dinv_of(l)
        x = _cheb(applyC(l), dinv, b, jnp.zeros_like(b), lmaxs[l], nu,
                  dtype)
        res = b - applyC(l)(x)
        rc = _restrict2d(res, wz, wr)
        rc = _pad_to(rc, shapes[l + 1])
        xc = vcycle(l + 1, rc)
        mzr = ((shapes[l][0] + 1) // 2, (shapes[l][1] + 1) // 2)
        x = x + _prolong2d(xc[:mzr[0], :mzr[1]], wz, wr)
        return _cheb(applyC(l), dinv, b, x, lmaxs[l], nu, dtype)

    return lambda rr: vcycle(0, rr)


def _mgcg_kernel(*refs, meta, maxiter, rtol_wrt, nu, nu_coarse, dtype):
    A_ref, sm_ref, b_ref, x0_ref, rtol_ref = refs[:5]
    n_lv = len(meta["shapes"])
    level_refs = []
    for i in range(n_lv):
        level_refs.append({"C": refs[5 + 3 * i], "wz": refs[6 + 3 * i],
                           "wr": refs[7 + 3 * i]})
    x_ref, it_ref = refs[5 + 3 * n_lv:]

    sm = sm_ref[:]
    b = b_ref[:]
    x = x0_ref[:]
    fmask = (sm > 0).astype(b.dtype)   # sm = rsqrt(diag)·free > 0 iff free

    def apply_op(y):
        return sm * _apply7(A_ref, sm * y)

    vcyc = _make_vcycle(level_refs, meta, dtype, nu, nu_coarse)
    precond = lambda rr: vcyc(rr) * fmask   # constrained dofs stay pinned

    r = b - apply_op(x)
    z = precond(r)
    p = z
    rz = jnp.sum(r * z)
    rr0 = jnp.sum(r * r)
    rtol = rtol_ref[0, 0]
    ref2 = rr0 if rtol_wrt == "r0" else jnp.sum(b * b)
    stop2 = rtol * rtol * ref2

    def cond(state):
        _x, _r, _z, _p, _rz, rr, k = state
        return jnp.logical_and(k < maxiter, rr > stop2)

    def body(state):
        x, r, z, p, rz, _rr, k = state
        Ap = apply_op(p)
        pAp = jnp.sum(p * Ap)
        alpha = rz / jnp.where(pAp != 0, pAp, 1.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        p = z + beta * p
        return (x, r, z, p, rz_new, jnp.sum(r * r), k + 1)

    state = (x, r, z, p, rz, rr0, jnp.zeros((), jnp.int32))
    x, r, z, p, rz, rr, k = jax.lax.while_loop(cond, body, state)
    x_ref[:] = x
    it_ref[0, 0] = k


@functools.partial(jax.jit, static_argnames=("setup_meta", "maxiter",
                                             "rtol_wrt", "nu", "nu_coarse",
                                             "interpret"))
def _mgcg_call(A, sm, b, x0, rtol_arr, level_flat, *, setup_meta, maxiter,
               rtol_wrt, nu, nu_coarse, interpret):
    meta = dict(shapes=tuple(setup_meta[0]), lmaxs=tuple(setup_meta[1]))
    pz, pr = A.shape[-2:]
    dtype = b.dtype
    kern = functools.partial(
        _mgcg_kernel, meta=meta, maxiter=maxiter, rtol_wrt=rtol_wrt,
        nu=nu, nu_coarse=nu_coarse, dtype=dtype)
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4 \
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] \
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(level_flat)
    x, it = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((pz, pr), dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET),
        cost_estimate=pl.CostEstimate(
            flops=maxiter * 150 * pz * pr,
            bytes_accessed=30 * pz * pr * 4, transcendentals=0),
        interpret=interpret,
    )(A, sm, b, x0, rtol_arr, *level_flat)
    return x, it[0, 0]


def mgcg_vmem_tol(setup: dict, b, x0, rtol, *, maxiter: int = 2000,
                  rtol_wrt: str = "r0", nu: int = 2, nu_coarse: int = 10,
                  interpret: bool = False):
    """Tolerance-based MG-preconditioned CG, fully VMEM-resident.

    setup: build_mg_setup() output (operator must match b's step operator).
    b/x0: (Nz, Nr) on the ORIGINAL grid (padded internally); must vanish at
    constrained dofs (same contract as cg_vmem_tol). Returns (x, iters).
    """
    meta = setup["meta"]
    nz, nr = meta["orig"]
    pz, pr = meta["padded"]
    dtype = setup["sm"].dtype
    bp = jnp.pad(jnp.asarray(b, dtype), ((0, pz - nz), (0, pr - nr)))
    xp = jnp.pad(jnp.asarray(x0, dtype), ((0, pz - nz), (0, pr - nr)))
    rtol_arr = jnp.asarray(rtol, dtype).reshape(1, 1)
    level_flat = []
    for lv in setup["levels"]:
        level_flat += [lv["C"], lv["wz"], lv["wr"]]
    setup_meta = (tuple(tuple(s) for s in meta["shapes"]),
                  tuple(meta["lmaxs"]))
    x, it = _mgcg_call(setup["A"], setup["sm"], bp, xp, rtol_arr,
                       tuple(level_flat), setup_meta=setup_meta,
                       maxiter=maxiter, rtol_wrt=rtol_wrt, nu=nu,
                       nu_coarse=nu_coarse, interpret=interpret)
    return x[:nz, :nr], it
