"""VMEM-resident CG: a Pallas TPU kernel that runs the whole conjugate-
gradient solve on-chip.

The XLA CG path is HBM-bandwidth-bound: every iteration re-reads the 7
stencil coefficient planes plus ~5 solution-sized vectors (~13 MB on the
flagship mesh) from HBM. For DAC-scale meshes the entire working set
(7 coefficient planes + 4 CG vectors ≈ 12 MB f32) fits in VMEM, so this
kernel loads everything once, runs a fixed number of CG iterations entirely
out of VMEM (stencil applies and reductions are VPU work), and writes back
only the solution — the speed-of-light regime for this operator.

"Speed-of-light" is measured, not asserted (round 5,
benchmarks/bench_roofline.py, BENCHMARKS.md "Roofline"): at the flagship
shape the kernel's no-shift streaming floor runs at 100.7% of the VPU's
1-load/cycle issue bound (~3.85 TB/s effective), the 7-point apply costs
1.29x that floor (the pad is fused by Mosaic; the residual is intrinsic
unaligned-lane access — an explicit pltpu.roll variant measured SLOWER),
and the composed rline/adi iterations run FASTER than the sum of their
isolated phases (5.4 TB/s-equivalent min-traffic rate). Rejected
variants, all measured: roll shifts (r and z), bf16 PCR factor stacks.

Preconditioning: the caller passes the symmetrically-scaled operator (unit
diagonal) with Dirichlet rows/columns eliminated to the identity, so the
kernel needs no masks and no preconditioner (Jacobi ≡ identity after
scaling).

Falls back automatically (``fits_in_vmem``) when the problem is too large.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# conservative per-core VMEM budget (bytes); the true limit is probed lazily
VMEM_BUDGET = 100 * 1024 * 1024


def _imap_cfg(i):
    """Per-config block index map. Mosaic requires index maps to return
    i32; under jax_enable_x64 plain Python ints trace to i64 and the
    kernel fails to legalize (repro'd on this jax/libtpu — hit by the
    f64_refine paths, which enable x64 around the f32 kernels)."""
    return jnp.int32(i), jnp.int32(0), jnp.int32(0)


def _imap_shared(i):
    return jnp.int32(0), jnp.int32(0), jnp.int32(0)


def _smem_whole(shape):
    """Whole-array SMEM spec with an explicit i32 index map — the default
    map synthesized for ``pl.BlockSpec(memory_space=SMEM)`` under a grid
    returns Python ints, which trace to i64 under x64 (see _imap_cfg)."""
    nd = len(shape)
    return pl.BlockSpec(shape,
                        lambda i, _n=nd: tuple(jnp.int32(0)
                                               for _ in range(_n)),
                        memory_space=pltpu.SMEM)


def fits_in_vmem(nz: int, nr: int, dtype=jnp.float32,
                 n_points: int = 7, extra_planes: int = 0) -> bool:
    """``extra_planes``: additional solution-sized VMEM planes the kernel
    will hold (e.g. :func:`rline_extra_planes` for the folded r-line PCR
    factors)."""
    bytes_per = jnp.dtype(dtype).itemsize
    working_set = (n_points + 6 + extra_planes) * nz * nr * bytes_per
    return working_set < VMEM_BUDGET


def _apply7(C_ref, u):
    """Stencil apply on values, in-kernel: pad the operand once, then take
    static shifted slices. Handles the 7-point structured pattern and the
    9-point grid-overlay pattern (plane count read statically from C)."""
    nz, nr = u.shape
    up = jnp.pad(u, ((1, 1), (1, 1)))

    def sh(di, dj):
        return jax.lax.slice(up, (1 + di, 1 + dj), (1 + di + nz, 1 + dj + nr))

    out = C_ref[0] * u
    out += C_ref[1] * sh(1, 0)
    out += C_ref[2] * sh(-1, 0)
    out += C_ref[3] * sh(0, 1)
    out += C_ref[4] * sh(0, -1)
    out += C_ref[5] * sh(1, 1)
    out += C_ref[6] * sh(-1, -1)
    if C_ref.shape[0] == 9:       # OFFSETS9 anti-diagonals (ops/stencil.py)
        out += C_ref[7] * sh(1, -1)
        out += C_ref[8] * sh(-1, 1)
    return out


def _cg_kernel(C_ref, b_ref, x0_ref, x_ref, *, iters: int):
    b = b_ref[:]
    x = x0_ref[:]
    r = b - _apply7(C_ref, x)
    p = r
    rz = jnp.sum(r * r)

    def body(_k, state):
        x, r, p, rz = state
        # standard recurrence (recompute A p): the fused A p = A r + β A p_old
        # variant drifts in f32 — compute is nearly free in VMEM, stability
        # is not
        Ap = _apply7(C_ref, p)
        pAp = jnp.sum(p * Ap)
        alpha = rz / jnp.where(pAp != 0, pAp, 1.0)
        x = x + alpha * p
        r = r - alpha * Ap
        rz_new = jnp.sum(r * r)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        p = r + beta * p
        return (x, r, p, rz_new)

    x, r, p, rz = jax.lax.fori_loop(0, iters, body, (x, r, p, rz))
    x_ref[:] = x


CHECK_EVERY = 1  # CG iterations per convergence check. The residual norm
                 # already lands in the loop state every iteration (it feeds
                 # the stopping rule), so checking costs no extra compute —
                 # and the while_loop's per-trip overhead measured ~zero on
                 # TPU (interleaved flagship A/Bs, both the rline and the
                 # plain-jacobi kernels: benchmarks/expt_check_every.py).
                 # Checking every iteration removes the mean
                 # ~(CHECK_EVERY-1)/2-iteration stopping overshoot: +4.5%
                 # steps/s at the official point vs the old value of 8.


def _shift_lane(v: jnp.ndarray, d: int) -> jnp.ndarray:
    """out[:, j] = v[:, j+d], zeros shifted in — pad + static slice along
    the lane (minor) dim, the same Mosaic-friendly pattern as _apply7."""
    nz, nr = v.shape
    if d > 0:
        return jax.lax.slice(jnp.pad(v, ((0, 0), (0, d))), (0, d),
                             (nz, d + nr))
    return jax.lax.slice(jnp.pad(v, ((0, 0), (-d, 0))), (0, 0), (nz, nr))


def _shift_sublane(v: jnp.ndarray, d: int) -> jnp.ndarray:
    """out[i, :] = v[i+d, :], zeros shifted in — the sublane (major) axis
    twin of :func:`_shift_lane` for the z-direction PCR."""
    nz, nr = v.shape
    if d > 0:
        return jax.lax.slice(jnp.pad(v, ((0, d), (0, 0))), (d, 0),
                             (d + nz, nr))
    return jax.lax.slice(jnp.pad(v, ((-d, 0), (0, 0))), (0, 0), (nz, nr))


def _pcr_precond(pcr_ref, rr, n_levels: int, axis: int = -1):
    """Line block-Jacobi application from precomputed FOLDED PCR levels
    resident in VMEM (layout: rows 2k/2k+1 = the level-k rescaled lower /
    upper couplings, row 2·n_levels = the accumulated diagonal — see
    linesolve.pcr_fold): n_levels unrolled two-plane shifted multiply-add
    passes plus one final diagonal multiply (no reductions, no gathers).
    One factor plane fewer per level than the raw inv_a form — ~30% less
    factor traffic in the hot per-iteration path. ``axis=-1`` solves along
    r (lanes), ``axis=-2`` along z (sublanes)."""
    shift = _shift_lane if axis == -1 else _shift_sublane
    d = rr
    s = 1
    for k in range(n_levels):
        d = (d - pcr_ref[2 * k] * shift(d, -s)
             - pcr_ref[2 * k + 1] * shift(d, s))
        s *= 2
    return pcr_ref[2 * n_levels] * d


def _line_factor_into(C, sm, scr_ref, n_levels: int, axis: int = -1):
    """In-kernel PCR factorization of the line-tridiagonal part of the
    scaled operator sm·C·sm into VMEM scratch, in the FOLDED layout of
    :func:`_pcr_precond` / linesolve.pcr_fold ((2L+1, Nz, Nr): two
    rescaled coupling planes per level + the accumulated diagonal).
    ``axis=-1`` factors the r-lines (stencil offsets 3/4, lane shifts),
    ``axis=-2`` the z-lines (offsets 1/2, sublane shifts — the second
    stack of the split-additive ADI preconditioner). Costs ~n_levels
    shifted multiply-add passes — about three CG iterations' worth, once
    per solve, so per-config factoring in the batched sweep kernels is
    essentially free (no per-config VMEM residency, unlike passing
    precomputed factors)."""
    shift = _shift_lane if axis == -1 else _shift_sublane
    up_k, lo_k = (3, 4) if axis == -1 else (1, 2)
    u = sm * C[up_k] * shift(sm, 1)
    l = sm * C[lo_k] * shift(sm, -1)
    g = jnp.ones_like(l)
    s = 1
    for k in range(n_levels):
        alpha = 1.0 - l * shift(u, -s) - u * shift(l, s)
        inv_a = 1.0 / alpha
        ginv = 1.0 / jnp.where(g != 0, g, 1.0)
        scr_ref[2 * k] = l * shift(g, -s) * ginv
        scr_ref[2 * k + 1] = u * shift(g, s) * ginv
        l, u = (-l * shift(l, -s) * inv_a,
                -u * shift(u, s) * inv_a)
        g = inv_a * g
        s *= 2
    scr_ref[2 * n_levels] = g


def rline_levels(nr: int) -> int:
    """ceil(log2(nr)) — PCR level count covering an axis of length nr."""
    L = 0
    s = 1
    while s < nr:
        L += 1
        s *= 2
    return L


def rline_extra_planes(nr: int) -> int:
    """Solution-sized VMEM planes held by the folded r-line PCR factors
    (2 coupling planes per level + 1 accumulated diagonal) — feed to the
    ``extra_planes`` argument of :func:`fits_in_vmem`."""
    return 2 * rline_levels(nr) + 1


def adi_extra_planes(nz: int, nr: int) -> int:
    """VMEM planes held by BOTH folded PCR stacks of the split-additive
    ADI preconditioner (r-line + z-line)."""
    return rline_extra_planes(nr) + rline_extra_planes(nz)


def mgz_extra_planes(nz: int, nr: int, sweeps: int = 1) -> int:
    """VMEM planes held by the z-semicoarsened MG preconditioner: the
    fine r-line PCR stack (smoother), the embedded coarse PCR stack and
    the 4 aux planes (ops/mgz.py). ``sweeps > 1`` additionally loads the
    9-point embedded coarse stencil AND was measured to carry ~26 planes
    of register-allocator spill slots at flagship scale (142.59M of 128M
    physical — BENCHMARKS.md round-5 mgz notes), so the multi-sweep
    estimate includes that allowance and correctly rejects flagship-size
    problems."""
    extra = 2 * rline_extra_planes(nr) + 4
    if sweeps > 1:
        extra += 9 + 26
    return extra


def _merged_cg_loop(apply_op, precond, b, x, stop2, rr0, *, maxiter: int,
                    check_every: int, preconditioned: bool):
    """Chronopoulos–Gear (merged-dot) PCG loop body, shared by the
    single-problem and batched tolerance kernels.

    The standard recurrence serializes its two reductions: ⟨p, Ap⟩ must
    complete before the x/r update that feeds ⟨r, z⟩. This variant keeps
    q = A p as an extra vector and computes ALL per-iteration reductions
    (γ = ⟨r, u⟩, δ = ⟨w, u⟩, and ‖r‖² when preconditioned) back-to-back on
    freshly produced data — the VPU pipelines them instead of idling
    between two dependency chains. Cost: one extra AXPY (q) and one extra
    VMEM plane; measured ~4.5%/iteration on the plain kernel (round-2
    marginal-slope protocol) but 4.9% SLOWER end-to-end at the official
    rline-preconditioned point (round-4 interleaved A/B — see
    MERGED_DEFAULT), so it is an option, not the default.

    α is produced by the coupled recurrence α' = γ'/(δ − βγ'/α), which is
    algebraically identical to γ'/⟨p', A p'⟩ but rounds differently — the
    Krylov trajectory is tolerance-equal, not bitwise, to the standard
    kernel (stopping still tests the TRUE recurrence residual, so
    converged answers agree at solve tolerance). ``b`` here is the
    PRECOMPUTED initial residual r0 (callers have it already — recomputing
    it would cost one extra apply per solve, ~1-5% on warm-started
    solves)."""
    r = b
    u = precond(r)
    w = apply_op(u)
    gamma = jnp.sum(r * u)
    delta = jnp.sum(w * u)
    alpha = gamma / jnp.where(delta != 0, delta, 1.0)
    p = u
    q = w

    def cond(state):
        _x, _r, _p, _q, _al, _ga, rr, k = state
        return jnp.logical_and(k < maxiter, rr > stop2)

    def one_iter(_i, state):
        x, r, p, q, alpha, gamma, _rr = state
        x = x + alpha * p
        r = r - alpha * q
        u = precond(r)
        w = apply_op(u)
        gamma_new = jnp.sum(r * u)
        delta = jnp.sum(w * u)
        rr = jnp.sum(r * r) if preconditioned else gamma_new
        beta = gamma_new / jnp.where(gamma != 0, gamma, 1.0)
        denom = delta - beta * gamma_new / jnp.where(alpha != 0, alpha, 1.0)
        alpha = gamma_new / jnp.where(denom != 0, denom, 1.0)
        p = u + beta * p
        q = w + beta * q
        return (x, r, p, q, alpha, gamma_new, rr)

    def body(state):
        x, r, p, q, alpha, gamma, rr, k = state
        x, r, p, q, alpha, gamma, rr = jax.lax.fori_loop(
            0, check_every, one_iter, (x, r, p, q, alpha, gamma, rr))
        return (x, r, p, q, alpha, gamma, rr, k + check_every)

    state = (x, r, p, q, alpha, gamma, rr0, jnp.zeros((), jnp.int32))
    x, r, p, q, alpha, gamma, rr, k = jax.lax.while_loop(cond, body, state)
    return x, rr, k


def _cg_tol_kernel(A_ref, sm_ref, b_ref, x0_ref, rtol_ref, lmax_ref,
                   *rest, maxiter: int, rtol_wrt: str,
                   cheb_degree: int, pcr_levels: int,
                   pcr_z_levels: int = 0, merged: bool = False,
                   mgz_levels: int = 0, mgz_sweeps: int = 1,
                   mgz_omega: float = 0.8, mgz_omega_c: float = 0.8):
    """Whole tolerance-based CG solve in one kernel (while_loop on-chip).

    The operator is applied with ON-THE-FLY symmetric scaling,
    sm * (A @ (sm * y)), using the ORIGINAL stencil coefficients: baking the
    scaling into the coefficients (s_n A s_m rounded to f32) perturbs the
    operator enough to bias far-field traces by ~1 K — measured, not
    hypothetical. sm = rsqrt(diag) * free_mask, so constrained dofs are
    annihilated (their x stays at x0 because b and r vanish there).

    cheb_degree > 0 preconditions with a fixed degree-d Chebyshev
    polynomial in the scaled operator (eigenvalue target
    [0.08, 1.05]·λmax, λmax from the Gershgorin bound in lmax_ref):
    ~√d fewer iterations, amortizing the per-iteration reduction latency.

    pcr_levels > 0 preconditions with the r-line block-Jacobi PCR factors
    (passed as a folded (2L+1, Nz, Nr) VMEM operand, see pcr_pack) — the
    measured 6-8x iteration cut on DAC operators at ~3 applies' worth of
    reduction-free VPU work per application (BENCHMARKS.md).
    """
    rest = list(rest)
    pcr_ref = rest.pop(0) if pcr_levels > 0 else None
    pcrz_ref = rest.pop(0) if pcr_z_levels > 0 else None
    if mgz_levels > 0:
        # sweeps=1 needs no coarse operator at all (single damped line
        # solve from zero — no coarse residual), so the 9-plane embedded
        # stencil operand is dropped entirely
        mgz_ac9_ref = rest.pop(0) if mgz_sweeps > 1 else None
        mgz_pcrc_ref = rest.pop(0)
        mgz_aux_ref = rest.pop(0)
    x_ref, it_ref = rest
    sm = sm_ref[:]
    b = b_ref[:]
    x = x0_ref[:]

    def apply_op(y):
        return sm * _apply7(A_ref, sm * y)

    dtype = b.dtype
    if mgz_levels > 0:
        # z-semicoarsened 2-level MG over the rline smoother (V(1,1),
        # embedded coarse grid on even sublanes — ops/mgz.py docstring;
        # symmetric by construction: restriction = prolongation^T, damped
        # line-Jacobi pre/post smoothing, fixed-polynomial coarse solve)
        free = (sm != 0).astype(dtype)
        nz_, nr_ = b.shape
        from heatflow_tpu.ops.mgz import MGZ_OFFSETS

        def apply_c(y):
            up = jnp.pad(y, ((2, 2), (1, 1)))

            def sh2(dz, dr):
                return jax.lax.slice(up, (2 + dz, 1 + dr),
                                     (2 + dz + nz_, 1 + dr + nr_))

            out = mgz_ac9_ref[0] * y
            for k, (oz, orr) in enumerate(MGZ_OFFSETS[1:], start=1):
                out += mgz_ac9_ref[k] * sh2(oz, orr)
            return out

        def precond(rr):
            sc = mgz_aux_ref[0]
            pm = mgz_aux_ref[1]
            pp = mgz_aux_ref[2]
            e_free = mgz_aux_ref[3]
            # pre-smooth from zero: one damped fine r-line solve
            xv = mgz_omega * _pcr_precond(pcr_ref, rr, pcr_levels)
            r1 = rr - apply_op(xv)
            # restriction P^T (embedded; odd-row junk rows are inert)
            rc = (e_free * r1 + _shift_sublane(pp * r1, -1)
                  + _shift_sublane(pm * r1, 1))
            rcs = sc * rc
            # coarse: mgz_sweeps damped line-Jacobi sweeps on the scaled
            # embedded coarse operator (first sweep from zero; the sweep
            # loop is a fori_loop to keep Mosaic's register pressure —
            # and thus VMEM spill slots — down)
            yc = mgz_omega_c * _pcr_precond(mgz_pcrc_ref, rcs, mgz_levels)
            if mgz_sweeps > 1:
                yc = jax.lax.fori_loop(
                    0, mgz_sweeps - 1,
                    lambda _k, y: y + mgz_omega_c * _pcr_precond(
                        mgz_pcrc_ref, rcs - apply_c(y), mgz_levels),
                    yc)
            xc = sc * yc
            # prolongation
            xv = (xv + e_free * xc + pm * _shift_sublane(xc, -1)
                  + pp * _shift_sublane(xc, 1))
            # post-smooth
            xv = xv + mgz_omega * _pcr_precond(pcr_ref, rr - apply_op(xv),
                                               pcr_levels)
            return xv * free
    elif pcr_z_levels > 0:
        # split-additive ADI: R r + Z r − r (linesolve.adi_preconditioner)
        free = (sm != 0).astype(dtype)

        def precond(rr):
            return (_pcr_precond(pcr_ref, rr, pcr_levels)
                    + _pcr_precond(pcrz_ref, rr, pcr_z_levels, axis=-2)
                    - rr) * free
    elif pcr_levels > 0:
        free = (sm != 0).astype(dtype)

        def precond(rr):
            return _pcr_precond(pcr_ref, rr, pcr_levels) * free
    elif cheb_degree > 0:
        lmax = lmax_ref[0, 0]
        lo = 0.08 * lmax
        hi = 1.05 * lmax
        theta = 0.5 * (hi + lo)
        delta = 0.5 * (hi - lo)
        sigma = theta / delta

        def precond(rr):
            rho = 1.0 / sigma
            d = rr / theta
            z = d
            for _ in range(cheb_degree - 1):
                rho_new = 1.0 / (2.0 * sigma - rho)
                res = rr - apply_op(z)
                d = (rho_new * rho) * d + (2.0 * rho_new / delta) * res
                z = z + d
                rho = rho_new
            return z
    else:
        precond = lambda rr: rr

    preconditioned_any = cheb_degree > 0 or pcr_levels > 0 \
        or mgz_levels > 0
    if merged:
        r0v = b - apply_op(x)
        rr0 = jnp.sum(r0v * r0v)
        rtol = rtol_ref[0, 0]
        ref2 = rr0 if rtol_wrt == "r0" else jnp.sum(b * b)
        stop2 = rtol * rtol * ref2
        x, rr, k = _merged_cg_loop(apply_op, precond, r0v, x, stop2, rr0,
                                   maxiter=maxiter,
                                   check_every=CHECK_EVERY,
                                   preconditioned=preconditioned_any)
        x_ref[:] = jnp.where(jnp.isfinite(rr), x, jnp.nan)
        it_ref[0, 0] = k
        return

    r = b - apply_op(x)
    z = precond(r)
    p = z
    rz = jnp.sum(r * z)
    rr0 = jnp.sum(r * r)
    rtol = rtol_ref[0, 0]
    ref2 = rr0 if rtol_wrt == "r0" else jnp.sum(b * b)
    stop2 = rtol * rtol * ref2

    def cond(state):
        _x, _r, _p, _rz, rr, k = state
        return jnp.logical_and(k < maxiter, rr > stop2)

    def one_iter(_i, state):
        x, r, p, rz, _rr = state
        Ap = apply_op(p)
        pAp = jnp.sum(p * Ap)
        alpha = rz / jnp.where(pAp != 0, pAp, 1.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        p = z + beta * p
        rr = jnp.sum(r * r) if preconditioned_any else rz_new
        return (x, r, p, rz_new, rr)

    def body(state):
        x, r, p, rz, rr, k = state
        # CHECK_EVERY iterations per convergence check (any overshoot past
        # the tolerance is extra accuracy, never less)
        x, r, p, rz, rr = jax.lax.fori_loop(0, CHECK_EVERY, one_iter,
                                            (x, r, p, rz, rr))
        return (x, r, p, rz, rr, k + CHECK_EVERY)

    x, r, p, rz, rr, k = jax.lax.while_loop(
        cond, body, (x, r, p, rz, rr0, jnp.zeros((), jnp.int32)))
    # non-finite residual → the loop never ran: poison x so failures are
    # detectable downstream (same convention as ops/cg.pcg)
    x_ref[:] = jnp.where(jnp.isfinite(rr), x, jnp.nan)
    it_ref[0, 0] = k


MERGED_DEFAULT = False  # Chronopoulos–Gear merged-dot recurrence in the
                        # tolerance kernels. Round-2's marginal-slope
                        # protocol measured it +4.5%/iteration on the
                        # PLAIN kernel, but the round-4 interleaved A/B at
                        # the official point (rline PCR + f64_refine=1)
                        # measured it 4.9% SLOWER end-to-end (554.2 vs
                        # 582.8 steps/s best-of-4 — the PCR passes already
                        # fill the pipeline between reductions, and merged
                        # adds an extra AXPY + q plane + rr reduction), so
                        # the standard recurrence stays the default
                        # (BENCHMARKS.md "merged-dot A/B"). merged=False
                        # is also the exact pcg_fixed/XLA Krylov
                        # trajectory the cross-implementation equality
                        # tests pin; merged=True remains available and
                        # tested (tolerance-class equality).


def cg_vmem_tol(A: jnp.ndarray, sm: jnp.ndarray, b: jnp.ndarray,
                x0: jnp.ndarray, rtol: float | jnp.ndarray, *,
                maxiter: int = 4000, rtol_wrt: str = "r0",
                interpret: bool = False, cheb_degree: int = 0,
                pcr=None, pcr_z=None, merged: bool | None = None,
                mgz=None, mgz_sweeps: int = 1, mgz_omega: float = 0.8,
                mgz_omega_c: float = 0.8):
    """Tolerance-based VMEM-resident CG on the scaled-masked operator
    sm·A·sm. Returns (x, iters). b and x0 must vanish at constrained dofs;
    sm = rsqrt(diag(A)) * free. ``interpret=True`` runs the Pallas
    interpreter (CPU testing). ``cheb_degree>0`` preconditions with an
    in-kernel Chebyshev polynomial; ``pcr`` (a folded (2L+1, Nz, Nr) array
    of r-line PCR factors, see :func:`pcr_pack`) preconditions with the
    VMEM-resident r-line block-Jacobi solve — mutually exclusive with
    ``cheb_degree``. ``pcr_z`` (the z-axis folded stack,
    ``pcr_pack(..., axis=-2)``; requires ``pcr``) switches to the
    split-additive ADI preconditioner R r + Z r − r
    (linesolve.adi_preconditioner). Stopping is on the true residual in
    all cases. ``merged`` (default :data:`MERGED_DEFAULT`) selects the
    Chronopoulos–Gear merged-dot recurrence — tolerance-equal trajectory
    (measured slower at the official rline point, see MERGED_DEFAULT);
    ``merged=False`` is bitwise the
    standard recurrence. The default is resolved OUTSIDE the jitted core
    (merged=None must never be a jit cache key — a global flip would
    silently reuse the other variant's trace)."""
    if merged is None:
        merged = MERGED_DEFAULT
    return _cg_vmem_tol_jit(A, sm, b, x0, rtol, maxiter=maxiter,
                            rtol_wrt=rtol_wrt, interpret=interpret,
                            cheb_degree=cheb_degree, pcr=pcr, pcr_z=pcr_z,
                            merged=merged, mgz=mgz, mgz_sweeps=mgz_sweeps,
                            mgz_omega=mgz_omega, mgz_omega_c=mgz_omega_c)


@functools.partial(jax.jit,
                   static_argnames=("maxiter", "rtol_wrt", "interpret",
                                    "cheb_degree", "merged", "mgz_sweeps",
                                    "mgz_omega", "mgz_omega_c"))
def _cg_vmem_tol_jit(A, sm, b, x0, rtol, *, maxiter, rtol_wrt, interpret,
                     cheb_degree, pcr=None, pcr_z=None, merged=False,
                     mgz=None, mgz_sweeps=1, mgz_omega=0.8,
                     mgz_omega_c=0.8):
    nz, nr = b.shape
    rtol_arr = jnp.asarray(rtol, b.dtype).reshape(1, 1)
    pcr_levels = 0 if pcr is None else (int(pcr.shape[0]) - 1) // 2
    pcr_z_levels = 0 if pcr_z is None else (int(pcr_z.shape[0]) - 1) // 2
    mgz_levels = 0 if mgz is None else (int(mgz["pcrc"].shape[0]) - 1) // 2
    if pcr_levels and cheb_degree:
        raise ValueError("pcr and cheb_degree are mutually exclusive")
    if pcr_z_levels and not pcr_levels:
        raise ValueError("pcr_z (ADI) requires the r-line pcr stack too")
    if mgz_levels and not pcr_levels:
        raise ValueError("mgz (z-semicoarsened MG) uses the r-line pcr "
                         "stack as its smoother — pass pcr too")
    if mgz_levels and (pcr_z_levels or merged):
        raise ValueError("mgz is mutually exclusive with pcr_z/merged")
    if cheb_degree > 0:
        # Gershgorin bound of the scaled operator (sm >= 0, so absolute
        # row sums are one |A|-apply): λmax ≈ max_i Σ_j |Â_ij|
        lmax = jnp.max(sm * _xla_apply_abs(A, sm)).reshape(1, 1)
        lmax = lmax.astype(b.dtype)
    else:
        lmax = jnp.ones((1, 1), b.dtype)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    operands = [A, sm, b, x0, rtol_arr, lmax]
    in_specs = [vm, vm, vm, vm, smem, smem]
    if pcr_levels:
        operands.append(pcr)
        in_specs.append(vm)
    if pcr_z_levels:
        operands.append(pcr_z)
        in_specs.append(vm)
    if mgz_levels:
        operands += ([mgz["Ac9"]] if mgz_sweeps > 1 else []) \
            + [mgz["pcrc"], mgz["aux"]]
        in_specs += [vm] * (3 if mgz_sweeps > 1 else 2)
    x, it = pl.pallas_call(
        functools.partial(_cg_tol_kernel, maxiter=maxiter,
                          rtol_wrt=rtol_wrt, cheb_degree=cheb_degree,
                          pcr_levels=pcr_levels,
                          pcr_z_levels=pcr_z_levels, merged=merged,
                          mgz_levels=mgz_levels, mgz_sweeps=mgz_sweeps,
                          mgz_omega=mgz_omega, mgz_omega_c=mgz_omega_c),
        out_shape=(jax.ShapeDtypeStruct((nz, nr), b.dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)),
        in_specs=in_specs,
        out_specs=(vm, smem),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET),
        cost_estimate=pl.CostEstimate(
            flops=maxiter * 24 * nz * nr // 4,
            bytes_accessed=(8 + 3
                            + (2 * pcr_levels + 1 if pcr_levels else 0)
                            + (2 * pcr_z_levels + 1 if pcr_z_levels
                               else 0)
                            + (2 * mgz_levels + 14 if mgz_levels
                               else 0)) * nz * nr * 4,
            transcendentals=0),
        interpret=interpret,
    )(*operands)
    return x, it[0, 0]


def cg_vmem_solve(A: jnp.ndarray, sm: jnp.ndarray, b: jnp.ndarray,
                  x0: jnp.ndarray, rtol, *, maxiter: int = 4000,
                  rtol_wrt: str = "r0", interpret: bool = False,
                  pcr=None, pcr_z=None) -> jnp.ndarray:
    """Differentiable VMEM-resident CG via implicit differentiation.

    Wraps :func:`cg_vmem_tol` in ``lax.custom_linear_solve(symmetric=True)``
    — the VMEM twin of ``ops.cg.pcg_solve``: reverse-mode gradients cost one
    additional VMEM solve (the adjoint system) instead of unrolling the
    kernel's while_loop, which makes the fast engines (rline/adi PCR
    preconditioning included, via ``pcr``/``pcr_z``) available to
    gradient-based experimental fitting (drivers/fit.py; the reference's
    whole fitting story is brute-force scans, ref sweep_test.py:96-115).

    Same operator convention as ``cg_vmem_tol``: solves sm·A·sm y = b with
    b and x0 vanishing at constrained dofs, sm = rsqrt(diag(A))·free.
    Gradients flow through A, sm, b and x0 by the implicit-function
    theorem; the pcr factor stacks only steer the inner solves and are
    never differentiated (custom_linear_solve does not differentiate
    ``solve_fn``).

    The tangent/adjoint systems' rhs is derivative-scale: the seed is
    scaled by the ⟨rhs, b⟩/⟨b, b⟩ projection coefficient — exactly 1 for
    the primal call (bit-identical to seeding with x0), ≈0 for derivative
    calls, which then start near zero with an rhs-scale stop reference in
    both ``rtol_wrt`` modes (the same analysis as ``pcg_solve``)."""
    bb = jnp.sum(b * b)
    bb_safe = jnp.where(bb > 0, bb, 1.0)

    def solve_fn(_mv, rhs):
        c = jnp.sum(rhs * b) / bb_safe
        # The barriers keep the Pallas call OUT of the surrounding XLA
        # fusions. Under jax.linearize/grad the tangent scan saves full
        # per-step fields; without the barrier XLA fuses the kernel into
        # the (S, Nz, Nr) saved-primal stack write and the combined
        # fusion's scoped-VMEM demand (37.02M measured at the read_flux
        # flagship) busts the default ~34M limit — an AOT compile error,
        # not an OOM at run time (round-4 fit finding 2, fixed round 5).
        rhs_b = jax.lax.optimization_barrier(rhs)
        x, _it = cg_vmem_tol(A, sm, rhs_b, c * x0, rtol, maxiter=maxiter,
                             rtol_wrt=rtol_wrt, interpret=interpret,
                             pcr=pcr, pcr_z=pcr_z)
        return jax.lax.optimization_barrier(x)

    from heatflow_tpu.ops.stencil import apply_stencil
    op = lambda v: sm * apply_stencil(A, sm * v)
    return jax.lax.custom_linear_solve(op, b, solve_fn, symmetric=True)


def pcr_pack(A: jnp.ndarray, s: jnp.ndarray, free: jnp.ndarray,
             axis: int = -1) -> jnp.ndarray:
    """Precompute the FOLDED line-PCR factor stack for
    :func:`cg_vmem_tol`: (2L+1, Nz, Nr) — rows 2k/2k+1 are level k's
    rescaled lower/upper couplings, the last row the accumulated diagonal
    (linesolve.pcr_fold). ``axis=-1`` packs the r-line factors (the
    ``pcr`` operand), ``axis=-2`` the z-line factors (the ``pcr_z`` ADI
    operand). Runs at XLA level once per transient (the operator is
    constant across steps)."""
    from heatflow_tpu.ops.linesolve import (line_couplings, pcr_factor,
                                            pcr_fold)
    l, u = line_couplings(A, s * free, axis)
    levels2, g = pcr_fold(pcr_factor(l, u, axis=axis), axis=axis)
    return jnp.stack([p for lv in levels2 for p in lv] + [g])


def _xla_apply_abs(A, v):
    """|A| @ v at XLA level (λmax estimate runs once per solve, outside the
    kernel)."""
    from heatflow_tpu.ops.stencil import apply_stencil
    return apply_stencil(jnp.abs(A), v)


@functools.partial(jax.jit, static_argnames=("iters",))
def cg_vmem(C: jnp.ndarray, b: jnp.ndarray, x0: jnp.ndarray,
            *, iters: int = 64) -> jnp.ndarray:
    """Solve C x = b with ``iters`` CG iterations entirely in VMEM.

    C: (7, Nz, Nr) scaled/masked stencil; b, x0: (Nz, Nr).
    """
    nz, nr = b.shape
    flops = iters * (7 * 2 + 10) * nz * nr
    return pl.pallas_call(
        functools.partial(_cg_kernel, iters=iters),
        out_shape=jax.ShapeDtypeStruct((nz, nr), b.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=(7 + 3) * nz * nr * 4,
            transcendentals=0),
    )(C, b, x0)


def fits_in_vmem_batched(nz: int, nr: int, dtype=jnp.float32,
                         n_points: int = 7, rline: bool = False,
                         adi: bool = False) -> bool:
    """Working set of the batched sweep kernel: shared A0+K_var
    (2·n_points planes), the per-config combined operator (n_points), and
    ~6 solution-sized vectors; ``rline`` adds the in-kernel folded PCR
    scratch (2·ceil(log2(Nr))+1 planes — _line_factor_into), ``adi`` both
    line stacks (r + z)."""
    bytes_per = jnp.dtype(dtype).itemsize
    extra = rline_extra_planes(nr) if (rline or adi) else 0
    extra += rline_extra_planes(nz) if adi else 0
    return (3 * n_points + 6 + extra) * nz * nr * bytes_per < VMEM_BUDGET


def _sweep_cg_kernel(dk_ref, A0_ref, Kv_ref, sm_ref, b_ref, x0_ref, x_ref,
                     *, iters: int):
    """One grid step = the whole CG solve for one sweep config.

    The shared base stencils A0/K_var live in VMEM across all grid steps
    (their block index is constant, so Pallas keeps them resident); the
    per-config operator A0 + dk·K_var is combined on-chip, and the solve
    runs on the symmetrically-scaled system sm·A·sm (sm passed per config:
    rsqrt(diag)·free, so Dirichlet dofs are annihilated)."""
    b_idx = pl.program_id(0)
    dk = dk_ref[b_idx]
    C = A0_ref[:] + dk * Kv_ref[:]
    sm = sm_ref[0]
    b = b_ref[0]
    x = x0_ref[0]

    def apply_op(y):
        return sm * _apply7(C, sm * y)

    r = b - apply_op(x)
    p = r
    rz = jnp.sum(r * r)

    def body(_k, state):
        x, r, p, rz = state
        Ap = apply_op(p)
        pAp = jnp.sum(p * Ap)
        alpha = rz / jnp.where(pAp != 0, pAp, 1.0)
        x = x + alpha * p
        r = r - alpha * Ap
        rz_new = jnp.sum(r * r)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        p = r + beta * p
        return (x, r, p, rz_new)

    x, r, p, rz = jax.lax.fori_loop(0, iters, body, (x, r, p, rz))
    x_ref[0] = x


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def cg_vmem_batched(A0: jnp.ndarray, Kv: jnp.ndarray, dks: jnp.ndarray,
                    sm: jnp.ndarray, b: jnp.ndarray, x0: jnp.ndarray, *,
                    iters: int = 100, interpret: bool = False):
    """Batched per-config VMEM CG for the sweep engine (grid over configs).

    A0/Kv: (7, Nz, Nr) shared stencils; dks: (B,) per-config dt·Δκ;
    sm: (B, Nz, Nr) per-config rsqrt(diag)·free; b/x0: (B, Nz, Nr) scaled
    RHS / initial guess (must vanish at constrained dofs). Returns x with
    the same trajectory as ``pcg_fixed`` on sm·(A0+dk·Kv)·sm.
    """
    B, nz, nr = b.shape
    npts = A0.shape[0]
    per_cfg = pl.BlockSpec((1, nz, nr), _imap_cfg,
                           memory_space=pltpu.VMEM)
    shared = pl.BlockSpec((npts, nz, nr), _imap_shared,
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_sweep_cg_kernel, iters=iters),
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, nz, nr), b.dtype),
        in_specs=[_smem_whole(dks.shape),
                  shared, shared, per_cfg, per_cfg, per_cfg],
        out_specs=per_cfg,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET),
        cost_estimate=pl.CostEstimate(
            flops=B * iters * 24 * nz * nr,
            bytes_accessed=(14 + 4 * B) * nz * nr * 4,
            transcendentals=0),
        interpret=interpret,
    )(dks, A0, Kv, sm, b, x0)


def _sweep_cg_tol_kernel(dk_ref, rtol_ref, A0_ref, *rest, maxiter: int,
                         rtol_wrt: str, rline: bool = False,
                         adi: bool = False, has_kv: bool = True,
                         merged: bool = False, adaptive: bool = False):
    """Tolerance-based per-config solve for the sweep engine: one grid step
    combines this config's operator on-chip and runs the whole while_loop CG
    (stopping rule identical to ops.cg.pcg: ||r|| <= rtol·||b|| for 'b',
    ·||r0|| for 'r0'; convergence checked every CHECK_EVERY iterations, so
    iteration counts can exceed the XLA path's by up to CHECK_EVERY-1 —
    free extra accuracy, never less).

    ``rline``: precondition with the r-line block-Jacobi PCR solve,
    factored in-kernel per config into scratch (measured 4-7x iteration
    cut on DAC operators — ops/linesolve.py). ``adi``: the split-additive
    r-line + z-line composition R r + Z r − r (linesolve.adi_preconditioner)
    with BOTH stacks factored in-kernel — the deep-solve regime's
    preconditioner (BENCHMARKS.md ADI regime map).

    ``has_kv=False``: no varying-coefficient stencil (e.g. the recording
    engine's per-step mass projection, whose operator is config-independent)
    — the Kv operand is dropped and the solve runs on A0 directly, saving
    its n_points VMEM planes and HBM streaming per call.

    ``adaptive``: per-config rline/adi switch — a (B,) int32 flags operand
    (inserted after rtol) selects, per grid step, the split-additive ADI
    composition (flag != 0: both stacks factored, deep-solve regime) or
    the plain r-line solve (z factorization skipped via ``pl.when``, its
    per-iteration phase skipped via ``lax.cond``) — the batched twin of
    the single-problem per-step switch (stepper precondition='adaptive'),
    driven by the previous step's per-lane iteration counts."""
    b_idx = pl.program_id(0)
    if adaptive:
        flags_ref, *rest = rest
        use_adi = flags_ref[b_idx] != 0
    if has_kv:
        Kv_ref, sm_ref, b_ref, x0_ref, x_ref, it_ref, *rest = rest
        C = A0_ref[:] + dk_ref[b_idx] * Kv_ref[:]
    else:
        sm_ref, b_ref, x0_ref, x_ref, it_ref, *rest = rest
        C = A0_ref[:]
    sm = sm_ref[0]
    b = b_ref[0]
    x = x0_ref[0]
    preconditioned = rline or adi or adaptive

    def apply_op(y):
        return sm * _apply7(C, sm * y)

    if adaptive:
        scr_r, scr_z = rest
        n_r = (scr_r.shape[0] - 1) // 2
        n_z = (scr_z.shape[0] - 1) // 2
        _line_factor_into(C, sm, scr_r, n_r, axis=-1)

        @pl.when(use_adi)
        def _():
            _line_factor_into(C, sm, scr_z, n_z, axis=-2)

        def precond(rr):
            return jax.lax.cond(
                use_adi,
                lambda r: (_pcr_precond(scr_r, r, n_r)
                           + _pcr_precond(scr_z, r, n_z, axis=-2) - r),
                lambda r: _pcr_precond(scr_r, r, n_r),
                rr)
    elif adi:
        scr_r, scr_z = rest
        n_r = (scr_r.shape[0] - 1) // 2
        n_z = (scr_z.shape[0] - 1) // 2
        _line_factor_into(C, sm, scr_r, n_r, axis=-1)
        _line_factor_into(C, sm, scr_z, n_z, axis=-2)
        # r is identically zero on Dirichlet rows (b, x0 scaled by sm), so
        # the unmasked R r + Z r − r equals the masked XLA composition
        precond = lambda rr: (_pcr_precond(scr_r, rr, n_r)
                              + _pcr_precond(scr_z, rr, n_z, axis=-2) - rr)
    elif rline:
        (scr_ref,) = rest
        n_lv = (scr_ref.shape[0] - 1) // 2
        _line_factor_into(C, sm, scr_ref, n_lv)
        precond = lambda rr: _pcr_precond(scr_ref, rr, n_lv)
    else:
        precond = lambda rr: rr

    if merged:
        r0v = b - apply_op(x)
        rr0 = jnp.sum(r0v * r0v)
        rtol = rtol_ref[b_idx, 0]
        ref2 = rr0 if rtol_wrt == "r0" else jnp.sum(b * b)
        stop2 = rtol * rtol * ref2
        x, rr, k = _merged_cg_loop(apply_op, precond, r0v, x, stop2, rr0,
                                   maxiter=maxiter,
                                   check_every=CHECK_EVERY,
                                   preconditioned=preconditioned)
        x_ref[0] = jnp.where(jnp.isfinite(rr), x, jnp.nan)
        it_ref[b_idx] = k
        return

    r = b - apply_op(x)
    z = precond(r)
    p = z
    rz = jnp.sum(r * z)
    rr = jnp.sum(r * r) if preconditioned else rz
    rtol = rtol_ref[b_idx, 0]
    ref2 = rr if rtol_wrt == "r0" else jnp.sum(b * b)
    stop2 = rtol * rtol * ref2

    def cond(state):
        _x, _r, _p, _rz, _rr, k = state
        return jnp.logical_and(k < maxiter, _rr > stop2)

    def one_iter(_i, state):
        x, r, p, rz, _rr = state
        Ap = apply_op(p)
        pAp = jnp.sum(p * Ap)
        alpha = rz / jnp.where(pAp != 0, pAp, 1.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        p = z + beta * p
        rr = jnp.sum(r * r) if preconditioned else rz_new
        return (x, r, p, rz_new, rr)

    def body(state):
        x, r, p, rz, rr, k = state
        x, r, p, rz, rr = jax.lax.fori_loop(0, CHECK_EVERY, one_iter,
                                            (x, r, p, rz, rr))
        return (x, r, p, rz, rr, k + CHECK_EVERY)

    x, r, p, rz, rr, k = jax.lax.while_loop(
        cond, body, (x, r, p, rz, rr, jnp.zeros((), jnp.int32)))
    # poison on non-finite residual (see ops/cg.pcg) — a NaN-parameter
    # config must surface in failed_runs.csv, not return finite garbage
    x_ref[0] = jnp.where(jnp.isfinite(rr), x, jnp.nan)
    it_ref[b_idx] = k     # whole (B,) SMEM buffer, persists across steps


def cg_vmem_batched_tol(A0: jnp.ndarray, Kv: jnp.ndarray, dks: jnp.ndarray,
                        sm: jnp.ndarray, b: jnp.ndarray, x0: jnp.ndarray,
                        rtol: float | jnp.ndarray, *, maxiter: int = 4000,
                        rtol_wrt: str = "b", interpret: bool = False,
                        rline: bool = False, adi: bool = False,
                        merged: bool | None = None, adi_flags=None):
    """Tolerance-based batched per-config VMEM CG (grid over configs).

    Same operator convention as ``cg_vmem_batched`` but each config runs to
    ||r|| <= rtol·||b|| (or ·||r0||) instead of a fixed budget — converged
    accuracy at VMEM speed, the sweep twin of ``cg_vmem_tol``. Returns
    (x (B, Nz, Nr), iters (B,) int32). ``rline=True`` preconditions each
    config's solve with the r-line PCR block-Jacobi, factored in-kernel
    into scratch VMEM (see _line_factor_into); ``adi=True`` with the
    split-additive r-line + z-line composition (both stacks in-kernel).
    adi is for the increment-relative ('r0') and deep-solve regimes where
    the single-problem kernel measured +27-69% (BENCHMARKS.md ADI regime
    map); at LOOSE wrt-'b' tolerances its loosely-stopped iterates carry
    ~20x the solution error of jacobi/rline at the same ||r|| threshold
    (the split composition is only SPD-in-practice, and its early
    iterates distribute error into low modes — measured on the tiny
    sweep protocol), so keep wrt-'b' sweeps on jacobi/rline.
    """
    if rline and adi:
        raise ValueError("rline and adi are mutually exclusive (adi "
                         "already contains the r-line stack)")
    if adi_flags is not None and (rline or adi):
        raise ValueError("adi_flags (the per-config adaptive rline/adi "
                         "switch) replaces the static rline/adi flags")
    if merged is None:
        # resolved OUTSIDE the jitted core (see cg_vmem_tol)
        merged = MERGED_DEFAULT
    return _cg_vmem_batched_tol_jit(A0, Kv, dks, sm, b, x0, rtol,
                                    maxiter=maxiter, rtol_wrt=rtol_wrt,
                                    interpret=interpret, rline=rline,
                                    adi=adi, merged=merged,
                                    adi_flags=adi_flags)


@functools.partial(jax.jit, static_argnames=("maxiter", "rtol_wrt",
                                             "interpret", "rline", "adi",
                                             "merged"))
def _cg_vmem_batched_tol_jit(A0, Kv, dks, sm, b, x0, rtol, *, maxiter,
                             rtol_wrt, interpret, rline, adi, merged,
                             adi_flags=None):
    B, nz, nr = b.shape
    npts = A0.shape[0]
    # scalar rtol or per-config (B,) — e.g. the f64-refine degenerate-lane
    # guard stops an already-converged lane at its first residual check
    rtol_arr = jnp.broadcast_to(
        jnp.asarray(rtol, b.dtype).reshape(-1, 1), (B, 1))
    per_cfg = pl.BlockSpec((1, nz, nr), _imap_cfg,
                           memory_space=pltpu.VMEM)
    shared = pl.BlockSpec((npts, nz, nr), _imap_shared,
                          memory_space=pltpu.VMEM)
    adaptive = adi_flags is not None
    if adi or adaptive:
        scratch = [pltpu.VMEM((rline_extra_planes(nr), nz, nr), b.dtype),
                   pltpu.VMEM((rline_extra_planes(nz), nz, nr), b.dtype)]
    elif rline:
        scratch = [pltpu.VMEM((rline_extra_planes(nr), nz, nr), b.dtype)]
    else:
        scratch = []
    # Kv=None: config-independent operator (e.g. the recording engine's
    # mass projection) — drop the varying stencil operand entirely instead
    # of streaming npts zero planes into VMEM every call
    kv_ops, kv_specs = ((), ()) if Kv is None else ((Kv,), (shared,))
    fl_ops, fl_specs = ((), ())
    if adaptive:
        flags = jnp.asarray(adi_flags, jnp.int32)
        fl_ops, fl_specs = (flags,), (_smem_whole(flags.shape),)
    x, it = pl.pallas_call(
        functools.partial(_sweep_cg_tol_kernel, maxiter=maxiter,
                          rtol_wrt=rtol_wrt, rline=rline, adi=adi,
                          has_kv=Kv is not None, merged=merged,
                          adaptive=adaptive),
        grid=(B,),
        out_shape=(jax.ShapeDtypeStruct((B, nz, nr), b.dtype),
                   jax.ShapeDtypeStruct((B,), jnp.int32)),
        in_specs=[_smem_whole(dks.shape),
                  _smem_whole(rtol_arr.shape),
                  shared, *fl_specs, *kv_specs, per_cfg, per_cfg, per_cfg],
        out_specs=(per_cfg,
                   _smem_whole((B,))),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET),
        cost_estimate=pl.CostEstimate(
            flops=B * maxiter * 24 * nz * nr // 4,
            # per-config traffic: ~4 solution planes plus the PCR scratch
            # planes the per-iteration _pcr_precond passes read when
            # preconditioned (rline: the r stack; adi: both stacks)
            bytes_accessed=(14 + (4 + (rline_extra_planes(nr)
                                       if (rline or adi or adaptive)
                                       else 0)
                                  + (rline_extra_planes(nz)
                                     if (adi or adaptive) else 0))
                            * B) * nz * nr * 4,
            transcendentals=0),
        interpret=interpret,
    )(dks, rtol_arr, A0, *fl_ops, *kv_ops, sm, b, x0)
    return x, it


def masked_scaled_operator(A: jnp.ndarray, free: jnp.ndarray):
    """Prepare the kernel's operator: symmetric Jacobi scaling + exact
    Dirichlet row/column elimination baked into the coefficients.

    Returns (C, s) where C is the scaled/masked stencil (identity rows at
    constrained nodes) and s the scaling vector; solve C y = s*(b - A g),
    then u = s*y*free + g.
    """
    from heatflow_tpu.ops.stencil import OFFSETS, _shifted

    diag = A[..., 0, :, :]
    s = jax.lax.rsqrt(jnp.where(diag > 0, diag, 1.0)) * free + (1.0 - free)
    C = A * (s * free)[..., None, :, :]
    parts = [C[..., 0, :, :] * s * free + (1.0 - free)]
    for k, (di, dj) in enumerate(OFFSETS[1:], start=1):
        parts.append(C[..., k, :, :] * _shifted(s * free, di, dj))
    return jnp.stack(parts, axis=-3), s
