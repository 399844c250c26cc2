"""Backward-Euler transient stepper as a jitted ``lax.scan``.

The reference's hot loop (run_no_diamond.py:529-589) does, per step: update
the heating BC (a per-DOF Python loop), re-assemble the RHS, a MUMPS
back-substitution, a second assembled+solved r-weighted L2 gradient
projection, then host-side sampling of watcher points and radial bands.

Here the whole time loop is a single ``lax.scan`` on device:
  * BC values: one ``jnp.interp`` + a precomputed Gaussian profile;
  * RHS: one stencil application (M_op @ u_n), Dirichlet lifting is a second
    stencil application (A @ g);
  * solve: Jacobi-preconditioned CG on the masked stencil operator;
  * gradient projection: stencil rhs (G_r @ u) + mass-matrix CG warm-started
    from the previous step;
  * watcher traces / band averages / axis profiles accumulated as scan
    outputs — zero host synchronization inside the loop.

The returned simulate function is differentiable and vmappable over material
parameters — the foundation of the sweep engine.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from heatflow_tpu.ops.cg import (CGResult, pcg, pcg_fixed,
                                 refine_inner_scale, refine_inner_seed)
from heatflow_tpu.ops.stencil import apply_stencil, combine_operator
from heatflow_tpu.sim.problem import Problem2D


@dataclass
class TransientResult:
    times: np.ndarray                 # (S,)
    watcher: np.ndarray | None        # (S, W)
    watcher_names: list[str]
    band_rows: np.ndarray | None      # (S, n_bins) z-binned band-avg ∂T/∂r
    band_centers: np.ndarray | None   # (n_bins,)
    axis_rows: np.ndarray | None      # (S, Nz) raw ∂T/∂r at r=0 nodes
    axis_z: np.ndarray | None         # (Nz,)
    fields: np.ndarray | None         # (S, Nz, Nr) if recorded
    final_u: np.ndarray               # (Nz, Nr)
    cg_iters: np.ndarray              # (S,)
    proj_iters: np.ndarray | None     # (S,)


def make_simulate_fn(problem: Problem2D,
                     *,
                     dtype=jnp.float64,
                     rtol: float = 1e-11,
                     maxiter: int = 20000,
                     fixed_iters: int | None = None,
                     proj_rtol: float = 1e-11,
                     proj_maxiter: int = 400,
                     record_gradient: bool = True,
                     record_fields: bool = False,
                     precondition: str = "jacobi",
                     rtol_wrt: str = "r0",
                     solver: str = "xla",
                     vmem_cheb_degree: int = 0,
                     mgz_sweeps: int = 1,
                     warm_start: str = "previous",
                     mesh=None,
                     f64_refine: int = 0,
                     inner_seed: str = "zero",
                     adaptive_thresh: int = 100) -> Callable:
    """Build a jittable simulate(kappas, rho_cvs, fwhm) -> dict of traces.

    ``f64_refine``: mixed-precision iterative refinement (dtype must be
    float32). Each step's solve becomes N passes of: compute the residual
    against the **f64** operator (XLA f64 emulation on TPU — one f64
    stencil apply per pass), solve the f32 correction system to ``rtol``
    with the configured f32 engine (VMEM/rline at full speed), accumulate
    the update in f64. The state is carried in f64 across the scan. This
    breaks the f32 operator-representation trace floor (~0.11 K on the
    flagship, BENCHMARKS.md): the converged answer is the f64 operator's
    solution, reached at f32 solve speed plus ~N f64 applies per step —
    measured 0.007 K peak o-side error at 249 steps/s with
    ``f64_refine=2, rtol=1e-3`` vs 3.4 steps/s for the all-f64 path.
    Requires ``jax_enable_x64`` (the f64 outer would silently round
    otherwise).

    ``mesh``: a ``jax.sharding.Mesh`` with a 'z' axis — shard THIS single
    problem's fields and stencils along z over the devices (GSPMD inserts
    the halo exchanges at shard boundaries; SURVEY §2.3 item 2's TPU
    equivalent for problems too big for one chip). Requires Nz divisible
    by the 'z' axis size and the XLA solver path (the VMEM kernel keeps
    whole problems on one chip by design).

    All arguments default to the problem's own material values, so
    ``simulate()`` runs the configured problem; passing arrays makes it a
    sweep kernel (vmap over any of the three).

    warm_start: 'previous' seeds each step's CG with u_{n} (the reference's
    implicit-in-time structure has no analogue — MUMPS solves exactly);
    'extrapolate' seeds with the linear time extrapolation 2·u_n − u_{n−1},
    which halves-or-better the initial residual on smooth transients;
    'extrapolate2' seeds with the quadratic 3·u_n − 3·u_{n−1} + u_{n−2}
    (one more field in the scan carry; see BENCHMARKS.md for where each
    order wins). With
    ``rtol_wrt='r0'`` the stop threshold is tied to the (now smaller)
    initial residual, so the same rtol buys strictly better absolute
    accuracy; the speed win comes from loosening rtol back to the matched
    trace-accuracy point (measured in BENCHMARKS.md).

    inner_seed (refined path only): 'zero' starts each pass's correction
    CG from 0 (official); 'carry' seeds it with the previous step's
    correction for the same pass — measured dominated by the zero-seed
    rtol frontier on TPU (BENCHMARKS.md measured-negative #5), kept as a
    tested option.

    precondition='adaptive' (VMEM path only): per-step rline/adi switch —
    each step runs the rline kernel unless the PREVIOUS step's iteration
    count exceeded ``adaptive_thresh``, in which case the step runs the
    split-additive ADI kernel (both PCR stacks are factored once per
    transient; lax.cond selects the kernel). Rationale: ADI's z phase
    pays only on deep solves (the ~1.3x break-even cut, BENCHMARKS.md
    "ADI regime map"), which cluster at the cold start and heating-curve
    kinks where the previous step's count is an accurate one-step-lagged
    depth predictor. Threshold default 100: the interleaved flagship
    A/B measured 608-614 steps/s at 100 vs 597.7 at 150 vs 582.3 for
    static rline and 554.6 for static adi (round 4, BENCHMARKS.md
    "adaptive rline/adi switch") — the round-3 verdict's stretch item,
    promoted to the official bench recipe.

    Memoized per problem (problem.extras) keyed by every argument: repeated
    calls with identical parameters return the same compiled callable
    instead of re-tracing (same convention as sweepkernel.make_sweep_fn).
    """
    if f64_refine:
        # the refined inner correction solves stop wrt their own rhs (the
        # per-pass f64 residual — increment-relative by construction), so
        # the outer rtol_wrt has no effect; normalize it out of the key
        rtol_wrt = "b"
    if inner_seed not in ("zero", "carry"):
        raise ValueError(f"unknown inner_seed {inner_seed!r}")
    if not f64_refine:
        inner_seed = "zero"  # only meaningful for the refined inner solves
    cache_key = ("simulate_fn", jnp.dtype(dtype).name, rtol, maxiter,
                 fixed_iters, proj_rtol, proj_maxiter, record_gradient,
                 record_fields, precondition, rtol_wrt, solver,
                 vmem_cheb_degree, warm_start, mesh, f64_refine, inner_seed,
                 adaptive_thresh if precondition == "adaptive" else None,
                 mgz_sweeps if precondition == "mgz" else None)
    cache = problem.extras.setdefault("_fn_cache", {})
    if cache_key in cache:
        return cache[cache_key]
    if warm_start not in ("previous", "extrapolate", "extrapolate2"):
        raise ValueError(f"unknown warm_start {warm_start!r}")
    if precondition not in ("jacobi", "mg", "rline", "zline", "adi",
                            "adaptive", "mgz"):
        raise ValueError(f"unknown precondition {precondition!r}")
    if f64_refine:
        if jnp.dtype(dtype) != jnp.float32:
            raise ValueError("f64_refine is the mixed-precision mode: "
                             "dtype must be float32 (the all-f64 path needs "
                             "no refinement)")
        if not jax.config.jax_enable_x64:
            raise ValueError("f64_refine needs jax_enable_x64=True — "
                             "without it the f64 outer residual silently "
                             "rounds to f32 and the refinement is a no-op")
        if fixed_iters is not None or vmem_cheb_degree or mesh is not None \
                or precondition == "mg":
            raise ValueError("f64_refine composes with the tolerance-based "
                             "jacobi/line (rline/zline/adi) solvers on one "
                             "chip (no fixed_iters / cheb / mg / mesh)")
    # state/operator compute dtype: f64 when refining, else the run dtype
    cdt = jnp.float64 if f64_refine else dtype
    dev = problem.device_arrays(cdt)
    num_steps = int(problem.num_steps)
    dt = jnp.asarray(problem.dt, cdt)
    ic = jnp.asarray(problem.ic_temp, cdt)
    nz, nr = problem.mesh.shape
    has_watch = "watch_flat" in dev
    has_radial = problem.radial is not None and record_gradient
    n_bins = len(problem.radial.bin_counts) if has_radial else 0

    use_vmem = False
    if solver in ("vmem", "auto"):
        from heatflow_tpu.ops.pallas_cg import (adi_extra_planes,
                                                fits_in_vmem,
                                                rline_extra_planes)
        from heatflow_tpu.ops.pallas_cg import mgz_extra_planes
        extra = (rline_extra_planes(nr) if precondition == "rline"
                 else adi_extra_planes(nz, nr)
                 if precondition in ("adi", "adaptive")
                 else mgz_extra_planes(nz, nr, mgz_sweeps)
                 if precondition == "mgz"
                 else 0)
        use_vmem = fits_in_vmem(nz, nr, dtype, extra_planes=extra)
    if solver == "vmem" and not use_vmem:
        raise ValueError(
            f"problem ({nz}x{nr}, {dtype}) exceeds the VMEM budget; "
            "use solver='xla'")
    if solver == "auto" and (jax.default_backend() != "tpu"
                             or jnp.dtype(dtype) != jnp.float32):
        use_vmem = False  # the Pallas kernel is TPU-only, f32-only
    if mesh is not None:
        # z-sharding resolves 'auto' to the XLA path — BEFORE the
        # vmem-only preconditioner validations below, so adaptive/mgz
        # under z-sharding get their clean ValueError instead of slipping
        # through with a stale use_vmem=True (round-5 review finding)
        if solver == "vmem":
            raise ValueError("z-sharding a single problem runs the XLA "
                             "solver path (the VMEM kernel keeps whole "
                             "problems on one chip); use solver='xla'")
        use_vmem = False  # 'auto' under z-sharding resolves to XLA
        if "z" not in mesh.axis_names:
            raise ValueError("make_simulate_fn(mesh=...) needs a 'z' axis")
        if nz % mesh.shape["z"] != 0:
            raise ValueError(f"Nz={nz} not divisible by the 'z' axis size "
                             f"{mesh.shape['z']}")
    if use_vmem and precondition in ("zline", "mg"):
        # only 'rline' has an in-kernel PCR; the VMEM solve would silently
        # drop a zline/mg preconditioner — route them to the XLA path
        if solver == "vmem":
            raise ValueError(f"precondition={precondition!r} is not "
                             "available in the VMEM kernel (only 'rline' "
                             "has an in-kernel PCR); use solver='xla'")
        use_vmem = False
    if precondition == "adaptive" and vmem_cheb_degree:
        # the lax.cond rline/adi branches run the plain (non-Chebyshev)
        # kernels — a cheb degree would be silently dropped (same class of
        # validation as the zline/mg rejection above)
        raise ValueError("vmem_cheb_degree is not available with "
                         "precondition='adaptive' (the per-step rline/adi "
                         "branches run the plain kernels); use a static "
                         "precondition with cheb, or drop the degree")
    if precondition == "adaptive" and not use_vmem:
        # the per-step rline/adi switch exists only as the two VMEM kernel
        # variants under lax.cond — there is no XLA fallback to silently
        # degrade to
        raise ValueError("precondition='adaptive' (per-step rline/adi "
                         "switch) requires the VMEM solver path (TPU f32 "
                         "within the VMEM budget, or interpret-mode tests)")
    if precondition == "mgz":
        if not use_vmem:
            raise ValueError("precondition='mgz' (in-kernel z-semicoarsened "
                             "MG over the rline smoother) requires the VMEM "
                             "solver path (TPU f32 within the VMEM budget, "
                             "or interpret-mode tests)")
        if vmem_cheb_degree:
            raise ValueError("vmem_cheb_degree does not compose with "
                             "precondition='mgz'")
    mg_host = None
    mg_shapes = None
    if precondition == "mg":
        from heatflow_tpu.ops.multigrid import build_hierarchy, device_levels
        hierarchy = build_hierarchy(problem.mesh, problem.dirichlet_mask,
                                    stencils=problem.stencils)
        full = device_levels(hierarchy, dtype)
        # grid shapes are static metadata — keep them OUT of the jit-argument
        # pytree (they must not become tracers)
        mg_shapes = [lv.pop("shape") for lv in full]
        mg_host = full
    elif precondition == "mgz":
        # z-semicoarsened MG operands, built ONCE at maker time with scipy
        # RAP from the problem's DEFAULT coefficients (the same maker-time
        # convention as ops/multigrid.build_hierarchy) and threaded through
        # the mg_host jit-argument slot. simulate() therefore rejects
        # runtime kappa/rho_cv overrides under 'mgz' — the baked coarse
        # operator would silently mismatch the solved system's.
        from heatflow_tpu.ops.mgz import mgz_pack
        st = problem.stencils
        A7_np = (np.einsum("m,mkij->kij", problem.rho_cvs, st.M)
                 + float(problem.dt)
                 * np.einsum("m,mkij->kij", problem.kappas, st.K))
        free_np = np.asarray(problem.free_mask, np.float64)
        diag_np = A7_np[0]
        s_np = np.where(free_np > 0,
                        1.0 / np.sqrt(np.where(diag_np > 0, diag_np, 1.0)),
                        1.0)
        mg_host = {k: jnp.asarray(v) for k, v in
                   mgz_pack(A7_np, s_np, free_np, dtype).items()}

    field_sh = None
    if mesh is not None:
        # Commit every problem array to its z-sharded (or replicated)
        # placement once; jit then propagates the shardings through the
        # whole scan and GSPMD inserts the halo exchanges at the stencil
        # shifts (same spec logic as make_sweep_fn's z axis).
        from jax.sharding import NamedSharding, PartitionSpec as P

        def _zspec(x):
            nd = jnp.ndim(x)
            if nd == 4:                        # (n_mats, 7|9, Nz, Nr)
                return P(None, None, "z", None)
            if nd == 3:                        # (7|9, Nz, Nr)
                return P(None, "z", None)
            if nd == 2 and x.shape[0] % mesh.shape["z"] == 0:
                return P("z", None)            # (Nz, Nr) fields/masks
            return P()                         # curves, watcher ids

        _place = lambda x: jax.device_put(
            x, NamedSharding(mesh, _zspec(x)))
        dev = jax.tree.map(_place, dev)
        if mg_host is not None:
            def _lv_place(lv, nz_l):
                ok = nz_l % mesh.shape["z"] == 0

                def spec(x):
                    if not ok:
                        return P()            # odd coarse level: replicate
                    return _zspec(x)

                return jax.tree.map(lambda x: jax.device_put(
                    x, NamedSharding(mesh, spec(x))), lv)
            mg_host = [_lv_place(lv, shp[0])
                       for lv, shp in zip(mg_host, mg_shapes)]
        field_sh = NamedSharding(mesh, P("z", None))

    # NOTE: the large arrays (stencils, masks) enter the jitted core as
    # ARGUMENTS, not closure constants — closed-over arrays get baked into
    # the jaxpr and trigger minutes of XLA constant folding on big meshes.
    def _core(dev, mg_levels, kp, rc, fw, u0, t0, source):
        K, M = dev["K"], dev["M"]
        G_r, M_proj = dev["G_r"], dev["M_proj"]
        free = dev["free"]
        dirich = dev["dirichlet"]
        base = dev["heat_profile_base"]
        r_sq = dev["r_sq"]
        heat_t, heat_T = dev["heat_t"], dev["heat_T"]
        amp_offset = heat_T[0] - ic  # ref run_no_diamond.py:299-301

        # Symmetrically scaled mass solve for the gradient projection:
        # operator entries span ~15 decades (r-weight × h² factors), so CG
        # runs on D^{-1/2} A D^{-1/2} — unit diagonal, f32-safe.
        s_mp = jax.lax.rsqrt(jnp.where(M_proj[0] > 0, M_proj[0], 1.0))
        apply_Mp_s = lambda y: s_mp * apply_stencil(M_proj, s_mp * y)

        A, M_op = combine_operator(K, M, kp, rc, dt)
        diag_a = A[..., 0, :, :]
        # Symmetric Jacobi scaling (≡ Jacobi preconditioning in exact
        # arithmetic, numerically far better at low precision).
        s = jax.lax.rsqrt(jnp.where(diag_a > 0, diag_a, 1.0)) * free \
            + dirich
        apply_A_s = lambda y: s * apply_stencil(A, s * y)

        sm_vmem = s * free if use_vmem else None

        pre = None
        pcr_stack = None
        pcr_z_stack = None
        if precondition == "adaptive" and not f64_refine:
            # both stacks resident; the per-step switch picks which rhs
            # phases run (pcr_z only on deep solves — see the step fn)
            from heatflow_tpu.ops.pallas_cg import pcr_pack
            pcr_stack = pcr_pack(A, s, free)
            pcr_z_stack = pcr_pack(A, s, free, axis=-2)
        if precondition == "mgz" and not f64_refine:
            # fine r-line stack = the V-cycle's smoother; the coarse/
            # transfer operands arrive pre-built via mg_levels (maker-time
            # scipy RAP from the problem's default coefficients)
            from heatflow_tpu.ops.pallas_cg import pcr_pack
            pcr_stack = pcr_pack(A, s, free)
        if precondition in ("rline", "zline", "adi") and not f64_refine:
            # line block-Jacobi on the scaled system via precomputed PCR
            # (the operator is constant over the transient, so the
            # factorization runs once, outside the scan; each application
            # is ~log2(N) shifted multiply-add passes).  'rline' is the
            # measured winner on the DAC operator; 'adi' adds the z-line
            # solve split-additively (R r + Z r − r) — see ops/linesolve.py.
            if use_vmem and precondition in ("rline", "adi"):
                from heatflow_tpu.ops.pallas_cg import pcr_pack
                pcr_stack = pcr_pack(A, s, free)
                if precondition == "adi":
                    pcr_z_stack = pcr_pack(A, s, free, axis=-2)
            elif precondition == "adi":
                from heatflow_tpu.ops.linesolve import adi_preconditioner
                pre = adi_preconditioner(A, s, free)
            else:
                from heatflow_tpu.ops.linesolve import line_preconditioner
                pre = line_preconditioner(
                    A, s, free, axis=-1 if precondition == "rline" else -2)
        if precondition == "mg" and mg_levels is not None:
            from heatflow_tpu.ops.multigrid import make_vcycle
            level_ops = []
            for lv, shp in zip(mg_levels, mg_shapes):
                A_l, _ = combine_operator(lv["K"], lv["M"], kp, rc, dt)
                level_ops.append({**lv, "A": A_l, "shape": shp})
            vcycle = make_vcycle(level_ops)
            inv_s = 1.0 / jnp.where(s > 0, s, 1.0)
            # V-cycle approximates A⁻¹; conjugate it into the scaled system:
            # precond(r̃) = S⁻¹ (vcycle(S⁻¹ r̃))
            pre = lambda r: inv_s * vcycle(inv_s * r)

        coeff = jnp.asarray(-4.0 * np.log(2.0), cdt) / (fw * fw)
        profile = jnp.exp(coeff * r_sq) * base  # Gaussian on the heating line

        # BC value = (amp - ic) e^{-4ln2 r²/FWHM²} + ic on the heating line,
        # ic on fixed edges (ref run_no_diamond.py:303-309) — affine in the
        # interpolated amplitude, g(t) = g0 + amp(t)·g1, so the lift A g is
        # precomputed once instead of one stencil apply per step
        g0 = ic * (dirich - profile)
        g1 = profile
        Ag0 = apply_stencil(A, g0)
        Ag1 = apply_stencil(A, g1)

        # volumetric source: rhs += dt ∫ f φ r dx = dt (M_proj @ f)
        # (the reference's `dt f v r dx` term, ref run_no_diamond.py:284,
        # with f a nodal field instead of the constant 0)
        b_src = 0.0 if source is None \
            else dt * apply_stencil(M_proj, source)

        extrapolate = warm_start == "extrapolate"
        order2 = warm_start == "extrapolate2"

        # mixed-precision refinement: f32 casts of the scaled system for the
        # inner correction solves (the f64 master operator computes only the
        # per-pass residual — one emulated-f64 stencil apply each)
        if f64_refine:
            A32 = A.astype(dtype)
            s32 = s.astype(dtype)
            free32 = free.astype(dtype)
            sm32 = (s * free).astype(dtype)
            apply_A32_s = lambda y: s32 * apply_stencil(A32, s32 * y)
            pre32 = None
            pcr_stack32 = None
            pcr_z_stack32 = None
            if use_vmem and precondition in ("rline", "adi", "adaptive",
                                             "mgz"):
                from heatflow_tpu.ops.pallas_cg import pcr_pack
                pcr_stack32 = pcr_pack(A32, s32, free32)
                if precondition in ("adi", "adaptive"):
                    pcr_z_stack32 = pcr_pack(A32, s32, free32, axis=-2)
            elif precondition == "adi":
                from heatflow_tpu.ops.linesolve import adi_preconditioner
                pre32 = adi_preconditioner(A32, s32, free32)
            elif precondition in ("rline", "zline"):
                from heatflow_tpu.ops.linesolve import line_preconditioner
                pre32 = line_preconditioner(
                    A32, s32, free32,
                    axis=-1 if precondition == "rline" else -2)
            s_mp32 = s_mp.astype(dtype)
            G_r32 = G_r.astype(dtype)
            M_proj32 = M_proj.astype(dtype)
            apply_Mp_s32 = lambda y: s_mp32 * apply_stencil(M_proj32,
                                                            s_mp32 * y)

        carry_inner = inner_seed == "carry"

        def _solve_refined(b_lift, y0, dys, use_adi=None):
            """N passes of f64-residual / f32-correction iterative
            refinement on the scaled system (see the f64_refine doc).

            ``dys``: (N, nz, nr) f32 — the previous step's per-pass
            corrections, used as the inner CG seeds when
            ``inner_seed='carry'``. The inner rhs is unit-normalized, so
            each carried correction is already on the right scale.
            Measured on TPU (BENCHMARKS.md measured-negative #5): the
            carried seed strips the fast-converging high-frequency
            residual content, leaving a low-mode-dominated residual the
            inner CG reduces more slowly — more accuracy than requested
            at more cost, dominated by simply tightening rtol with the
            zero seed. Kept as a tested option; 'zero' is official."""
            from heatflow_tpu.ops.pallas_cg import cg_vmem_tol
            bt = b_lift * free
            # Inner stop floor: once the f64 residual is at f64 roundoff
            # relative to the step's full rhs there is nothing left to
            # correct — and the f32 target rtol²·‖r‖² would underflow to
            # denormals, leaving the inner CG grinding on noise until
            # maxiter (measured: 18k iterations then poisoning on a
            # warm-start-exact early step).
            floor2 = jnp.asarray(1e-30, cdt) * jnp.sum(bt * bt)
            y = y0
            iters = jnp.zeros((), jnp.int32)
            z32 = jnp.zeros((nz, nr), dtype)
            new_dys = []
            for i in range(f64_refine):
                r64 = bt - free * apply_A_s(y)
                rn2 = jnp.sum(r64 * r64)
                # unit-norm rhs + degenerate stop (ops.cg.refine_inner_scale)
                rnorm, rtol_eff = refine_inner_scale(rn2, floor2, rtol,
                                                     dtype)
                r32 = (r64 / rnorm).astype(dtype)
                # a carried seed must be zeroed on degenerate passes — the
                # rtol_eff=2 early stop assumes the solve starts AT the rhs
                # residual (ops.cg.refine_inner_seed)
                seed = refine_inner_seed(dys[i], rtol_eff) if carry_inner \
                    else z32
                if use_vmem and use_adi is not None:
                    # per-step rline/adi switch: both kernel variants are
                    # compiled once; deep solves (previous step's inner
                    # iterations above the threshold) run the ADI kernel,
                    # shallow ones the cheaper rline kernel
                    dy, its = jax.lax.cond(
                        use_adi,
                        lambda: cg_vmem_tol(A32, sm32, r32, seed, rtol_eff,
                                            maxiter=maxiter, rtol_wrt="b",
                                            pcr=pcr_stack32,
                                            pcr_z=pcr_z_stack32),
                        lambda: cg_vmem_tol(A32, sm32, r32, seed, rtol_eff,
                                            maxiter=maxiter, rtol_wrt="b",
                                            pcr=pcr_stack32))
                elif use_vmem:
                    dy, its = cg_vmem_tol(A32, sm32, r32, seed, rtol_eff,
                                          maxiter=maxiter, rtol_wrt="b",
                                          pcr=pcr_stack32,
                                          pcr_z=pcr_z_stack32,
                                          mgz=(mg_levels
                                               if precondition == "mgz"
                                               else None),
                                          mgz_sweeps=mgz_sweeps)
                else:
                    dsol = pcg(apply_A32_s, r32, seed, precond=pre32,
                               mask=free32, rtol=rtol_eff, maxiter=maxiter,
                               rtol_wrt="b")
                    dy, its = dsol.x, dsol.iters
                new_dys.append(dy)
                y = y + dy.astype(cdt) * rnorm
                iters = iters + its
            return CGResult(x=y, iters=iters,
                            residual=jnp.zeros((), cdt),
                            converged=jnp.asarray(True)), \
                jnp.stack(new_dys)

        adaptive = precondition == "adaptive"

        def step(carry, t):
            use_adi = None
            if adaptive:
                # deep-solve detector with one step of hysteresis: the
                # previous step's iteration count is the best free
                # predictor of this step's depth (smooth transients)
                carry, it_prev = carry[:-1], carry[-1]
                use_adi = it_prev > adaptive_thresh
            if carry_inner:
                carry, dys_prev = carry[:-1], carry[-1]
            if order2:
                u_prev, u_pp, u_ppp, gr_prev, gr_pp, gr_ppp = carry
            else:
                u_prev, u_pp, gr_prev, gr_pp = carry
            amp = jnp.interp(t, heat_t, heat_T) - amp_offset
            g = g0 + amp * g1
            b = apply_stencil(M_op, u_prev) + b_src
            b_lift = (b - (Ag0 + amp * Ag1)) * s
            # CG seed: previous solution, or its linear (quadratic for
            # 'extrapolate2') extrapolation in time
            if order2:
                u_seed = 3.0 * (u_prev - u_pp) + u_ppp
            elif extrapolate:
                u_seed = 2.0 * u_prev - u_pp
            else:
                u_seed = u_prev
            y0 = (u_seed / jnp.where(s > 0, s, 1.0)) * free
            if f64_refine:
                sol, dys = _solve_refined(
                    b_lift, y0,
                    dys_prev if carry_inner else
                    jnp.zeros((f64_refine, nz, nr), dtype), use_adi)
            elif use_vmem:
                from heatflow_tpu.ops.pallas_cg import cg_vmem_tol
                if adaptive:
                    x, iters = jax.lax.cond(
                        use_adi,
                        lambda: cg_vmem_tol(A, sm_vmem, b_lift * free, y0,
                                            rtol, maxiter=maxiter,
                                            rtol_wrt=rtol_wrt,
                                            pcr=pcr_stack,
                                            pcr_z=pcr_z_stack),
                        lambda: cg_vmem_tol(A, sm_vmem, b_lift * free, y0,
                                            rtol, maxiter=maxiter,
                                            rtol_wrt=rtol_wrt,
                                            pcr=pcr_stack))
                else:
                    x, iters = cg_vmem_tol(A, sm_vmem, b_lift * free, y0,
                                           rtol, maxiter=maxiter,
                                           rtol_wrt=rtol_wrt,
                                           cheb_degree=vmem_cheb_degree,
                                           pcr=pcr_stack,
                                           pcr_z=pcr_z_stack,
                                           mgz=(mg_levels
                                                if precondition == "mgz"
                                                else None),
                                           mgz_sweeps=mgz_sweeps)
                sol = CGResult(x=x, iters=iters,
                               residual=jnp.zeros((), dtype),
                               converged=jnp.asarray(True))
            elif fixed_iters is not None:
                sol = pcg_fixed(apply_A_s, b_lift, y0, precond=pre,
                                mask=free, iters=fixed_iters)
            else:
                sol = pcg(apply_A_s, b_lift, y0, precond=pre, mask=free,
                          rtol=rtol, maxiter=maxiter, rtol_wrt=rtol_wrt)
            u = sol.x * s * free + g

            outs = {"cg_iters": sol.iters}
            if has_watch:
                outs["watch"] = u.reshape(-1)[dev["watch_flat"]]
            if has_radial:
                # projection seed rides the same warm-start knob as the
                # solve: the gradient field evolves as smoothly in time
                # as u, so its linear extrapolation halves the per-step
                # projection iterations (measured, BENCHMARKS.md)
                if order2:
                    gr_seed = 3.0 * (gr_prev - gr_pp) + gr_ppp
                elif extrapolate:
                    gr_seed = 2.0 * gr_prev - gr_pp
                else:
                    gr_seed = gr_prev
                if f64_refine:
                    # the mass projection is well-conditioned after scaling
                    # (no f32 amplification) — keep it at f32 speed
                    br = s_mp32 * apply_stencil(G_r32, u.astype(dtype))
                    gsol = pcg(apply_Mp_s32, br, gr_seed / s_mp32,
                               rtol=proj_rtol, maxiter=proj_maxiter)
                    gr = gsol.x * s_mp32
                else:
                    br = s_mp * apply_stencil(G_r, u)
                    y0p = gr_seed / s_mp
                    gsol = pcg(apply_Mp_s, br, y0p,
                               rtol=proj_rtol, maxiter=proj_maxiter)
                    gr = gsol.x * s_mp
                vals = gr.reshape(-1)[dev["band_nodes"]]
                sums = jax.ops.segment_sum(vals, dev["band_bins"],
                                           num_segments=n_bins)
                outs["band"] = sums / dev["bin_counts"]
                outs["axis"] = gr[:, 0]
                outs["proj_iters"] = gsol.iters
            else:
                gr = gr_prev
            if record_fields:
                outs["field"] = u
            new_carry = (u, u_prev, u_pp, gr, gr_prev, gr_pp) if order2 \
                else (u, u_prev, gr, gr_prev)
            if carry_inner:
                new_carry = new_carry + (dys,)
            if adaptive:
                new_carry = new_carry + (sol.iters,)
            return new_carry, outs

        gr0 = jnp.zeros((nz, nr), dtype)
        ts = (jnp.arange(1, num_steps + 1, dtype=cdt)) * dt + t0
        init = (u0, u0, u0, gr0, gr0, gr0) if order2 \
            else (u0, u0, gr0, gr0)
        if carry_inner:
            init = init + (jnp.zeros((f64_refine, nz, nr), dtype),)
        if adaptive:
            # seed above any threshold: the first (cold) step is the
            # deepest solve of the transient — start on the ADI kernel
            init = init + (jnp.asarray(maxiter, jnp.int32),)
        carry_fin, ys = jax.lax.scan(step, init, ts)
        ys["final_u"] = carry_fin[0]
        ys["times"] = ts
        return ys

    jitted = jax.jit(_core)

    def simulate(kappas=None, rho_cvs=None, fwhm=None, u0=None, t0=0.0,
                 source=None):
        if precondition == "mgz" and (kappas is not None
                                      or rho_cvs is not None):
            raise ValueError(
                "precondition='mgz' bakes the coarse operator from the "
                "problem's default coefficients at maker time; per-call "
                "kappa/rho_cv overrides would silently mismatch it — use "
                "'rline'/'adi'/'adaptive' for coefficient sweeps")
        kp = dev["kappas"] if kappas is None else jnp.asarray(kappas, cdt)
        rc = dev["rho_cvs"] if rho_cvs is None else jnp.asarray(rho_cvs,
                                                               cdt)
        fw = jnp.asarray(problem.fwhm if fwhm is None else fwhm, cdt)
        # initial condition: constant ic_temp, or a provided field (e.g. a
        # steady-state solve as the transient start, or a checkpoint resume
        # with the matching t0 offset)
        u0 = jnp.full((nz, nr), ic, cdt) if u0 is None \
            else jnp.asarray(u0, cdt)
        src = None if source is None else jnp.asarray(source, cdt)
        if field_sh is not None:
            u0 = jax.device_put(u0, field_sh)
            src = None if src is None else jax.device_put(src, field_sh)
        return jitted(dev, mg_host, kp, rc, fw, u0,
                      jnp.asarray(t0, cdt), src)

    simulate.core = _core
    simulate.dev = dev
    simulate.mg = mg_host
    cache[cache_key] = simulate
    return simulate


def make_step_fn(problem: Problem2D, *, dtype=jnp.float32,
                 fixed_iters: int = 100):
    """A single jittable backward-Euler step ``step(u, t) -> u_next`` on the
    problem's operator (fixed-iteration CG → fully static control flow).
    Used by the compile-check entry point and by external integrators."""
    dev = problem.device_arrays(dtype)
    dt = jnp.asarray(problem.dt, dtype)
    ic = jnp.asarray(problem.ic_temp, dtype)
    A, M_op = combine_operator(dev["K"], dev["M"], dev["kappas"],
                               dev["rho_cvs"], dt)
    free, dirich = dev["free"], dev["dirichlet"]
    s = jax.lax.rsqrt(jnp.where(A[0] > 0, A[0], 1.0)) * free + dirich
    coeff = jnp.asarray(-4.0 * np.log(2.0) / problem.fwhm ** 2, dtype)
    profile = jnp.exp(coeff * dev["r_sq"]) * dev["heat_profile_base"]
    amp_offset = dev["heat_T"][0] - ic
    apply_A_s = lambda y: s * apply_stencil(A, s * y)

    def step(u_prev, t):
        amp = jnp.interp(t, dev["heat_t"], dev["heat_T"]) - amp_offset
        g = ic * dirich + (amp - ic) * profile
        b_lift = (apply_stencil(M_op, u_prev) - apply_stencil(A, g)) * s
        y0 = (u_prev / jnp.where(s > 0, s, 1.0)) * free
        sol = pcg_fixed(apply_A_s, b_lift, y0, mask=free, iters=fixed_iters)
        return sol.x * s * free + g

    return step


def run_transient(problem: Problem2D, *, dtype=jnp.float64,
                  rtol: float = 1e-11, maxiter: int = 20000,
                  fixed_iters: int | None = None,
                  record_gradient: bool = True,
                  record_fields: bool = False,
                  precondition: str = "jacobi", solver: str = "xla",
                  warm_start: str = "previous", mesh=None, f64_refine: int = 0,
                  inner_seed: str = "zero",
                  kappas=None, rho_cvs=None, fwhm=None,
                  u0=None, t0: float = 0.0, source=None) -> TransientResult:
    """Convenience wrapper: build, run, and repatriate results (the simulate
    fn returned by make_simulate_fn is internally jitted)."""
    fn = make_simulate_fn(
        problem, dtype=dtype, rtol=rtol, maxiter=maxiter,
        fixed_iters=fixed_iters, record_gradient=record_gradient,
        record_fields=record_fields, precondition=precondition,
        solver=solver, warm_start=warm_start, mesh=mesh,
        f64_refine=f64_refine, inner_seed=inner_seed)
    ys = fn(kappas, rho_cvs, fwhm, u0, t0, source)
    ys = jax.tree.map(np.asarray, ys)

    rad = problem.radial if record_gradient else None
    return TransientResult(
        times=ys["times"],
        watcher=ys.get("watch"),
        watcher_names=list(problem.watcher_names),
        band_rows=ys.get("band"),
        band_centers=None if rad is None else rad.bin_centers,
        axis_rows=ys.get("axis"),
        axis_z=None if rad is None else rad.axis_z,
        fields=ys.get("field"),
        final_u=ys["final_u"],
        cg_iters=ys["cg_iters"],
        proj_iters=ys.get("proj_iters"),
    )
