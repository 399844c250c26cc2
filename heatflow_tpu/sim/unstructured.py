"""Transient solver on imported unstructured meshes (ELL operator path).

Runs the same backward-Euler / Gaussian-laser / watcher / radial-gradient
pipeline as the structured stepper but on an arbitrary P1 triangle mesh —
e.g. a gmsh .msh produced by the reference toolchain — enabling exact-mesh
parity runs (SURVEY.md §7 'Unstructured-mesh parity'). Node/cell semantics
follow the reference everywhere:

  * watcher points → nearest mesh node (ref run_no_diamond.py:397-401);
  * raw gradient CSV → nodes with |r| <= 1e-12 sorted by z (ref :457-465);
  * band CSV → 0.2 µm z-bins of band nodes 0 < r <= 0.25 µm (ref :494-513).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from heatflow_tpu.mesh.msh_io import UnstructuredMesh
from heatflow_tpu.ops.cg import pcg, refine_inner_scale
from heatflow_tpu.ops.ell import (EllOps, assemble_ell, ell_apply,
                                  ell_combine, ell_diag)
from heatflow_tpu.sim.bc import HeatingCurve, node_row_mask
from heatflow_tpu.sim.problem import AXIS_TOL, BAND_RMAX, BIN_DZ


@dataclass
class ProblemUnstructured:
    mesh: UnstructuredMesh
    ell: EllOps
    heating: HeatingCurve
    dt: float
    num_steps: int
    ic_temp: float
    fwhm: float
    kappas: np.ndarray
    rho_cvs: np.ndarray
    dirichlet: np.ndarray            # (N,) bool
    heat_mask: np.ndarray            # (N,) bool
    watcher_names: list[str] = field(default_factory=list)
    watcher_nodes: np.ndarray | None = None
    band_nodes: np.ndarray | None = None
    band_bins: np.ndarray | None = None
    bin_counts: np.ndarray | None = None
    bin_centers: np.ndarray | None = None
    axis_nodes: np.ndarray | None = None
    axis_z: np.ndarray | None = None


def build_problem_unstructured(mesh: UnstructuredMesh, heating: HeatingCurve,
                               cfg: dict, *, watcher_points=None,
                               heat_coord: float | None = None,
                               heat_length: float | None = None
                               ) -> ProblemUnstructured:
    """Assemble the ELL problem. heat_coord/heat_length default to the
    config-derived p-side coupler line (requires reference-schema mats)."""
    from heatflow_tpu.config import mat_float
    nodes = mesh.nodes
    n_mats = len(mesh.material_tags) or int(mesh.cell_tags.max())
    tag_order = sorted(mesh.material_tags.items(), key=lambda kv: kv[1])
    if tag_order:
        kappas = np.array([mat_float(cfg, nm, "k") for nm, _ in tag_order])
        rho_cvs = np.array([mat_float(cfg, nm, "rho")
                            * mat_float(cfg, nm, "cv") for nm, _ in tag_order])
    else:
        raise ValueError("mesh lacks material name → tag mapping")

    if heat_coord is None or heat_length is None:
        from heatflow_tpu.geometry import heating_line
        cfg_coord, cfg_length = heating_line(cfg)
        heat_coord = cfg_coord if heat_coord is None else heat_coord
        heat_length = cfg_length if heat_length is None else heat_length

    edge = (node_row_mask(nodes, "left") | node_row_mask(nodes, "right")
            | node_row_mask(nodes, "top"))
    heat = node_row_mask(nodes, "x", coord=heat_coord, center=0.0,
                         length=heat_length)
    dirichlet = edge | heat

    names, widx = [], None
    if watcher_points:
        names = list(watcher_points.keys())
        pts = np.asarray(list(watcher_points.values()), float)
        d2 = ((nodes[None, :, :] - pts[:, None, :]) ** 2).sum(-1)
        widx = d2.argmin(axis=1)

    # radial sampling (reference node rules)
    r = nodes[:, 1]
    z = nodes[:, 0]
    axis_nodes = np.where(np.abs(r) <= AXIS_TOL)[0]
    order = np.argsort(z[axis_nodes])
    axis_nodes = axis_nodes[order]
    band_sel = np.where((r > 0.0) & (r <= BAND_RMAX))[0]
    edges = np.arange(z.min(), z.max() + BIN_DZ, BIN_DZ)
    raw_bin = np.searchsorted(edges, z[band_sel]) - 1
    valid = (raw_bin >= 0) & (raw_bin < len(edges) - 1)
    band_sel, raw_bin = band_sel[valid], raw_bin[valid]
    used = np.unique(raw_bin)
    remap = -np.ones(len(edges) - 1, dtype=np.int64)
    remap[used] = np.arange(len(used))
    bins = remap[raw_bin]
    counts = np.bincount(bins, minlength=len(used)).astype(float)
    centers = 0.5 * (edges[used] + edges[used + 1])

    t_final = float(cfg["timing"]["t_final"])
    num_steps = int(cfg["timing"]["num_steps"])
    return ProblemUnstructured(
        mesh=mesh,
        ell=assemble_ell(mesh.nodes, mesh.cells, mesh.cell_tags, n_mats),
        heating=heating, dt=t_final / num_steps, num_steps=num_steps,
        ic_temp=float(cfg["heating"]["ic_temp"]),
        fwhm=float(cfg["heating"]["fwhm"]), kappas=kappas, rho_cvs=rho_cvs,
        dirichlet=dirichlet, heat_mask=heat, watcher_names=names,
        watcher_nodes=widx, band_nodes=band_sel, band_bins=bins,
        bin_counts=counts, bin_centers=centers, axis_nodes=axis_nodes,
        axis_z=z[axis_nodes])


def _overlay_prep(problem: ProblemUnstructured):
    """(idx, inv, shape, stencils) of the mesh's lattice embedding, or None
    when the mesh has no grid overlay. idx maps node id → flat lattice
    position; inv the reverse. The stencil conversion is cached on the
    problem (shared by the simulate and sweep paths)."""
    from heatflow_tpu.ops.overlay import ell_to_stencils, validate_overlay
    overlay = getattr(problem.mesh, "grid_overlay", None)
    if overlay is None:
        return None
    idx_np, oshape = validate_overlay(len(problem.mesh.nodes), overlay)
    stn = getattr(problem, "_overlay_stencils", None)
    if stn is None:
        stn = ell_to_stencils(problem.ell, overlay)
        problem._overlay_stencils = stn
    return idx_np, np.argsort(idx_np), oshape, stn


def auto_selects_vmem(mesh, dtype, precondition="jacobi") -> bool:
    """Would ``solver='auto'`` pick the grid-overlay VMEM engine for this
    mesh/dtype? (TPU backend, f32, overlay present and within the VMEM
    budget.)  Drivers use this to resolve engine-dependent defaults —
    notably whether a DEFAULTED rline preconditioner is available — before
    building the simulate fn (the same logic gates ``use_vmem`` inside
    :func:`make_simulate_fn_unstructured`)."""
    overlay = getattr(mesh, "grid_overlay", None)
    if overlay is None or jax.default_backend() != "tpu" \
            or jnp.dtype(dtype) != jnp.float32:
        return False
    from heatflow_tpu.ops.pallas_cg import (adi_extra_planes, fits_in_vmem,
                                            rline_extra_planes)
    oshape = tuple(int(s) for s in overlay["shape"])
    extra = (rline_extra_planes(oshape[1]) if precondition == "rline"
             else adi_extra_planes(*oshape) if precondition == "adi" else 0)
    return fits_in_vmem(*oshape, dtype, n_points=9, extra_planes=extra)


def sweep_auto_selects_vmem(mesh, dtype, precondition="jacobi") -> bool:
    """Would ``solver='auto'`` pick the overlay VMEM engine for a SWEEP on
    this mesh/dtype? The batched per-config sweep kernel holds the shared
    A0+K_var stencils plus the per-config combined operator — a strictly
    larger working set than the single-problem kernel
    (:func:`auto_selects_vmem`), so the sweep driver must resolve against
    THIS predicate (the same guard ``_sweep_vmem_unstructured`` enforces);
    resolving against the single-problem one picks an engine the maker
    then rejects for shapes in the budget gap."""
    overlay = getattr(mesh, "grid_overlay", None)
    if overlay is None or jax.default_backend() != "tpu" \
            or jnp.dtype(dtype) != jnp.float32:
        return False
    from heatflow_tpu.ops.pallas_cg import fits_in_vmem_batched
    oshape = tuple(int(s) for s in overlay["shape"])
    return fits_in_vmem_batched(*oshape, dtype, n_points=9,
                                rline=precondition == "rline",
                                adi=precondition == "adi")


def make_simulate_fn_unstructured(problem: ProblemUnstructured, *,
                                  dtype=jnp.float64, rtol=1e-11,
                                  maxiter=20000, fixed_iters=None,
                                  proj_rtol=None, proj_maxiter=400,
                                  record_gradient=True,
                                  record_fields=False, rtol_wrt="b",
                                  differentiable=False, solver="xla",
                                  warm_start="previous",
                                  precondition="jacobi", f64_refine=0):
    """Build a jittable simulate(kappas, rho_cvs, fwhm, u0, t0, source) on the
    ELL operator path — same surface as the structured
    ``stepper.make_simulate_fn`` (parameter overrides default to the
    problem's values; passing arrays makes it a sweep kernel, vmappable over
    any of the three material/laser parameters).

    differentiable=True swaps the implicit solve to
    ``pcg_solve`` (implicit differentiation via custom_linear_solve, one
    adjoint CG per step under grad) and drops the cg_iters trace output —
    the enabler for gradient-based experimental fitting on imported meshes.

    warm_start='extrapolate' seeds each step's CG with 2·u_n − u_{n−1}
    instead of u_n (same semantics as the structured stepper; measured
    trade-offs in BENCHMARKS.md).

    f64_refine=N: mixed-precision iterative refinement — f64-operator
    residuals around the f32 correction solves, state carried in f64
    (same semantics and measured frontier as
    ``stepper.make_simulate_fn(f64_refine=N)``; requires x64, dtype f32).

    Memoized per problem (same convention as sweepkernel.make_sweep_fn):
    identical arguments return the same compiled callable — re-tracing a
    fresh jit per call costs far more than the run itself on small chunks.
    """
    if f64_refine:
        # refined inner solves stop wrt their own per-pass residual; the
        # outer rtol_wrt has no effect — normalize it out of the cache key
        rtol_wrt = "b"
    cache_key = ("sim_fn", jnp.dtype(dtype).name, rtol, maxiter, fixed_iters,
                 proj_rtol, proj_maxiter, record_gradient, record_fields,
                 rtol_wrt, differentiable, solver, warm_start, precondition,
                 f64_refine)
    if precondition not in ("jacobi", "rline", "adi"):
        raise ValueError(f"unknown precondition {precondition!r}")
    if precondition in ("rline", "adi") and solver not in ("vmem", "auto"):
        raise ValueError(f"{precondition} preconditioning on unstructured "
                         "problems runs the grid-overlay VMEM path "
                         "(solver='vmem')")
    cache = problem.__dict__.setdefault("_fn_cache", {})
    if cache_key in cache:
        return cache[cache_key]
    if warm_start not in ("previous", "extrapolate"):
        # the unstructured stepper implements the linear seed only
        # ('extrapolate2' exists on the structured stepper alone) — raise
        # instead of silently degrading to 'previous'
        raise ValueError(f"unknown warm_start {warm_start!r} (use "
                         "'previous' or 'extrapolate')")
    if f64_refine:
        # mixed-precision iterative refinement — same semantics as
        # stepper.make_simulate_fn(f64_refine=N): f64 operator residuals
        # around the f32 correction solves, state carried in f64
        if jnp.dtype(dtype) != jnp.float32:
            raise ValueError("f64_refine is the mixed-precision mode: "
                             "dtype must be float32")
        if not jax.config.jax_enable_x64:
            raise ValueError("f64_refine needs jax_enable_x64=True")
        if differentiable or fixed_iters is not None:
            raise ValueError("f64_refine composes with the tolerance-based "
                             "non-differentiable solvers")
    cdt = jnp.float64 if f64_refine else dtype
    from heatflow_tpu.ops.cg import pcg_fixed, pcg_solve
    from heatflow_tpu.ops.stencil import apply_stencil, combine_operator
    nodes = problem.mesh.nodes
    n = len(nodes)
    dt = jnp.asarray(problem.dt, cdt)
    ic = jnp.asarray(problem.ic_temp, cdt)
    num_steps = int(problem.num_steps)
    n_bins = len(problem.bin_counts) if problem.bin_counts is not None else 0
    has_watch = problem.watcher_nodes is not None
    if proj_rtol is None:
        proj_rtol = rtol

    # Grid-overlay fast path (ops/overlay.py): when the mesh topology embeds
    # in a 2D lattice, the operators become permuted 9-point stencils — the
    # TPU-fast form (gathers don't vectorize on TPU). All vectors live in
    # lattice ordering inside the core; node ordering at the boundaries.
    overlay = getattr(problem.mesh, "grid_overlay", None)
    use_vmem = False
    vmem_interpret = jax.default_backend() != "tpu"
    if solver == "vmem":
        if overlay is None:
            raise ValueError("solver='vmem' needs a grid-overlay mesh "
                             "(the VMEM kernel is stencil-form only)")
        from heatflow_tpu.ops.pallas_cg import (adi_extra_planes,
                                                fits_in_vmem,
                                                rline_extra_planes)
        oshape0 = tuple(int(s) for s in overlay["shape"])
        extra = (rline_extra_planes(oshape0[1]) if precondition == "rline"
                 else adi_extra_planes(*oshape0)
                 if precondition == "adi" else 0)
        if not fits_in_vmem(*oshape0, dtype, n_points=9, extra_planes=extra):
            raise ValueError("problem exceeds the VMEM budget")
        if not vmem_interpret and dtype != jnp.float32:
            raise ValueError("the VMEM kernel is f32-only on TPU")
        use_vmem = True
    elif solver == "auto":
        use_vmem = auto_selects_vmem(problem.mesh, dtype, precondition)
    if precondition in ("rline", "adi") and not use_vmem:
        # the only unstructured line-preconditioned engine is the overlay
        # VMEM kernel — running the ELL/XLA path here would silently drop
        # the preconditioner (drivers pre-resolve via auto_selects_vmem and
        # fall back to jacobi for DEFAULTED rline; an explicit request
        # errors instead of lying)
        raise ValueError(
            f"{precondition} preconditioning on unstructured problems runs "
            "the grid-overlay VMEM engine, which was not selected here (no "
            "overlay, exceeds the VMEM budget, or off-TPU/non-f32 under "
            "solver='auto'); use precondition='jacobi' or solver='vmem'")
    if overlay is not None:
        idx_np, inv_np, oshape, stn = _overlay_prep(problem)
        remap = lambda v: np.asarray(v)[inv_np]
        node_ids = lambda ids: idx_np[np.asarray(ids)]
        dev = {"K": jnp.asarray(stn["K"], cdt),
               "M": jnp.asarray(stn["M"], cdt),
               "G": jnp.asarray(stn["G"], cdt),
               "Mp": jnp.asarray(stn["Mp"], cdt)}
    else:
        remap = lambda v: v
        node_ids = lambda ids: np.asarray(ids)
        # Large arrays enter the jitted core as ARGUMENTS, not closure
        # constants (closure constants trigger XLA constant folding).
        dev = problem.ell.device_put(cdt)
    dev.update({
        "free": jnp.asarray(remap(~problem.dirichlet), cdt),
        "dirich": jnp.asarray(remap(problem.dirichlet), cdt),
        "heat_t": jnp.asarray(problem.heating.time, cdt),
        "heat_T": jnp.asarray(problem.heating.temp, cdt),
        "r_sq": jnp.asarray(remap(nodes[:, 1] ** 2), cdt),
        "heat_f": jnp.asarray(remap(problem.heat_mask), cdt),
    })
    if overlay is not None:
        dev["to_node"] = jnp.asarray(idx_np)
        dev["to_latt"] = jnp.asarray(inv_np)
    if has_watch:
        dev["watch"] = jnp.asarray(node_ids(problem.watcher_nodes))
    if record_gradient:
        dev.update({
            "band_nodes": jnp.asarray(node_ids(problem.band_nodes)),
            "band_bins": jnp.asarray(problem.band_bins),
            "bin_counts": jnp.asarray(problem.bin_counts, cdt),
            "axis_nodes": jnp.asarray(node_ids(problem.axis_nodes)),
        })

    def _core(dev, kp, rc, fw, u0, t0, source):
        free, dirich = dev["free"], dev["dirich"]
        heat_t, heat_T = dev["heat_t"], dev["heat_T"]
        amp_offset = heat_T[0] - ic

        if overlay is not None:
            A9, M9 = combine_operator(dev["K"], dev["M"], kp, rc, dt)
            rs = lambda C, v: apply_stencil(C, v.reshape(oshape)).ravel()
            diag = A9[0].ravel()
            apply_A = lambda v: rs(A9, v)
            apply_M = lambda v: rs(M9, v)
            apply_Mp = lambda v: rs(dev["Mp"], v)
            apply_G = lambda v: rs(dev["G"], v)
            Mp_diag = dev["Mp"][0].ravel()
        else:
            cols = dev["cols"]
            A_vals, M_vals = ell_combine(dev["K"], dev["M"], kp, rc, dt)
            diag = (A_vals * dev["own"]).sum(-1)
            apply_A = lambda v: ell_apply(cols, A_vals, v)
            apply_M = lambda v: ell_apply(cols, M_vals, v)
            apply_Mp = lambda v: ell_apply(cols, dev["Mp"], v)
            apply_G = lambda v: ell_apply(cols, dev["G"], v)
            Mp_diag = (dev["Mp"] * dev["own"]).sum(-1)

        s = jax.lax.rsqrt(jnp.where(diag > 0, diag, 1.0)) * free + dirich
        apply_s = lambda y: s * apply_A(s * y)
        s_mp = jax.lax.rsqrt(jnp.where(Mp_diag > 0, Mp_diag, 1.0))
        apply_mp_s = lambda y: s_mp * apply_Mp(s_mp * y)

        pcr = pcr_z = None
        if use_vmem and precondition in ("rline", "adi") and not f64_refine:
            # line PCR factors on the overlay lattice (9-point operator's
            # r-couplings are planes 3/4, z-couplings 1/2 — same slots as
            # the 7-point layout) — factored once per transient, outside
            # the scan; 'adi' adds the z stack (split-additive composition)
            from heatflow_tpu.ops.pallas_cg import pcr_pack
            pcr = pcr_pack(A9, s.reshape(oshape), free.reshape(oshape))
            if precondition == "adi":
                pcr_z = pcr_pack(A9, s.reshape(oshape),
                                 free.reshape(oshape), axis=-2)

        if f64_refine:
            # f32 casts of the scaled system for the inner correction
            # solves; the f64 masters above compute only per-pass residuals
            s32 = s.astype(dtype)
            free32 = free.astype(dtype)
            s_mp32 = s_mp.astype(dtype)
            if overlay is not None:
                A9_32 = A9.astype(dtype)
                Mp32, G32 = dev["Mp"].astype(dtype), dev["G"].astype(dtype)
                apply_A32 = lambda v: apply_stencil(
                    A9_32, v.reshape(oshape)).ravel()
                apply_Mp32 = lambda v: apply_stencil(
                    Mp32, v.reshape(oshape)).ravel()
                apply_G32 = lambda v: apply_stencil(
                    G32, v.reshape(oshape)).ravel()
                if use_vmem and precondition in ("rline", "adi"):
                    from heatflow_tpu.ops.pallas_cg import pcr_pack
                    pcr = pcr_pack(A9_32, s32.reshape(oshape),
                                   free32.reshape(oshape))
                    if precondition == "adi":
                        pcr_z = pcr_pack(A9_32, s32.reshape(oshape),
                                         free32.reshape(oshape), axis=-2)
            else:
                A_vals32 = A_vals.astype(dtype)
                Mp32v, G32v = dev["Mp"].astype(dtype), dev["G"].astype(dtype)
                apply_A32 = lambda v: ell_apply(cols, A_vals32, v)
                apply_Mp32 = lambda v: ell_apply(cols, Mp32v, v)
                apply_G32 = lambda v: ell_apply(cols, G32v, v)
            apply_s32 = lambda y: s32 * apply_A32(s32 * y)
            apply_mp_s32 = lambda y: s_mp32 * apply_Mp32(s_mp32 * y)

        def _solve_refined(bt, y0):
            """f64-residual / f32-correction refinement (see
            stepper._solve_refined; shared unit-norm rhs scaling and
            degenerate-rhs stop — ops.cg.refine_inner_scale)."""
            from heatflow_tpu.ops.pallas_cg import cg_vmem_tol
            floor2 = jnp.asarray(1e-30, cdt) * jnp.sum(bt * bt)
            y = y0
            iters = jnp.zeros((), jnp.int32)
            for _ in range(f64_refine):
                r64 = bt - free * apply_s(y)
                rn2 = jnp.sum(r64 * r64)
                rnorm, rtol_eff = refine_inner_scale(rn2, floor2, rtol,
                                                     dtype)
                r32 = (r64 / rnorm).astype(dtype)
                if use_vmem:
                    dy2, its = cg_vmem_tol(
                        A9_32, (s32 * free32).reshape(oshape),
                        r32.reshape(oshape), jnp.zeros(oshape, dtype),
                        rtol_eff, maxiter=maxiter, rtol_wrt="b",
                        interpret=vmem_interpret, pcr=pcr, pcr_z=pcr_z)
                    dy = dy2.ravel()
                else:
                    dsol = pcg(apply_s32, r32, jnp.zeros((n,), dtype),
                               mask=free32, rtol=rtol_eff, maxiter=maxiter,
                               rtol_wrt="b")
                    dy, its = dsol.x, dsol.iters
                y = y + dy.astype(cdt) * rnorm
                iters = iters + its
            return y, iters

        coeff = jnp.asarray(-4.0 * np.log(2.0), cdt) / (fw * fw)
        profile = jnp.exp(coeff * dev["r_sq"]) * dev["heat_f"]

        # volumetric source: rhs += dt ∫ f φ r dx = dt (M_proj @ f)
        b_src = 0.0 if source is None \
            else dt * apply_Mp(source)

        # affine-in-amplitude lift (see stepper._core): A g hoisted out of
        # the scan — one apply per transient instead of one per step
        g0 = ic * (dirich - profile)
        g1 = profile
        Ag0 = apply_A(g0)
        Ag1 = apply_A(g1)

        extrapolate = warm_start == "extrapolate"

        def step(carry, t):
            if extrapolate:
                u_prev, u_pp, gr_prev, gr_pp = carry
                seed = 2.0 * u_prev - u_pp
                # the projection seed rides the same knob (the gradient
                # field evolves as smoothly in time as u — measured ~2x
                # fewer projection iterations, BENCHMARKS.md)
                gr_seed = 2.0 * gr_prev - gr_pp
            else:
                u_prev, gr_prev = carry
                seed = u_prev
                gr_seed = gr_prev
            amp = jnp.interp(t, heat_t, heat_T) - amp_offset
            g = g0 + amp * g1
            b = (apply_M(u_prev) + b_src - (Ag0 + amp * Ag1)) * s
            y0 = (seed / jnp.where(s > 0, s, 1.0)) * free
            if f64_refine:
                y, iters = _solve_refined(b * free, y0)
                u = y * s * free + g
                outs = {"cg_iters": iters}
            elif differentiable:
                x = pcg_solve(apply_s, b * free, y0, mask=free, rtol=rtol,
                              maxiter=maxiter, rtol_wrt=rtol_wrt)
                u = x * s * free + g
                outs = {}
            elif use_vmem:
                from heatflow_tpu.ops.pallas_cg import cg_vmem_tol
                x2, iters = cg_vmem_tol(
                    A9, (s * free).reshape(oshape),
                    (b * free).reshape(oshape), y0.reshape(oshape), rtol,
                    maxiter=maxiter, rtol_wrt=rtol_wrt,
                    interpret=vmem_interpret, pcr=pcr, pcr_z=pcr_z)
                u = x2.ravel() * s * free + g
                outs = {"cg_iters": iters}
            else:
                if fixed_iters is not None:
                    sol = pcg_fixed(apply_s, b * free, y0, mask=free,
                                    iters=fixed_iters)
                else:
                    sol = pcg(apply_s, b * free, y0, mask=free, rtol=rtol,
                              maxiter=maxiter, rtol_wrt=rtol_wrt)
                u = sol.x * s * free + g
                outs = {"cg_iters": sol.iters}
            if has_watch:
                outs["watch"] = u[dev["watch"]]
            if record_gradient:
                if f64_refine:
                    # scaled mass solve is well-conditioned: f32 suffices
                    br = s_mp32 * apply_G32(u.astype(dtype))
                    gsol = pcg(apply_mp_s32, br, gr_seed / s_mp32,
                               rtol=proj_rtol, maxiter=proj_maxiter)
                    gr = gsol.x * s_mp32
                else:
                    br = s_mp * apply_G(u)
                    gsol = pcg(apply_mp_s, br, gr_seed / s_mp,
                               rtol=proj_rtol, maxiter=proj_maxiter)
                    gr = gsol.x * s_mp
                vals = gr[dev["band_nodes"]]
                sums = jax.ops.segment_sum(vals, dev["band_bins"],
                                           num_segments=n_bins)
                outs["band"] = sums / dev["bin_counts"]
                outs["axis"] = gr[dev["axis_nodes"]]
                outs["proj_iters"] = gsol.iters
            else:
                gr = gr_prev
            if record_fields:
                outs["field"] = u
            carry_out = (u, u_prev, gr, gr_prev) if extrapolate \
                else (u, gr)
            return carry_out, outs

        gr0 = jnp.zeros((n,), dtype)
        ts = jnp.arange(1, num_steps + 1, dtype=cdt) * dt + t0
        carry0 = (u0, u0, gr0, gr0) if extrapolate else (u0, gr0)
        carry_fin, ys = jax.lax.scan(step, carry0, ts)
        u_fin = carry_fin[0]
        ys["times"] = ts
        ys["final_u"] = u_fin
        return ys

    jitted = jax.jit(_core)

    def simulate(kappas=None, rho_cvs=None, fwhm=None, u0=None, t0=0.0,
                 source=None):
        kp = jnp.asarray(problem.kappas if kappas is None else kappas, cdt)
        rc = jnp.asarray(problem.rho_cvs if rho_cvs is None else rho_cvs,
                         cdt)
        fw = jnp.asarray(problem.fwhm if fwhm is None else fwhm, cdt)
        u0 = jnp.full((n,), ic, cdt) if u0 is None \
            else jnp.asarray(u0, cdt)
        src = None if source is None else jnp.asarray(source, cdt)
        if overlay is not None:
            # node ordering at the API boundary, lattice ordering inside
            u0 = u0[dev["to_latt"]]
            src = None if src is None else src[dev["to_latt"]]
        ys = jitted(dev, kp, rc, fw, u0, jnp.asarray(t0, cdt), src)
        if overlay is not None:
            ys["final_u"] = ys["final_u"][dev["to_node"]]
            if "field" in ys:
                ys["field"] = ys["field"][:, dev["to_node"]]
        return ys

    simulate.core = _core
    simulate.dev = dev
    cache[cache_key] = simulate
    return simulate


def _sweep_vmem_unstructured(problem: ProblemUnstructured, m_idx: int, *,
                             dtype, rtol, maxiter, fixed_iters, warm_start,
                             num_steps=None, mesh=None, rtol_wrt="b",
                             precondition="jacobi", f64_refine=0,
                             record_gradient=False, proj_rtol=1e-11,
                             proj_maxiter=400):
    """VMEM-kernel sweep path for grid-overlay meshes: prepare the lattice
    ops dict and delegate to the shared ``sweepkernel.vmem_sweep_scan``.

    ``mesh``: shard the config axis over the device mesh (shard_map, each
    device runs the Pallas kernel on its shard — same parity as the
    structured ``make_sweep_fn(mesh=...)``). ``num_steps`` overrides the
    problem's step count (time-chunked execution). ``rtol_wrt``,
    ``precondition`` ('jacobi'/'rline'/'adi') and ``f64_refine`` mirror the
    structured maker (shared scan — see vmem_sweep_scan).

    ``record_gradient``: artifact-parity recording — the per-step
    r-weighted gradient projection also runs through the batched VMEM
    kernel on the overlay lattice (vmem_sweep_scan record=...); the built
    function then returns the {watch, band, axis} dict instead of bare
    traces (no segment API in this mode)."""
    from heatflow_tpu.ops.overlay import node_to_lattice
    from heatflow_tpu.ops.stencil import combine_operator
    from heatflow_tpu.sim.sweepkernel import vmem_sweep_scan

    prep = _overlay_prep(problem)
    if prep is None:
        raise ValueError("solver='vmem' needs a grid-overlay mesh (the "
                         "VMEM sweep kernel is stencil-form only)")
    idx_np, _inv_np, oshape, stn = prep
    nz, nr = oshape
    if jax.default_backend() == "tpu":
        if dtype != jnp.float32:
            raise ValueError("the VMEM kernel is f32-only on TPU")
        from heatflow_tpu.ops.pallas_cg import fits_in_vmem_batched
        if not fits_in_vmem_batched(nz, nr, dtype, n_points=9,
                                    rline=precondition == "rline",
                                    adi=precondition == "adi"):
            raise ValueError(
                f"sweep working set for the {nz}x{nr} overlay exceeds the "
                "VMEM budget; use solver='xla'")
    if precondition not in ("jacobi", "rline", "adi"):
        raise ValueError("solver='vmem' supports precondition='jacobi', "
                         "'rline' or 'adi'")
    if precondition in ("rline", "adi") and fixed_iters is not None:
        raise ValueError(f"{precondition}-preconditioned vmem sweeps are "
                         "tolerance-based (drop fixed_iters)")

    # f64_refine carries fields/residuals in f64 (ops assembled at f64,
    # f32 kernel operands cast inside the shared scan)
    wdt = jnp.float64 if f64_refine else dtype
    dt = jnp.asarray(problem.dt, wdt)
    ic = jnp.asarray(problem.ic_temp, wdt)
    K = jnp.asarray(stn["K"], wdt)            # (n_mats, 9, Nz, Nr)
    M = jnp.asarray(stn["M"], wdt)
    A0, M_op = combine_operator(K, M, jnp.asarray(problem.kappas, wdt),
                                jnp.asarray(problem.rho_cvs, wdt), dt)
    remap = lambda v: node_to_lattice(np.asarray(v), idx_np, oshape)
    nodes = problem.mesh.nodes
    ops = {
        "A0": A0, "K_var": K[m_idx], "M_op": M_op,
        "free": jnp.asarray(remap(~problem.dirichlet), wdt),
        "dirich": jnp.asarray(remap(problem.dirichlet), wdt),
        "r_sq": jnp.asarray(remap(nodes[:, 1] ** 2), wdt),
        "base": jnp.asarray(remap(problem.heat_mask), wdt),
        "heat_t": jnp.asarray(problem.heating.time, wdt),
        "heat_T": jnp.asarray(problem.heating.temp, wdt),
        "watch": jnp.asarray(idx_np[np.asarray(problem.watcher_nodes)]),
    }
    base_k = float(problem.kappas[m_idx])
    num_steps = int(problem.num_steps if num_steps is None else num_steps)
    extrapolate = warm_start == "extrapolate"

    rec = None
    if record_gradient:
        if problem.band_nodes is None:
            raise ValueError("gradient-recording sweeps need radial "
                             "sampling on the problem")
        # per-step projection through the batched VMEM kernel on the
        # SAME lattice (the overlay embedding is a node permutation, so
        # the lattice-form Mp/G computations equal the ELL ones)
        Mp = jnp.asarray(stn["Mp"], wdt)
        s_mp_lat = jax.lax.rsqrt(jnp.where(Mp[0] > 0, Mp[0], 1.0))
        rec = {"Mp": Mp, "Gr": jnp.asarray(stn["G"], wdt),
               "s_mp": s_mp_lat,
               "band_nodes": jnp.asarray(
                   idx_np[np.asarray(problem.band_nodes)]),
               "band_bins": jnp.asarray(problem.band_bins),
               "bin_counts": jnp.asarray(problem.bin_counts, dtype),
               "axis_nodes": jnp.asarray(
                   idx_np[np.asarray(problem.axis_nodes)])}

    def core(ops, rec, ks, fs, u0, u_pp, step0):
        return vmem_sweep_scan(ops, ks, fs, u0, u_pp, step0, dtype=dtype,
                               ic=ic, dt=dt, num_steps=num_steps,
                               base_k=base_k, fixed_iters=fixed_iters,
                               rtol=rtol, maxiter=maxiter,
                               extrapolate=extrapolate,
                               rline=precondition == "rline",
                               adi=precondition == "adi",
                               rtol_wrt=rtol_wrt, f64_refine=f64_refine,
                               record=rec, proj_rtol=proj_rtol,
                               proj_maxiter=proj_maxiter)

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = jax.tree.map(lambda _: P(), ops)
        rep_rec = jax.tree.map(lambda _: P(), rec)
        out0 = {k: P("config") for k in ("watch", "band", "axis")} \
            if rec is not None else P("config")
        core = shard_map(core, mesh=mesh,
                         in_specs=(rep, rep_rec, P("config"), P("config"),
                                   P("config"), P("config"), P()),
                         out_specs=(out0, P("config"), P("config")),
                         check_vma=False)

    def _batched(ops, rec, ks, fs):
        B = len(ks)
        u0 = jnp.full((B, nz, nr), ic, wdt)
        return core(ops, rec, ks, fs, u0, u0, jnp.asarray(0, wdt))[0]

    def _batched_seg(ops, rec, ks, fs, u0, u_pp, step0):
        return core(ops, rec, ks, fs, u0, u_pp, jnp.asarray(step0, wdt))

    if mesh is None:
        batched = jax.jit(_batched)
        batched_seg = jax.jit(_batched_seg)
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep_sh = jax.tree.map(lambda _: NamedSharding(mesh, P()), ops)
        rec_sh = jax.tree.map(lambda _: NamedSharding(mesh, P()), rec)
        cfg_sh = NamedSharding(mesh, P("config"))
        fld_sh = NamedSharding(mesh, P("config", None, None))
        sc_sh = NamedSharding(mesh, P())
        out0_sh = {k: cfg_sh for k in ("watch", "band", "axis")} \
            if rec is not None else cfg_sh
        batched = jax.jit(_batched,
                          in_shardings=(rep_sh, rec_sh, cfg_sh, cfg_sh),
                          out_shardings=out0_sh)
        batched_seg = jax.jit(
            _batched_seg,
            in_shardings=(rep_sh, rec_sh, cfg_sh, cfg_sh, fld_sh, fld_sh,
                          sc_sh),
            out_shardings=(out0_sh, fld_sh, fld_sh))

    def simulate_batch(sample_k, fwhm):
        out = batched(ops, rec, jnp.asarray(sample_k, wdt),
                      jnp.asarray(fwhm, wdt))
        if rec is not None:
            out = dict(out)
            out["times"] = np.arange(1, num_steps + 1) * problem.dt
        return out

    def segment(sample_k, fwhm, u0, step0, u_pp=None):
        """(traces, u_fin, u_penultimate) for one time chunk — identical
        contract to the structured ``make_sweep_fn(...).segment`` (fields
        live on the overlay lattice)."""
        u0 = jnp.asarray(u0, wdt)
        u_pp = u0 if u_pp is None else jnp.asarray(u_pp, wdt)
        return batched_seg(ops, rec, jnp.asarray(sample_k, wdt),
                           jnp.asarray(fwhm, wdt), u0, u_pp,
                           jnp.asarray(step0, wdt))

    simulate_batch.segment = segment
    simulate_batch.shape = (nz, nr)
    simulate_batch.ic_temp = float(problem.ic_temp)
    simulate_batch.dt = float(problem.dt)
    simulate_batch.times = (np.arange(1, num_steps + 1) * problem.dt)
    simulate_batch.watcher_names = list(problem.watcher_names)
    if record_gradient:
        simulate_batch.band_centers = problem.bin_centers
        simulate_batch.axis_z = problem.axis_z
    return simulate_batch


def make_sweep_fn_unstructured(problem: ProblemUnstructured, *,
                               vary_material: str = "p_sample",
                               dtype=jnp.float32, rtol: float = 1e-6,
                               maxiter: int = 4000,
                               fixed_iters: int | None = None,
                               warm_start: str = "previous",
                               solver: str = "xla",
                               record_gradient: bool = False,
                               num_steps: int | None = None,
                               mesh=None, rtol_wrt: str = "b",
                               precondition: str = "jacobi",
                               f64_refine: int = 0):
    """Batched sweep kernel on an imported unstructured mesh:
    simulate_batch(sample_k (B,), fwhm (B,)) -> watcher traces (B, S, W) —
    the unstructured mirror of ``sweepkernel.make_sweep_fn`` (one vmapped
    scan instead of one process per config, ref parameter_sweep.py:436-446).
    Differentiable in both inputs. Memoized per problem like the structured
    maker.

    ``solver='vmem'`` (grid-overlay meshes only): the exactly-assembled
    unstructured operator, in its permuted-9-point-stencil lattice form,
    runs through the same per-config VMEM Pallas kernels as structured
    sweeps — fixed budget with ``fixed_iters``, tolerance-based to ``rtol``
    otherwise. Imported-gmsh sweeps at VMEM speed.

    ``record_gradient=True``: each config additionally
    accumulates band/axis radial-gradient rows (the reference's per-run
    gradient CSVs, ref run_no_diamond.py:602-617); ``simulate_batch`` then
    returns the full dict instead of bare traces. With ``solver='vmem'``
    both the solve and the projection run through the batched Pallas
    kernel on the overlay lattice.

    ``mesh``: shard the config axis over the device mesh — unstructured
    sweeps fan out across chips exactly like structured ones (the
    reference's pool is mesh-kind-agnostic, ref parameter_sweep.py:436-446).
    Batch sizes must be a multiple of the 'config' axis (callers pad).
    ``num_steps`` overrides the chunk length for segmented execution
    (``.segment`` — solver='vmem' overlay path).

    ``rtol_wrt``, ``precondition`` ('jacobi'/'rline'/'adi', vmem) and
    ``f64_refine`` (vmem, f32+x64: mixed-precision f64-residual refinement
    per lane) mirror the structured ``make_sweep_fn``."""
    if f64_refine:
        # refined inner solves stop wrt their own per-pass residual; the
        # outer rtol_wrt has no effect — normalize it out of the cache key
        rtol_wrt = "b"
    cache_key = ("sweep_fn", vary_material, jnp.dtype(dtype).name, rtol,
                 maxiter, fixed_iters, warm_start, solver, record_gradient,
                 num_steps, mesh, rtol_wrt, precondition, f64_refine)
    cache = problem.__dict__.setdefault("_fn_cache", {})
    if cache_key in cache:
        return cache[cache_key]
    if warm_start not in ("previous", "extrapolate"):
        raise ValueError(f"unknown warm_start {warm_start!r} for sweep "
                         "engines (use 'previous' or 'extrapolate')")
    tag_order = sorted(problem.mesh.material_tags.items(),
                       key=lambda kv: kv[1])
    names = [nm for nm, _ in tag_order]
    m_idx = names.index(vary_material)
    if problem.watcher_nodes is None:
        raise ValueError("sweeps need watcher points on the problem")

    if solver == "vmem":
        if record_gradient and num_steps is not None:
            raise ValueError("recording sweeps run unsegmented (no "
                             "num_steps)")
        if f64_refine:
            if jnp.dtype(dtype) != jnp.float32:
                raise ValueError("f64_refine is the mixed-precision mode: "
                                 "dtype must be float32")
            if not jax.config.jax_enable_x64:
                raise ValueError("f64_refine needs jax_enable_x64=True")
            if fixed_iters is not None:
                raise ValueError("f64_refine composes with the "
                                 "tolerance-based solve (drop fixed_iters)")
        simulate_batch = _sweep_vmem_unstructured(
            problem, m_idx, dtype=dtype, rtol=rtol, maxiter=maxiter,
            fixed_iters=fixed_iters, warm_start=warm_start,
            num_steps=num_steps, mesh=mesh, rtol_wrt=rtol_wrt,
            precondition=precondition, f64_refine=f64_refine,
            record_gradient=record_gradient)
        cache[cache_key] = simulate_batch
        return simulate_batch
    if solver != "xla":
        raise ValueError(f"unknown solver {solver!r}")
    if num_steps is not None:
        raise ValueError("segmented (num_steps=...) unstructured sweeps "
                         "run through solver='vmem' (overlay meshes)")
    if f64_refine and not record_gradient:
        raise ValueError("f64_refine sweeps run through solver='vmem' "
                         "(the batched VMEM correction kernel); the XLA "
                         "path refines only with record_gradient (the "
                         "vmapped full stepper)")

    fn = make_simulate_fn_unstructured(
        problem, dtype=dtype, rtol=rtol, maxiter=maxiter,
        fixed_iters=fixed_iters, record_gradient=record_gradient,
        differentiable=fixed_iters is None and not record_gradient,
        warm_start=warm_start, rtol_wrt=rtol_wrt,
        precondition=precondition, f64_refine=f64_refine)
    # refine carries fields/coefficients in f64 (the stepper's cdt)
    wdt = jnp.float64 if f64_refine else dtype
    base_k = jnp.asarray(problem.kappas, wdt)
    rc = jnp.asarray(problem.rho_cvs, wdt)
    n = len(problem.mesh.nodes)
    ic = jnp.asarray(problem.ic_temp, wdt)

    # dev enters as an argument (not a closure constant — see stepper note)
    def one(dev, k, f, u0, t0):
        kp = base_k.at[m_idx].set(k)
        ys = fn.core(dev, kp, rc, f, u0, t0, None)
        if record_gradient:
            return ys
        return ys["watch"], ys["final_u"]

    _batched = lambda dev, ks, fs, u0, t0: jax.vmap(
        lambda k, f, u: one(dev, k, f, u, t0))(ks, fs, u0)
    if mesh is None:
        batched = jax.jit(_batched)
    else:
        # config-axis GSPMD: per-config fields sharded, problem arrays
        # replicated — each device integrates its shard of configs
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep_sh = jax.tree.map(lambda _: NamedSharding(mesh, P()), fn.dev)
        cfg_sh = NamedSharding(mesh, P("config"))
        fld_sh = NamedSharding(mesh, P("config", None))
        sc_sh = NamedSharding(mesh, P())
        batched = jax.jit(
            _batched,
            in_shardings=(rep_sh, cfg_sh, cfg_sh, fld_sh, sc_sh))

    def simulate_batch(sample_k, fwhm):
        B = len(np.asarray(sample_k))
        u0 = jnp.full((B, n), ic, wdt)
        out = batched(fn.dev, jnp.asarray(sample_k, wdt),
                      jnp.asarray(fwhm, wdt), u0,
                      jnp.asarray(0.0, wdt))
        if record_gradient:
            # host-side times: the device copy is sharded over configs, and
            # row 0 is not addressable on every process of a multihost run
            # (same fix as the structured recording maker)
            out["times"] = np.arange(1, problem.num_steps + 1) * problem.dt
            return out
        return out[0]

    simulate_batch.times = (np.arange(1, problem.num_steps + 1) * problem.dt)
    simulate_batch.watcher_names = list(problem.watcher_names)
    if record_gradient:
        simulate_batch.band_centers = problem.bin_centers
        simulate_batch.axis_z = problem.axis_z
    cache[cache_key] = simulate_batch
    return simulate_batch


def solve_steady_unstructured(problem: ProblemUnstructured,
                              bc_values: np.ndarray, *, f=None,
                              weighted: bool = False, dtype=jnp.float64,
                              rtol: float = 1e-11, maxiter: int = 50000):
    """Steady conduction solve Σ_m κ_m K_m u = f on the ELL operators with
    Dirichlet lifting — the unstructured mirror of ``steady.solve_steady``
    (ref space_and_forms.py:119-149)."""
    ell = problem.ell
    Ksrc = ell.K_vals if weighted else ell.Kf_vals
    if Ksrc is None:
        raise ValueError("ELL ops lack unweighted stiffness; re-assemble")
    cols = jnp.asarray(ell.cols)
    from heatflow_tpu.ops.stencil import material_combine
    K = material_combine(jnp.asarray(problem.kappas, dtype),
                         jnp.asarray(Ksrc, dtype))
    free = jnp.asarray(~problem.dirichlet, dtype)
    dirich = jnp.asarray(problem.dirichlet, dtype)
    g = jnp.asarray(bc_values, dtype) * dirich

    diag = ell_diag(ell.cols, K)
    s = jax.lax.rsqrt(jnp.where(diag > 0, diag, 1.0)) * free + dirich
    apply_s = lambda y: s * ell_apply(cols, K, s * y)

    if f is None:
        b = jnp.zeros_like(g)
    else:
        Msrc = ell.M_vals if weighted else ell.Mf_vals
        M_unit = jnp.einsum("mnk->nk", jnp.asarray(Msrc, dtype))
        b = ell_apply(cols, M_unit, jnp.asarray(f, dtype))

    b_lift = (b - ell_apply(cols, K, g)) * s * free
    sol = pcg(apply_s, b_lift, jnp.zeros_like(g), mask=free, rtol=rtol,
              maxiter=maxiter)
    u = sol.x * s * free + g
    return np.asarray(u), {"iters": int(sol.iters),
                           "residual": float(sol.residual),
                           "converged": bool(sol.converged)}
