"""VMEM-resident Pallas CG kernel — interpreter-mode validation on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heatflow_tpu.geometry import build_layout
from heatflow_tpu.mesh.structured import build_structured_mesh
from heatflow_tpu.ops.cg import pcg
from heatflow_tpu.ops.pallas_cg import (cg_vmem_tol, fits_in_vmem,
                                        masked_scaled_operator)
from heatflow_tpu.ops.stencil import apply_stencil, assemble_stencils, \
    combine_operator
from tests.fixtures import tiny_no_diamond_cfg


@pytest.fixture(scope="module")
def system():
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    pack = assemble_stencils(mesh)
    kp = jnp.asarray([m.kappa for m in mats])
    rc = jnp.asarray([m.rho_cv for m in mats])
    A, _ = combine_operator(jnp.asarray(pack.K), jnp.asarray(pack.M), kp, rc,
                            1.5e-7)
    rng = np.random.default_rng(0)
    free = jnp.asarray((rng.random(mesh.shape) > 0.15).astype(float))
    s = jax.lax.rsqrt(jnp.where(A[0] > 0, A[0], 1.0)) * free + (1 - free)
    sm = s * free
    x_true = jnp.asarray(rng.standard_normal(mesh.shape)) * free
    b = sm * apply_stencil(A, sm * x_true)
    return A, sm, free, b, x_true


def test_kernel_matches_xla_cg(system):
    A, sm, free, b, x_true = system
    # merged=False: the standard recurrence, bitwise the XLA trajectory
    x, iters = cg_vmem_tol(A, sm, b, jnp.zeros_like(b), 1e-11,
                           maxiter=20000, interpret=True, merged=False)
    err = float(jnp.abs(x - x_true).max() / jnp.abs(x_true).max())
    assert err < 1e-8
    assert 0 < int(iters) < 20000

    apply_s = lambda y: sm * apply_stencil(A, sm * y)
    ref = pcg(apply_s, b, jnp.zeros_like(b), mask=free, rtol=1e-11,
              maxiter=20000, rtol_wrt="r0")
    # identical Krylov recurrence + per-iteration convergence checks
    # (CHECK_EVERY=1) → exact iteration-count equality with the XLA path
    assert int(iters) == int(ref.iters), (int(iters), int(ref.iters))


def test_merged_kernel_tolerance_class(system):
    """The merged-dot (Chronopoulos–Gear) recurrence option solves to the
    same answer at the same stopping rule with a tolerance-equal (not
    bitwise) trajectory: iteration counts within a few of the standard
    recurrence, solution at the solve tolerance."""
    A, sm, free, b, x_true = system
    x_m, it_m = cg_vmem_tol(A, sm, b, jnp.zeros_like(b), 1e-11,
                            maxiter=20000, interpret=True, merged=True)
    x_s, it_s = cg_vmem_tol(A, sm, b, jnp.zeros_like(b), 1e-11,
                            maxiter=20000, interpret=True, merged=False)
    err = float(jnp.abs(x_m - x_true).max() / jnp.abs(x_true).max())
    assert err < 1e-8
    assert abs(int(it_m) - int(it_s)) <= max(3, int(0.05 * int(it_s)))
    # true-residual stopping holds for the merged recurrence too
    r = np.asarray(b - sm * apply_stencil(A, sm * x_m))
    r0 = np.asarray(b)
    assert np.linalg.norm(r) <= 1.2e-11 * np.linalg.norm(r0)

    # and with the rline PCR preconditioner (the production configuration)
    from heatflow_tpu.ops.pallas_cg import pcr_pack
    s = jnp.where(sm > 0, sm, 1.0)
    pcr = pcr_pack(A, s, free)
    x_p, it_p = cg_vmem_tol(A, sm, b, jnp.zeros_like(b), 1e-11,
                            maxiter=20000, interpret=True, merged=True,
                            pcr=pcr)
    err_p = float(jnp.abs(x_p - x_true).max() / jnp.abs(x_true).max())
    assert err_p < 1e-8
    assert 0 < int(it_p) < int(it_m)   # preconditioning still cuts iters


def test_kernel_respects_tolerance(system):
    A, sm, free, b, x_true = system
    x_loose, it_loose = cg_vmem_tol(A, sm, b, jnp.zeros_like(b), 1e-2,
                                    maxiter=20000, interpret=True)
    x_tight, it_tight = cg_vmem_tol(A, sm, b, jnp.zeros_like(b), 1e-10,
                                    maxiter=20000, interpret=True)
    assert int(it_loose) < int(it_tight)
    e_loose = float(jnp.abs(x_loose - x_true).max())
    e_tight = float(jnp.abs(x_tight - x_true).max())
    assert e_tight < e_loose


def test_fits_in_vmem_thresholds():
    assert fits_in_vmem(251, 1107)            # flagship
    assert not fits_in_vmem(4000, 4000)       # way too big


def test_masked_scaled_operator_identity(system):
    """sanity for the (deprecated for solving, kept for analysis) baked
    operator: matches on-the-fly application in f64."""
    A, sm, free, b, x_true = system
    C, s = masked_scaled_operator(A, free)
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal(b.shape))
    lhs = apply_stencil(C, v)
    rhs = s * free * apply_stencil(A, s * free * v) + (1 - free) * v
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-12,
                               atol=1e-12 * float(jnp.abs(rhs).max()))


# ----------------------------------------------------------------------
# batched per-config sweep kernel (VERDICT r1 item 4)
# ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def sweep_setup(tmp_path_factory):
    from heatflow_tpu.sim.bc import HeatingCurve
    from heatflow_tpu.sim.problem import build_problem
    from tests.fixtures import synthetic_heating
    root = tmp_path_factory.mktemp("pall")
    heat_csv = root / "heat.csv"
    synthetic_heating(heat_csv)
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    cfg["heating"]["file"] = str(heat_csv)
    cfg["timing"]["num_steps"] = 4
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    heating = HeatingCurve.from_csv(str(heat_csv))
    return build_problem(mesh, heating, cfg,
                         watcher_points={"p": (0.0, 0.0), "o": (1e-6, 0.0)})


def test_cg_vmem_batched_matches_pcg_fixed(system):
    """Per-config kernel trajectories equal the XLA pcg_fixed trajectories
    on the same scaled operators."""
    from heatflow_tpu.ops.cg import pcg_fixed
    from heatflow_tpu.ops.pallas_cg import cg_vmem_batched
    A, sm, free, b, x_true = system
    Kv = 0.05 * A                       # any symmetric perturbation stencil
    dks = jnp.asarray([0.0, 0.3, -0.2])
    B = len(dks)
    bb = jnp.stack([b, 1.5 * b, 0.7 * b])
    smb = jnp.stack([sm] * B)
    x = cg_vmem_batched(A, Kv, dks, smb, bb, jnp.zeros_like(bb),
                        iters=40, interpret=True)
    for i in range(B):
        Ai = A + dks[i] * Kv
        apply_s = lambda y: sm * apply_stencil(Ai, sm * y)
        ref = pcg_fixed(apply_s, bb[i], jnp.zeros_like(b), mask=free,
                        iters=40).x
        np.testing.assert_allclose(np.asarray(x[i]), np.asarray(ref),
                                   rtol=1e-8, atol=1e-8)


def test_sweep_fn_vmem_matches_xla(sweep_setup):
    """make_sweep_fn(solver='vmem') equals the XLA path exactly (same
    fixed-iteration trajectories), incl. the time-chunked runner."""
    from heatflow_tpu.sim.sweepkernel import (make_sweep_fn,
                                              run_sweep_time_chunked)
    problem = sweep_setup
    ks = np.array([2.0, 3.8, 7.0])
    fs = np.array([5e-6, 6e-6, 8e-6])
    ref = np.asarray(make_sweep_fn(problem, dtype=jnp.float64,
                                   fixed_iters=30)(ks, fs))
    got = np.asarray(make_sweep_fn(problem, dtype=jnp.float64,
                                   fixed_iters=30, solver="vmem")(ks, fs))
    np.testing.assert_allclose(got, ref, rtol=1e-11,
                               atol=1e-11 * np.abs(ref).max())

    ch = run_sweep_time_chunked(problem, ks, fs, step_chunk=3,
                                fixed_iters=30, dtype=jnp.float64,
                                solver="vmem")
    np.testing.assert_allclose(ch, ref, rtol=1e-11,
                               atol=1e-11 * np.abs(ref).max())


def test_cg_vmem_batched_tol_converges_per_config(system):
    """The tolerance-based batched kernel solves every config to its
    stopping rule (||r|| <= rtol ||b||, same as ops.cg.pcg) and reports
    per-config iteration counts."""
    from heatflow_tpu.ops.pallas_cg import cg_vmem_batched_tol
    A, sm, free, b, x_true = system
    Kv = 0.05 * A
    dks = jnp.asarray([0.0, 0.3, -0.2])
    B = len(dks)
    bb = jnp.stack([b, 1.5 * b, 0.7 * b])
    smb = jnp.stack([sm] * B)
    rtol = 1e-9
    x, it = cg_vmem_batched_tol(A, Kv, dks, smb, bb, jnp.zeros_like(bb),
                                rtol, maxiter=400, interpret=True)
    it = np.asarray(it)
    assert (it > 0).all() and (it < 400).all()
    for i in range(B):
        Ai = A + dks[i] * Kv
        r = np.asarray(bb[i] - sm * apply_stencil(Ai, sm * x[i]))
        assert np.linalg.norm(r) <= rtol * np.linalg.norm(np.asarray(bb[i]))


def test_sweep_fn_vmem_tolerance_mode(sweep_setup):
    """make_sweep_fn(solver='vmem') without fixed_iters runs the
    tolerance-based batched kernel; traces agree with the XLA pcg_solve
    path at the same rtol (the kernel checks convergence every 8
    iterations, so it may converge slightly tighter — never looser)."""
    from heatflow_tpu.sim.sweepkernel import make_sweep_fn
    problem = sweep_setup
    ks = np.array([2.0, 3.8, 7.0])
    fs = np.array([5e-6, 6e-6, 8e-6])
    ref = np.asarray(make_sweep_fn(problem, dtype=jnp.float64,
                                   rtol=1e-11, maxiter=20000)(ks, fs))
    got = np.asarray(make_sweep_fn(problem, dtype=jnp.float64, rtol=1e-11,
                                   maxiter=20000, solver="vmem")(ks, fs))
    np.testing.assert_allclose(got, ref, rtol=0,
                               atol=1e-7 * np.abs(ref).max())


def test_kernel_supports_9point_overlay_stencils(system):
    """The VMEM kernel accepts 9-plane (grid-overlay RAP-pattern) operators;
    trajectories match XLA CG on the same operator."""
    from heatflow_tpu.ops.stencil import OFFSETS9, _shifted
    A, sm, free, b, x_true = system
    # extend to a symmetric 9-point operator: small anti-diagonal couplings
    # scaled by the local diagonal (keeps SPD), the pattern of a
    # mixed-diagonal overlay mesh. Symmetry: C8[i,j] = C7[i-1,j+1].
    extra7 = -1e-3 * jnp.sqrt(jnp.abs(A[0] * _shifted(A[0], 1, -1)))
    extra8 = _shifted(extra7, -1, 1)
    A9 = jnp.concatenate([A, extra7[None], extra8[None]], axis=0)

    def apply9(v):
        out = A9[0] * v
        for k, (di, dj) in enumerate(OFFSETS9[1:], start=1):
            out = out + A9[k] * _shifted(v, di, dj)
        return out

    apply_s = lambda y: sm * apply9(sm * y)
    b9 = sm * apply9(sm * x_true)
    x, iters = cg_vmem_tol(A9, sm, b9, jnp.zeros_like(b9), 1e-12,
                           maxiter=20000, interpret=True)
    ref = pcg(apply_s, b9, jnp.zeros_like(b9), mask=free, rtol=1e-12,
              maxiter=20000)
    scale = np.abs(np.asarray(x_true)).max()
    assert np.abs(np.asarray(x) - np.asarray(x_true)).max() / scale < 1e-8
    # per-iteration checks (CHECK_EVERY=1): counts match the XLA path up
    # to ulp-level trajectory ties at the stopping threshold
    assert abs(int(iters) - int(ref.iters)) <= 1


def test_sweep_driver_vmem_solver(tmp_path):
    """run_parameter_sweep(solver='vmem') drives the Pallas sweep kernel
    (interpreter mode on CPU) and matches the XLA driver run."""
    import pandas as pd
    import yaml
    from heatflow_tpu.drivers.sweep import run_parameter_sweep
    cfg_path = tmp_path / "cfg.yaml"
    cfg = dict(tiny_no_diamond_cfg(coarse=3.0))
    from tests.fixtures import synthetic_heating
    heat = tmp_path / "h.csv"
    synthetic_heating(heat)
    cfg["heating"]["file"] = str(heat)
    cfg["timing"]["num_steps"] = 3
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    kwargs = dict(fwhm_range=(5e-6, 8e-6), k_range=(2.0, 7.0),
                  width_range=(1.84e-6, 1.84e-6), num_points=(2, 2, 1),
                  suppress_print=True, dtype=jnp.float64,
                  devices=[jax.devices()[0]])
    r_v, f_v = run_parameter_sweep(
        str(cfg_path), str(tmp_path / "v"),
        base_mesh_folder=str(tmp_path / "mv"),
        solver="vmem", fixed_iters=25, **kwargs)
    r_x, f_x = run_parameter_sweep(
        str(cfg_path), str(tmp_path / "x"),
        base_mesh_folder=str(tmp_path / "mx"),
        fixed_iters=25, **kwargs)
    assert len(r_v) == len(r_x) == 4 and not f_v and not f_x
    for a, b in zip(r_v, r_x):
        ta = pd.read_csv(f"{tmp_path}/v/{a['run_name']}/watcher_points.csv")
        tb = pd.read_csv(f"{tmp_path}/x/{b['run_name']}/watcher_points.csv")
        np.testing.assert_allclose(ta.to_numpy(), tb.to_numpy(), rtol=1e-9)


def test_kernel_cheb_preconditioner(system):
    """cheb_degree>0 converges to the same solution in fewer CG iterations;
    stopping still honors the true-residual tolerance."""
    A, sm, free, b, x_true = system
    x0, it0 = cg_vmem_tol(A, sm, b, jnp.zeros_like(b), 1e-10,
                          maxiter=20000, interpret=True)
    x3, it3 = cg_vmem_tol(A, sm, b, jnp.zeros_like(b), 1e-10,
                          maxiter=20000, interpret=True, cheb_degree=3)
    scale = float(jnp.abs(x_true).max())
    assert float(jnp.abs(x3 - x_true).max()) / scale < 1e-8
    assert int(it3) < int(it0) / 1.4, f"{int(it3)} vs {int(it0)}"


def test_kernel_pcr_preconditioner(system):
    """In-kernel r-line PCR block-Jacobi: converges to the same solution,
    in fewer iterations, and matches the XLA line_preconditioner path
    (same preconditioned Krylov process)."""
    from heatflow_tpu.ops.linesolve import line_preconditioner
    from heatflow_tpu.ops.pallas_cg import pcr_pack
    A, sm, free, b, x_true = system
    s = jnp.where(free > 0, sm, 1.0)
    pcr = pcr_pack(A, s, free)
    x, it = cg_vmem_tol(A, sm, b, jnp.zeros_like(b), 1e-11,
                        maxiter=20000, interpret=True, pcr=pcr)
    err = float(jnp.abs(x - x_true).max() / jnp.abs(x_true).max())
    assert err < 1e-8
    x0, it0 = cg_vmem_tol(A, sm, b, jnp.zeros_like(b), 1e-11,
                          maxiter=20000, interpret=True)
    assert int(it) < int(it0)
    apply_s = lambda y: sm * apply_stencil(A, sm * y)
    pre = line_preconditioner(A, s, free, axis=-1)
    ref = pcg(apply_s, b, jnp.zeros_like(b), precond=pre, mask=free,
              rtol=1e-11, maxiter=20000, rtol_wrt="r0")
    # PCR applies the same preconditioner with a different arithmetic
    # order than the XLA line_preconditioner — ulp-level trajectory
    # differences can shift the stopping iteration slightly
    assert abs(int(it) - int(ref.iters)) <= max(4, int(ref.iters) // 10)


def test_kernel_adi_preconditioner(system):
    """In-kernel split-additive ADI (r-line + z-line PCR, R r + Z r − r):
    converges to the same solution, in fewer iterations than rline alone,
    and matches the XLA adi_preconditioner path (same preconditioned
    Krylov process)."""
    from heatflow_tpu.ops.linesolve import adi_preconditioner
    from heatflow_tpu.ops.pallas_cg import pcr_pack
    A, sm, free, b, x_true = system
    s = jnp.where(free > 0, sm, 1.0)
    pcr = pcr_pack(A, s, free)
    pcr_z = pcr_pack(A, s, free, axis=-2)
    x, it = cg_vmem_tol(A, sm, b, jnp.zeros_like(b), 1e-11,
                        maxiter=20000, interpret=True, pcr=pcr,
                        pcr_z=pcr_z)
    err = float(jnp.abs(x - x_true).max() / jnp.abs(x_true).max())
    assert err < 1e-8
    _, it_r = cg_vmem_tol(A, sm, b, jnp.zeros_like(b), 1e-11,
                          maxiter=20000, interpret=True, pcr=pcr)
    assert int(it) < int(it_r), (int(it), int(it_r))
    apply_s = lambda y: sm * apply_stencil(A, sm * y)
    pre = adi_preconditioner(A, s, free)
    ref = pcg(apply_s, b, jnp.zeros_like(b), precond=pre, mask=free,
              rtol=1e-11, maxiter=20000, rtol_wrt="r0")
    assert abs(int(it) - int(ref.iters)) <= max(4, int(ref.iters) // 10)
    # pcr_z without pcr is rejected
    with pytest.raises(ValueError):
        cg_vmem_tol(A, sm, b, jnp.zeros_like(b), 1e-11, maxiter=100,
                    interpret=True, pcr_z=pcr_z)


def test_stepper_vmem_rline_matches_xla_rline(system):
    """make_simulate_fn(solver='vmem', precondition='rline') in interpreter
    mode equals the XLA rline stepper."""
    import os, tempfile
    from tests.fixtures import synthetic_heating, tiny_no_diamond_cfg
    from heatflow_tpu.geometry import build_layout as _bl, \
        coupler_watcher_points
    from heatflow_tpu.sim.bc import HeatingCurve
    from heatflow_tpu.sim.problem import build_problem
    from heatflow_tpu.sim.stepper import make_simulate_fn
    from heatflow_tpu.ops import pallas_cg as pcg_mod
    td = tempfile.mkdtemp()
    heat = os.path.join(td, "heat.csv")
    synthetic_heating(heat)
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    cfg["heating"]["file"] = heat
    cfg["timing"]["num_steps"] = 3
    domain, mats = _bl(cfg)
    mesh = build_structured_mesh(domain, mats)
    problem = build_problem(mesh, HeatingCurve.from_csv(heat), cfg,
                            watcher_points=coupler_watcher_points(cfg))
    ys_x = make_simulate_fn(problem, dtype=jnp.float32, rtol=1e-6,
                            precondition="rline", record_gradient=False,
                            rtol_wrt="b")()
    import unittest.mock as mock
    real = pcg_mod.cg_vmem_tol.__wrapped__ if hasattr(
        pcg_mod.cg_vmem_tol, "__wrapped__") else None
    orig = pcg_mod.cg_vmem_tol
    def interp_tol(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)
    with mock.patch("heatflow_tpu.ops.pallas_cg.cg_vmem_tol", interp_tol), \
         mock.patch("heatflow_tpu.ops.pallas_cg.fits_in_vmem",
                    lambda *a, **k: True):
        ys_v = make_simulate_fn(problem, dtype=jnp.float32, rtol=1e-6,
                                precondition="rline",
                                record_gradient=False, rtol_wrt="b",
                                solver="vmem")()
    wx = np.asarray(ys_x["watch"]); wv = np.asarray(ys_v["watch"])
    # two independently-stopped f32 solvers (the kernel checks convergence
    # every CHECK_EVERY iterations): equality to a fraction of a Kelvin on
    # ~1e3 K traces, not bitwise
    assert np.abs(wx - wv).max() < 0.1, np.abs(wx - wv).max()


def test_sweep_tol_kernel_rline_preconditioner(sweep_setup):
    """Batched tolerance kernel with in-kernel r-line PCR factoring: same
    converged traces as the jacobi kernel, fewer iterations per config."""
    from heatflow_tpu.ops.pallas_cg import cg_vmem_batched_tol
    from heatflow_tpu.ops.stencil import combine_operator
    problem = sweep_setup
    dev = problem.device_arrays(jnp.float64)
    dt = jnp.asarray(problem.dt, jnp.float64)
    A0, _ = combine_operator(dev["K"], dev["M"], dev["kappas"],
                             dev["rho_cvs"], dt)
    Kv = dev["K"][0]
    free = dev["free"]
    rng = np.random.default_rng(5)
    B = 3
    dks = jnp.asarray(rng.uniform(0.0, 2.0, B) * float(dt), jnp.float64)
    diag = A0[0][None] + dks[:, None, None] * Kv[0][None]
    s = jax.lax.rsqrt(jnp.where(diag > 0, diag, 1.0)) * free \
        + dev["dirichlet"]
    sm = s * free
    x_true = jnp.asarray(rng.standard_normal((B,) + free.shape)) * free
    b = jax.vmap(lambda dk, smi, v: smi * apply_stencil(
        A0 + dk * Kv, smi * v))(dks, sm, x_true)
    z = jnp.zeros_like(b)
    xj, itj = cg_vmem_batched_tol(A0, Kv, dks, sm, b, z, 1e-11,
                                  maxiter=20000, interpret=True)
    xr, itr = cg_vmem_batched_tol(A0, Kv, dks, sm, b, z, 1e-11,
                                  maxiter=20000, interpret=True, rline=True)
    for i in range(B):
        np.testing.assert_allclose(np.asarray(xr[i]), np.asarray(x_true[i]),
                                   rtol=1e-7, atol=1e-8)
        assert int(itr[i]) < int(itj[i]), (i, int(itr[i]), int(itj[i]))


def test_sweep_fn_vmem_rline_matches_jacobi(sweep_setup):
    """make_sweep_fn(solver='vmem', precondition='rline'): converged traces
    equal the jacobi-kernel traces at tight tolerance."""
    from heatflow_tpu.sim.sweepkernel import make_sweep_fn
    problem = sweep_setup
    ks = np.array([2.0, 3.8, 7.0])
    fs = np.array([5e-6, 6e-6, 8e-6])
    ref = np.asarray(make_sweep_fn(problem, dtype=jnp.float64, rtol=1e-10,
                                   solver="vmem")(ks, fs))
    got = np.asarray(make_sweep_fn(problem, dtype=jnp.float64, rtol=1e-10,
                                   solver="vmem",
                                   precondition="rline")(ks, fs))
    np.testing.assert_allclose(got, ref, rtol=1e-8,
                               atol=1e-8 * np.abs(ref).max())
    with pytest.raises(ValueError, match="tolerance-based"):
        make_sweep_fn(problem, solver="vmem", precondition="rline",
                      fixed_iters=10)


def test_sweep_tol_kernel_adi_preconditioner(sweep_setup):
    """Batched tolerance kernel with BOTH line stacks factored in-kernel
    (adi=True): same converged solutions, fewer iterations than the
    r-line-only kernel, and the same preconditioned Krylov process as the
    XLA adi_preconditioner (iteration counts within ulp slack)."""
    from heatflow_tpu.ops.cg import pcg
    from heatflow_tpu.ops.linesolve import adi_preconditioner
    from heatflow_tpu.ops.pallas_cg import cg_vmem_batched_tol
    from heatflow_tpu.ops.stencil import combine_operator
    problem = sweep_setup
    dev = problem.device_arrays(jnp.float64)
    dt = jnp.asarray(problem.dt, jnp.float64)
    A0, _ = combine_operator(dev["K"], dev["M"], dev["kappas"],
                             dev["rho_cvs"], dt)
    Kv = dev["K"][0]
    free = dev["free"]
    rng = np.random.default_rng(7)
    B = 3
    dks = jnp.asarray(rng.uniform(0.0, 2.0, B) * float(dt), jnp.float64)
    diag = A0[0][None] + dks[:, None, None] * Kv[0][None]
    s = jax.lax.rsqrt(jnp.where(diag > 0, diag, 1.0)) * free \
        + dev["dirichlet"]
    sm = s * free
    x_true = jnp.asarray(rng.standard_normal((B,) + free.shape)) * free
    b = jax.vmap(lambda dk, smi, v: smi * apply_stencil(
        A0 + dk * Kv, smi * v))(dks, sm, x_true)
    z = jnp.zeros_like(b)
    xr, itr = cg_vmem_batched_tol(A0, Kv, dks, sm, b, z, 1e-11,
                                  maxiter=20000, interpret=True, rline=True)
    xa, ita = cg_vmem_batched_tol(A0, Kv, dks, sm, b, z, 1e-11,
                                  maxiter=20000, interpret=True, adi=True)
    for i in range(B):
        np.testing.assert_allclose(np.asarray(xa[i]), np.asarray(x_true[i]),
                                   rtol=1e-7, atol=1e-8)
        assert int(ita[i]) < int(itr[i]), (i, int(ita[i]), int(itr[i]))
        # same preconditioned operator as the XLA composition
        A_i = A0 + dks[i] * Kv
        apply_s = lambda y: sm[i] * apply_stencil(A_i, sm[i] * y)
        pre = adi_preconditioner(A_i, s[i], free)
        ref = pcg(apply_s, b[i], z[i], precond=pre, mask=free,
                  rtol=1e-11, maxiter=20000, rtol_wrt="b")
        assert abs(int(ita[i]) - int(ref.iters)) \
            <= max(4, int(ref.iters) // 10), (int(ita[i]), int(ref.iters))
    with pytest.raises(ValueError, match="mutually exclusive"):
        cg_vmem_batched_tol(A0, Kv, dks, sm, b, z, 1e-11, maxiter=100,
                            interpret=True, rline=True, adi=True)


def test_sweep_fn_vmem_adi_matches_jacobi(sweep_setup):
    """make_sweep_fn(solver='vmem', precondition='adi'): converged traces
    equal the jacobi-kernel traces at tight tolerance; fixed_iters is
    rejected (tolerance-based only, like rline)."""
    from heatflow_tpu.sim.sweepkernel import make_sweep_fn
    problem = sweep_setup
    ks = np.array([2.0, 3.8, 7.0])
    fs = np.array([5e-6, 6e-6, 8e-6])
    ref = np.asarray(make_sweep_fn(problem, dtype=jnp.float64, rtol=1e-10,
                                   solver="vmem")(ks, fs))
    got = np.asarray(make_sweep_fn(problem, dtype=jnp.float64, rtol=1e-10,
                                   solver="vmem",
                                   precondition="adi")(ks, fs))
    np.testing.assert_allclose(got, ref, rtol=1e-8,
                               atol=1e-8 * np.abs(ref).max())
    # the XLA sweep path accepts 'adi' too (per-config adi_preconditioner)
    got_x = np.asarray(make_sweep_fn(problem, dtype=jnp.float64, rtol=1e-10,
                                     solver="xla",
                                     precondition="adi")(ks, fs))
    np.testing.assert_allclose(got_x, ref, rtol=1e-8,
                               atol=1e-8 * np.abs(ref).max())
    with pytest.raises(ValueError, match="tolerance-based"):
        make_sweep_fn(problem, solver="vmem", precondition="adi",
                      fixed_iters=10)


def test_stepper_adaptive_precondition_interpret():
    """make_simulate_fn(precondition='adaptive'): the per-step rline/adi
    switch produces tolerance-class traces vs the rline stepper, engages
    BOTH kernels across a transient (the cold first step exceeds the
    threshold, warm-started late steps fall below it), and validates its
    vmem-only constraint."""
    import os
    import tempfile
    import unittest.mock as mock

    import pytest as _pytest

    from heatflow_tpu.geometry import build_layout as _bl, \
        coupler_watcher_points
    from heatflow_tpu.ops import pallas_cg as pcg_mod
    from heatflow_tpu.sim.bc import HeatingCurve
    from heatflow_tpu.sim.problem import build_problem
    from heatflow_tpu.sim.stepper import make_simulate_fn
    from tests.fixtures import synthetic_heating

    td = tempfile.mkdtemp()
    heat = os.path.join(td, "heat.csv")
    synthetic_heating(heat)
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    cfg["heating"]["file"] = heat
    cfg["timing"]["num_steps"] = 6
    domain, mats = _bl(cfg)
    mesh = build_structured_mesh(domain, mats)
    problem = build_problem(mesh, HeatingCurve.from_csv(heat), cfg,
                            watcher_points=coupler_watcher_points(cfg))

    # no XLA fallback exists for the switch — off the VMEM path it raises
    with _pytest.raises(ValueError, match="adaptive"):
        make_simulate_fn(problem, dtype=jnp.float32,
                         precondition="adaptive", record_gradient=False)

    ys_x = make_simulate_fn(problem, dtype=jnp.float32, rtol=1e-6,
                            precondition="rline", record_gradient=False,
                            rtol_wrt="b")()
    orig = pcg_mod.cg_vmem_tol

    def interp_tol(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    with mock.patch("heatflow_tpu.ops.pallas_cg.cg_vmem_tol", interp_tol), \
         mock.patch("heatflow_tpu.ops.pallas_cg.fits_in_vmem",
                    lambda *a, **k: True):
        # threshold chosen mid-profile so both branches are exercised
        ys_a = make_simulate_fn(problem, dtype=jnp.float32, rtol=1e-6,
                                precondition="adaptive",
                                record_gradient=False, rtol_wrt="b",
                                solver="vmem", adaptive_thresh=25)()
    wx = np.asarray(ys_x["watch"])
    wa = np.asarray(ys_a["watch"])
    assert np.isfinite(wa).all()
    # two independently-stopped f32 solvers: sub-Kelvin traces on ~1e3 K
    assert np.abs(wx - wa).max() < 0.5, np.abs(wx - wa).max()
    its = np.asarray(ys_a["cg_iters"])
    # first (cold) step must be deep, late (warm) steps shallow — the
    # switch sees both regimes in this transient
    assert its[0] > 25 and its.min() <= 25, its.tolist()
