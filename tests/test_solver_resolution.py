"""Round-3 review fixes: engine/preconditioner resolution edge cases.

1. ``make_simulate_fn(solver='vmem')`` on an over-budget problem raises
   (the guard had become dead code nested under ``mesh is not None``, so
   an explicit VMEM request silently ran — and reported — the XLA path).
2. ``make_simulate_fn(mesh=..., solver='auto')`` resolves to the XLA path
   instead of raising on problems that would fit VMEM on TPU f32 (the
   documented ``run2d --z-shards`` combination with the default solver).
3. ``precondition='zline'``: the VMEM kernel has no z-line PCR — an
   explicit ``solver='vmem'`` errors instead of silently dropping the
   preconditioner, and ``'auto'`` routes to the XLA path which honors it.
4. Unstructured rline runs ONLY on the grid-overlay VMEM engine: asking
   for it with an engine that cannot apply it raises instead of silently
   running unpreconditioned; drivers resolve DEFAULTED rline through
   ``auto_selects_vmem`` first.
5. Sweep-driver rtol defaults are width-independent — the resolution used
   to mutate its own "was rtol given?" check inside the width loop, so
   recording sweeps lost the tighter 1e-5 default from width 2 on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from heatflow_tpu.geometry import build_layout, coupler_watcher_points
from heatflow_tpu.mesh.structured import build_structured_mesh
from heatflow_tpu.sim.bc import HeatingCurve
from heatflow_tpu.sim.problem import build_problem
from heatflow_tpu.sim.stepper import make_simulate_fn
from tests.fixtures import synthetic_heating, tiny_no_diamond_cfg


@pytest.fixture()
def tiny_problem(tmp_path):
    heat_csv = tmp_path / "heat.csv"
    synthetic_heating(heat_csv)
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    cfg["heating"]["file"] = str(heat_csv)
    cfg["timing"]["num_steps"] = 3
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    problem = build_problem(mesh, HeatingCurve.from_csv(str(heat_csv)), cfg,
                            watcher_points=coupler_watcher_points(cfg))
    return cfg, problem


def test_vmem_budget_guard_raises(tiny_problem, monkeypatch):
    import heatflow_tpu.ops.pallas_cg as pcg_mod
    _cfg, problem = tiny_problem
    monkeypatch.setattr(pcg_mod, "fits_in_vmem",
                        lambda *a, **k: False)
    with pytest.raises(ValueError, match="VMEM budget"):
        make_simulate_fn(problem, dtype=jnp.float32, solver="vmem",
                         maxiter=7701)


def test_zline_vmem_raises_auto_falls_back(tiny_problem, monkeypatch):
    _cfg, problem = tiny_problem
    with pytest.raises(ValueError, match="zline"):
        make_simulate_fn(problem, dtype=jnp.float32, solver="vmem",
                         precondition="zline", maxiter=7702)

    # 'auto' on (emulated) TPU f32 would pick VMEM — zline must route to
    # the XLA path, which applies the preconditioner, not drop it
    import heatflow_tpu.sim.stepper as stepper_mod
    monkeypatch.setattr(stepper_mod.jax, "default_backend", lambda: "tpu")
    fn = make_simulate_fn(problem, dtype=jnp.float32, solver="auto",
                          precondition="zline", rtol=1e-4, maxiter=7703)
    monkeypatch.undo()
    ys = fn()
    assert np.isfinite(np.asarray(ys["watch"])).all()
    assert np.asarray(ys["cg_iters"]).max() > 0


def test_mesh_with_auto_resolves_to_xla(tiny_problem, monkeypatch):
    """run2d --z-shards N with the default solver='auto' must build and
    run (previously: hard ValueError whenever the problem fit VMEM)."""
    from heatflow_tpu.parallel.sharding import config_mesh
    import heatflow_tpu.sim.stepper as stepper_mod
    _cfg, problem = tiny_problem
    nz = problem.mesh.shape[0]
    zs = 2 if nz % 2 == 0 else 1
    if zs == 1:
        pytest.skip("odd Nz in fixture")
    dmesh = config_mesh(zs, z_shards=zs)

    monkeypatch.setattr(stepper_mod.jax, "default_backend", lambda: "tpu")
    fn = make_simulate_fn(problem, dtype=jnp.float32, solver="auto",
                          mesh=dmesh, rtol=1e-4, maxiter=7704,
                          record_gradient=False)
    monkeypatch.undo()
    ys = fn()
    assert np.isfinite(np.asarray(ys["watch"])).all()

    # explicit 'vmem' with a device mesh still errors (whole problems stay
    # on one chip in the VMEM engine)
    with pytest.raises(ValueError, match="z-sharding"):
        make_simulate_fn(problem, dtype=jnp.float32, solver="vmem",
                         mesh=dmesh, maxiter=7705)


def test_unstructured_rline_requires_vmem_engine(tmp_path):
    from heatflow_tpu.mesh.unstructured_gen import build_unstructured_mesh
    from heatflow_tpu.sim.unstructured import (auto_selects_vmem,
                                               build_problem_unstructured,
                                               make_simulate_fn_unstructured)
    heat_csv = tmp_path / "heat.csv"
    synthetic_heating(heat_csv)
    cfg = tiny_no_diamond_cfg(coarse=2.0)
    cfg["heating"]["file"] = str(heat_csv)
    cfg["timing"]["num_steps"] = 3
    domain, mats = build_layout(cfg)
    umesh = build_unstructured_mesh(domain, mats, jitter=0.25, seed=7)
    problem = build_problem_unstructured(
        umesh, HeatingCurve.from_csv(str(heat_csv)), cfg,
        watcher_points=coupler_watcher_points(cfg))

    # on CPU, 'auto' resolves to the XLA/ELL path — no rline engine there;
    # the maker must refuse rather than silently run unpreconditioned
    assert not auto_selects_vmem(umesh, jnp.float32, "rline")
    with pytest.raises(ValueError, match="grid-overlay VMEM engine"):
        make_simulate_fn_unstructured(problem, dtype=jnp.float32,
                                      solver="auto", precondition="rline",
                                      maxiter=7706)

    # the drivers' DEFAULT therefore resolves to jacobi here
    from heatflow_tpu.utils import resolve_recording_precondition
    assert resolve_recording_precondition(
        True, jnp.float32, unstructured_xla=True) == "jacobi"

    # the unstructured stepper/sweep makers implement the linear seed
    # only — unknown/unsupported warm starts raise instead of silently
    # degrading to 'previous' (review-pass 3)
    from heatflow_tpu.sim.unstructured import make_sweep_fn_unstructured
    with pytest.raises(ValueError, match="warm_start"):
        make_simulate_fn_unstructured(problem, warm_start="extrapolate2")
    with pytest.raises(ValueError, match="warm_start"):
        make_sweep_fn_unstructured(problem, warm_start="extrapolate2")

    # recording outputs carry host-side times (a sharded device row is not
    # addressable on every process of a multihost run)
    fn = make_sweep_fn_unstructured(problem, dtype=jnp.float64, rtol=1e-8,
                                    record_gradient=True)
    out = fn(np.array([3.0]), np.array([4e-6]))
    assert isinstance(out["times"], np.ndarray) and out["times"].ndim == 1
    np.testing.assert_allclose(
        out["times"], np.arange(1, problem.num_steps + 1) * problem.dt)


def test_sweep_rtol_defaults_width_independent(tmp_path, monkeypatch):
    """Recording sweeps stop at rtol 1e-5 (the measured accuracy knee) for
    EVERY width group, not just the first."""
    import heatflow_tpu.sim.sweepkernel as sk
    from heatflow_tpu.drivers.sweep import run_parameter_sweep

    seen = []
    real = sk.make_sweep_fn_recording

    def spy(problem, **kw):
        seen.append(kw.get("rtol"))
        return real(problem, **kw)

    monkeypatch.setattr(sk, "make_sweep_fn_recording", spy)

    heat_csv = tmp_path / "heat.csv"
    synthetic_heating(heat_csv)
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    cfg["heating"]["file"] = str(heat_csv)
    cfg["timing"]["num_steps"] = 2
    cfg_path = tmp_path / "base.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    width = float(cfg["mats"]["p_sample"]["z"])

    results, failed = run_parameter_sweep(
        str(cfg_path), str(tmp_path / "out"), (4e-6, 4e-6), (3.0, 3.0),
        (width, 1.5 * width), (1, 1, 2),
        base_mesh_folder=str(tmp_path / "meshes"), suppress_print=True,
        dtype=jnp.float32, record_gradient=True, precondition="jacobi")
    assert len(results) == 2 and not failed
    assert seen == [1e-5, 1e-5]


def test_sweep_resolver_uses_batched_vmem_budget_on_overlays(monkeypatch):
    """6. (review-4 revision) The sweep driver resolves 'auto' against the
    BATCHED working set (sweep_auto_selects_vmem ≡ the guard
    _sweep_vmem_unstructured enforces: shared A0+K_var + per-config
    operator), not the single-problem auto_selects_vmem. For overlay
    shapes in the budget gap — single-problem kernel fits, batched sweep
    kernel does not — 'auto' must fall back to 'xla' instead of picking an
    engine the maker then rejects with a ValueError. (This replaces the
    earlier test that pinned agreement with the single-problem predicate,
    which asserted exactly that crash-prone resolution.)"""
    from heatflow_tpu.drivers.sweep import _resolve_solver
    from heatflow_tpu.mesh.msh_io import UnstructuredMesh
    from heatflow_tpu.ops.pallas_cg import (VMEM_BUDGET, fits_in_vmem,
                                            fits_in_vmem_batched,
                                            rline_extra_planes)
    from heatflow_tpu.sim.unstructured import (auto_selects_vmem,
                                               sweep_auto_selects_vmem)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    nr = 1107                      # flagship lane count: L=11 PCR levels
    extra = rline_extra_planes(nr)           # folded 2L+1 factor layout
    single = 9 + 6 + extra                   # single-problem working set
    batched = 3 * 9 + 6 + extra              # batched sweep working set
    lo = VMEM_BUDGET // (batched * nr * 4)
    hi = VMEM_BUDGET // (single * nr * 4)
    assert hi > lo + 1, "budget gap vanished — recompute the plane counts"
    nz_gap = (lo + 1 + hi) // 2
    assert fits_in_vmem(nz_gap, nr, jnp.float32, n_points=9,
                        extra_planes=extra)
    assert not fits_in_vmem_batched(nz_gap, nr, jnp.float32, n_points=9,
                                    rline=True)

    mesh = object.__new__(UnstructuredMesh)
    mesh.grid_overlay = {"shape": (nz_gap, nr)}
    assert auto_selects_vmem(mesh, jnp.float32, precondition="rline")
    assert not sweep_auto_selects_vmem(mesh, jnp.float32,
                                       precondition="rline")
    assert _resolve_solver("auto", mesh, dtype=jnp.float32,
                           precondition="rline", f64_refine=0,
                           record_gradient=True) == "xla"

    # below the gap both predicates agree and 'auto' keeps the fast engine
    mesh2 = object.__new__(UnstructuredMesh)
    mesh2.grid_overlay = {"shape": (max(1, lo - 1), nr)}
    assert sweep_auto_selects_vmem(mesh2, jnp.float32,
                                   precondition="rline")
    assert _resolve_solver("auto", mesh2, dtype=jnp.float32,
                           precondition="rline", f64_refine=0,
                           record_gradient=True) == "vmem"


def test_inner_seed_validated_even_without_refine(tiny_problem):
    """7. inner_seed typos raise even when f64_refine=0 (the normalization
    to 'zero' used to run before validation, silently accepting any
    string whenever refinement was off)."""
    _cfg, problem = tiny_problem
    with pytest.raises(ValueError, match="inner_seed"):
        make_simulate_fn(problem, dtype=jnp.float32, f64_refine=0,
                         inner_seed="cary", maxiter=7703)


def test_mg_vmem_raises_auto_falls_back(tiny_problem, monkeypatch):
    """Review-pass 3: the VMEM kernel has no mg V-cycle — an explicit
    ``solver='vmem'`` errors instead of silently building (and dropping)
    the hierarchy, and ``'auto'`` routes mg to the XLA path which applies
    it (previously run2d --precondition mg under the 'auto' default ran
    unpreconditioned on TPU f32)."""
    _cfg, problem = tiny_problem
    with pytest.raises(ValueError, match="mg"):
        make_simulate_fn(problem, dtype=jnp.float32, solver="vmem",
                         precondition="mg", maxiter=7707)

    import heatflow_tpu.sim.stepper as stepper_mod
    monkeypatch.setattr(stepper_mod.jax, "default_backend", lambda: "tpu")
    fn = make_simulate_fn(problem, dtype=jnp.float32, solver="auto",
                          precondition="mg", rtol=1e-4, maxiter=7708)
    monkeypatch.undo()
    ys = fn()
    assert np.isfinite(np.asarray(ys["watch"])).all()


def test_sweep_driver_resolver_routes_mg_to_xla(monkeypatch):
    """--precondition mg under the sweep driver's solver='auto' default
    must pick the XLA engine (the vmem maker rejects mg), not crash."""
    from heatflow_tpu.drivers.sweep import _resolve_solver

    class _GridMesh:
        shape = (16, 32)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    common = dict(dtype=jnp.float32, f64_refine=0, record_gradient=False)
    assert _resolve_solver("auto", _GridMesh(),
                           precondition="jacobi", **common) == "vmem"
    assert _resolve_solver("auto", _GridMesh(),
                           precondition="mg", **common) == "xla"


def test_sweep_xla_rline_is_applied(tiny_problem):
    """Review-pass 3: the plain sweep maker's XLA path used to silently
    ignore precondition='rline' (only mg built a ``pre``). Now the line
    preconditioner is factored per config: at a tiny fixed budget the
    preconditioned traces must DIFFER from jacobi's (it actually runs),
    and at tight tolerance they must agree with the converged solution."""
    from heatflow_tpu.sim.sweepkernel import make_sweep_fn
    _cfg, problem = tiny_problem
    ks = np.array([3.0, 9.0])
    fs = np.array([4e-6, 4e-6])
    f_j3 = make_sweep_fn(problem, dtype=jnp.float64, solver="xla",
                         fixed_iters=3, precondition="jacobi")
    f_r3 = make_sweep_fn(problem, dtype=jnp.float64, solver="xla",
                         fixed_iters=3, precondition="rline")
    f_jt = make_sweep_fn(problem, dtype=jnp.float64, solver="xla",
                         rtol=1e-12, maxiter=5000, precondition="jacobi")
    f_rt = make_sweep_fn(problem, dtype=jnp.float64, solver="xla",
                         rtol=1e-12, maxiter=5000, precondition="rline")
    tj3 = np.asarray(f_j3(ks, fs))
    tr3 = np.asarray(f_r3(ks, fs))
    tjt = np.asarray(f_jt(ks, fs))
    trt = np.asarray(f_rt(ks, fs))
    assert not np.allclose(tr3, tj3)          # the preconditioner runs
    rng = np.ptp(tjt) or 1.0
    assert np.max(np.abs(trt - tjt)) / rng < 1e-8   # and solves correctly


def test_sweep_makers_reject_unknown_warm_start(tiny_problem):
    """Review-pass 3: the sweep engines implement 'previous'/'extrapolate'
    only; 'extrapolate2' (stepper-only) and typos used to silently degrade
    to 'previous' — benchmark comparisons would measure the wrong seed."""
    from heatflow_tpu.sim.sweepkernel import (make_sweep_fn,
                                              make_sweep_fn_recording)
    _cfg, problem = tiny_problem
    with pytest.raises(ValueError, match="warm_start"):
        make_sweep_fn(problem, warm_start="extrapolate2")
    with pytest.raises(ValueError, match="warm_start"):
        make_sweep_fn(problem, warm_start="extrapolat")
    with pytest.raises(ValueError, match="warm_start"):
        make_sweep_fn_recording(problem, warm_start="extrapolat")
    with pytest.raises(ValueError, match="precondition"):
        make_sweep_fn(problem, precondition="r-line")
