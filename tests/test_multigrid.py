"""Geometric multigrid preconditioner: correctness and effectiveness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heatflow_tpu.geometry import build_layout, coupler_watcher_points
from heatflow_tpu.mesh.structured import build_structured_mesh
from heatflow_tpu.ops.cg import pcg
from heatflow_tpu.ops.multigrid import (build_hierarchy, device_levels,
                                        make_vcycle, _prolong, _restrict)
from heatflow_tpu.ops.stencil import apply_stencil, combine_operator
from heatflow_tpu.sim.bc import HeatingCurve
from heatflow_tpu.sim.problem import build_problem
from heatflow_tpu.sim.stepper import run_transient
from tests.fixtures import synthetic_heating, tiny_no_diamond_cfg


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_no_diamond_cfg()
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    df = synthetic_heating()
    heating = HeatingCurve(time=df["time"].to_numpy(),
                           temp=df["temp"].to_numpy())
    problem = build_problem(mesh, heating, cfg,
                            watcher_points=coupler_watcher_points(cfg))
    return cfg, mesh, problem


def test_hierarchy_structure(setup):
    _, mesh, problem = setup
    levels = build_hierarchy(mesh, problem.dirichlet_mask,
                             stencils=problem.stencils)
    assert len(levels) >= 3
    for a, b in zip(levels[:-1], levels[1:]):
        # coarse grids are strict subsets of fine grids
        assert set(b.mesh.z).issubset(set(a.mesh.z))
        assert set(b.mesh.r).issubset(set(a.mesh.r))
        assert b.mesh.num_nodes < a.mesh.num_nodes
        # dirichlet restriction is exact (coarse nodes are fine nodes)
        assert b.dirichlet[0, :].all() and b.dirichlet[-1, :].all()


def test_transfer_adjointness(setup):
    """<P xc, rf> == <xc, R rf> — restriction must be the exact transpose."""
    _, mesh, problem = setup
    levels = device_levels(
        build_hierarchy(mesh, problem.dirichlet_mask,
                        stencils=problem.stencils), jnp.float64)
    rng = np.random.default_rng(0)
    fine, coarse = levels[0], levels[1]
    xc = jnp.asarray(rng.standard_normal(coarse["shape"]))
    rf = jnp.asarray(rng.standard_normal(fine["shape"]))
    lhs = float(jnp.sum(_prolong(coarse, xc) * rf))
    rhs = float(jnp.sum(xc * _restrict(coarse, rf, coarse["shape"])))
    assert lhs == pytest.approx(rhs, rel=1e-12)


def test_prolong_reproduces_linear_fields(setup):
    """Bilinear P must reproduce fields linear in z and r exactly."""
    _, mesh, problem = setup
    levels = device_levels(
        build_hierarchy(mesh, problem.dirichlet_mask,
                        stencils=problem.stencils), jnp.float64)
    coarse = levels[1]
    hier = build_hierarchy(mesh, problem.dirichlet_mask,
                           stencils=problem.stencils)
    zc, rc = hier[1].mesh.z, hier[1].mesh.r
    zf, rf = hier[0].mesh.z, hier[0].mesh.r
    fc = zc[:, None] * 2.0 + rc[None, :] * 3.0 + 1.0
    ff = zf[:, None] * 2.0 + rf[None, :] * 3.0 + 1.0
    got = np.asarray(_prolong(coarse, jnp.asarray(fc)))
    np.testing.assert_allclose(got, ff, rtol=1e-12)


def test_rap_coarse_operator_is_galerkin(setup):
    """RAP coarse stencils equal the scipy triple product Pᵀ A P exactly,
    per material."""
    import scipy.sparse as sp
    from heatflow_tpu.ops.multigrid import _axis_transfer_matrix
    from heatflow_tpu.ops.stencil import stencil_to_coo
    _, mesh, problem = setup
    hier = build_hierarchy(mesh, problem.dirichlet_mask,
                           stencils=problem.stencils, coarsening="rap")
    fine, coarse = hier[0], hier[1]
    n_f = fine.mesh.num_nodes
    P = sp.kron(_axis_transfer_matrix(coarse.liz, coarse.wz,
                                      len(coarse.mesh.z)),
                _axis_transfer_matrix(coarse.lir, coarse.wr,
                                      len(coarse.mesh.r))).tocsr()
    for m in range(fine.K.shape[0]):
        rows, cols, vals = stencil_to_coo(fine.K[m])
        A_f = sp.coo_matrix((vals, (rows, cols)), shape=(n_f, n_f)).tocsr()
        rap_ref = (P.T @ A_f @ P).toarray()
        rows, cols, vals = stencil_to_coo(coarse.K[m])
        n_c = coarse.mesh.num_nodes
        got = sp.coo_matrix((vals, (rows, cols)),
                            shape=(n_c, n_c)).toarray()
        np.testing.assert_allclose(got, rap_ref, rtol=1e-12,
                                   atol=1e-12 * np.abs(rap_ref).max())
    # coarse stencils carry the full 9-point pattern
    assert coarse.K.shape[1] == 9


def test_vcycle_preconditioner_is_spd(setup):
    """<vc(x), y> == <x, vc(y)> and <vc(x), x> > 0 — required for CG."""
    _, mesh, problem = setup
    hier = build_hierarchy(mesh, problem.dirichlet_mask,
                           stencils=problem.stencils)
    levels = device_levels(hier, jnp.float64)
    kp = jnp.asarray(problem.kappas)
    rc = jnp.asarray(problem.rho_cvs)
    level_ops = []
    for lv in levels:
        A_l, _ = combine_operator(lv["K"], lv["M"], kp, rc, problem.dt)
        level_ops.append({**lv, "A": A_l})
    vc = make_vcycle(level_ops)
    free = np.asarray(levels[0]["free"])
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(mesh.shape) * free)
    y = jnp.asarray(rng.standard_normal(mesh.shape) * free)
    vx, vy = vc(x), vc(y)
    lhs = float(jnp.sum(vx * y))
    rhs = float(jnp.sum(x * vy))
    assert lhs == pytest.approx(rhs, rel=1e-10)
    assert float(jnp.sum(vx * x)) > 0


def test_vcycle_accelerates_cg(setup):
    """MG-PCG must reach tolerance in far fewer iterations than Jacobi-PCG
    and produce the same solution."""
    _, mesh, problem = setup
    dt = problem.dt
    hier = build_hierarchy(mesh, problem.dirichlet_mask,
                           stencils=problem.stencils)
    levels = device_levels(hier, jnp.float64)
    kp = jnp.asarray(problem.kappas)
    rc = jnp.asarray(problem.rho_cvs)
    level_ops = []
    for lv in levels:
        A_l, _ = combine_operator(lv["K"], lv["M"], kp, rc, dt)
        level_ops.append({**lv, "A": A_l})
    A = level_ops[0]["A"]
    free = levels[0]["free"]

    rng = np.random.default_rng(1)
    x_true = jnp.asarray(rng.standard_normal(mesh.shape)) * free
    b = apply_stencil(A, x_true) * free

    diag = A[0]
    s = jax.lax.rsqrt(jnp.where(diag > 0, diag, 1.0)) * free + (1 - free)
    apply_s = lambda y: s * apply_stencil(A, s * y)
    bs = b * s
    y_true_norm = x_true / jnp.where(s > 0, s, 1.0)

    res_j = pcg(apply_s, bs, jnp.zeros_like(b), mask=free, rtol=1e-10,
                maxiter=20000)
    vcycle = make_vcycle(level_ops)
    inv_s = 1.0 / jnp.where(s > 0, s, 1.0)
    pre = lambda r: inv_s * vcycle(inv_s * r)
    res_m = pcg(apply_s, bs, jnp.zeros_like(b), precond=pre, mask=free,
                rtol=1e-10, maxiter=20000)

    err_j = float(jnp.abs(res_j.x - y_true_norm).max()
                  / jnp.abs(y_true_norm).max())
    err_m = float(jnp.abs(res_m.x - y_true_norm).max()
                  / jnp.abs(y_true_norm).max())
    assert err_m < 1e-6 and err_j < 1e-6
    assert int(res_m.iters) < int(res_j.iters) / 3, \
        f"MG {int(res_m.iters)} vs Jacobi {int(res_j.iters)}"


def test_mg_stepper_matches_jacobi_stepper(setup):
    cfg, mesh, problem = setup
    r1 = run_transient(problem, rtol=1e-12, record_gradient=False)
    r2 = run_transient(problem, rtol=1e-12, record_gradient=False,
                       precondition="mg")
    scale = np.abs(r1.watcher).max()
    assert np.abs(r1.watcher - r2.watcher).max() / scale < 1e-9
    assert r2.cg_iters.mean() < r1.cg_iters.mean()
