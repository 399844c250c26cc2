"""Numerical validation beyond cross-implementation checks:
  * method-of-manufactured-solutions convergence at the P1-optimal O(h²)
    rate for the steady solver;
  * volumetric-source plumbing in the transient stepper vs the scipy
    reference."""

import numpy as np
import pytest

from heatflow_tpu.geometry import MaterialSpec
from heatflow_tpu.mesh.structured import build_structured_mesh
from heatflow_tpu.ops.stencil import assemble_stencils
from heatflow_tpu.sim.bc import HeatingCurve, structured_row_mask
from heatflow_tpu.sim.problem import Problem2D, build_problem
from heatflow_tpu.sim.steady import solve_steady
from heatflow_tpu.sim.stepper import run_transient
from tests import reference_fem
from tests.fixtures import synthetic_heating, tiny_no_diamond_cfg


def _unit_square_problem(h: float, kappa: float = 2.5) -> Problem2D:
    mat = MaterialSpec("m", (0.0, 1.0, 0.0, 1.0), rho_cv=1.0, kappa=kappa,
                       mesh_size=h)
    # nominal domain differs from the material rect (the duplicate-rectangle
    # validation mirrors ref mesh.py:46-77); the meshed extent is the
    # material union either way
    mesh = build_structured_mesh((0, 2, 0, 2), [mat])
    dirichlet = structured_row_mask(mesh.z, mesh.r, "outer")
    heating = HeatingCurve(time=np.array([0.0, 1.0]),
                           temp=np.array([0.0, 0.0]))
    rr = np.broadcast_to(mesh.r[None, :], mesh.shape)
    return Problem2D(
        mesh=mesh, stencils=assemble_stencils(mesh), heating=heating,
        dt=1.0, num_steps=1, ic_temp=0.0, fwhm=1.0,
        kappas=np.array([kappa]), rho_cvs=np.array([1.0]),
        dirichlet_mask=dirichlet, heat_mask=np.zeros(mesh.shape, bool),
        r_sq=(rr ** 2).astype(float))


def _mms_error(h: float) -> float:
    kappa = 2.5
    p = _unit_square_problem(h, kappa)
    mesh = p.mesh
    zz, rr = np.meshgrid(mesh.z, mesh.r, indexing="ij")
    u_exact = np.sin(np.pi * zz) * np.sin(np.pi * rr)
    f = kappa * 2 * np.pi ** 2 * u_exact  # -κ Δu = f
    u, info = solve_steady(p, np.zeros(mesh.shape), f=f, rtol=1e-12)
    assert info["converged"]
    # discrete L2 error
    return float(np.sqrt(np.mean((u - u_exact) ** 2)))


def test_steady_mms_second_order_convergence():
    e_coarse = _mms_error(1 / 16)
    e_fine = _mms_error(1 / 32)
    rate = np.log2(e_coarse / e_fine)
    assert 1.7 < rate < 2.3, f"convergence rate {rate:.2f} (errors " \
                             f"{e_coarse:.2e} -> {e_fine:.2e})"


def test_transient_source_matches_scipy_reference():
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    cfg["timing"]["num_steps"] = 4
    df = synthetic_heating()
    heating = HeatingCurve(time=df["time"].to_numpy(),
                           temp=df["temp"].to_numpy())
    from heatflow_tpu.geometry import build_layout
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    problem = build_problem(mesh, heating, cfg)

    rng = np.random.default_rng(0)
    source = rng.standard_normal(mesh.shape) * 1e12  # strong volumetric source
    res = run_transient(problem, rtol=1e-13, record_gradient=False,
                        record_fields=True, source=source)

    # scipy reference with the same consistent source term: b += dt M_r f
    nodes = mesh.node_coords()
    tris, tri_tags = mesh.triangles()
    kap = np.array([m.kappa for m in mats])[tri_tags - 1]
    rho = np.array([m.rho_cv for m in mats])[tri_tags - 1]
    K, M = reference_fem.assemble(nodes, tris, kap, rho)
    Mp, _ = reference_fem.gradient_projection_matrices(nodes, tris)
    import scipy.sparse.linalg as spla
    A = (M + problem.dt * K).tocsc()
    free = problem.free_mask.ravel()
    lu = spla.splu(A[free][:, free].tocsc())
    A_fd = A[free][:, ~free].tocsr()
    ic = problem.ic_temp
    off = heating.amplitude_offset(ic)
    prof = (np.exp(-4 * np.log(2) / problem.fwhm ** 2 * problem.r_sq)
            * problem.heat_mask).ravel()
    dirf = problem.dirichlet_mask.astype(float).ravel()
    u = np.full(mesh.num_nodes, ic)
    b_src = problem.dt * (Mp @ source.ravel())
    for s in range(problem.num_steps):
        t = (s + 1) * problem.dt
        amp = np.interp(t, heating.time, heating.temp) - off
        g = ic * dirf + (amp - ic) * prof
        b = M @ u + b_src
        x = lu.solve(b[free] - A_fd @ g[~free])
        u = np.where(~free, g, 0.0)
        u[free] = x
    scale = np.abs(u).max()
    got = res.fields[-1].ravel()
    assert np.abs(got - u).max() / scale < 1e-8
