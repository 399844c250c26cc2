"""1D reduced model: tridiagonal machinery, source interpolation vs scipy,
end-to-end vs dense reference, radial-correction A/B."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.interpolate import RegularGridInterpolator

from heatflow_tpu.geometry import build_layout, coupler_watcher_points
from heatflow_tpu.mesh.structured import build_structured_mesh
from heatflow_tpu.ops.tridiag import (apply_tridiag, assemble_1d,
                                      combine_tridiag, dirichlet_rows,
                                      thomas_solve)
from heatflow_tpu.sim.bc import HeatingCurve
from heatflow_tpu.sim.reduced1d import (GradientTable, build_problem_1d,
                                        extract_axis_submesh, make_source_fn,
                                        make_simulate_fn_1d, node_kappas_1d)
from tests.fixtures import synthetic_heating, tiny_no_diamond_cfg


def _dense(C):
    C = np.asarray(C)
    n = C.shape[1]
    A = np.diag(C[0])
    A += np.diag(C[1, :-1], 1)
    A += np.diag(C[2, 1:], -1)
    return A


def test_thomas_matches_dense():
    rng = np.random.default_rng(0)
    n = 50
    d = 2.0 + rng.random(n)
    du = -rng.random(n); du[-1] = 0.0
    dl = -rng.random(n); dl[0] = 0.0
    C = jnp.asarray(np.stack([d, du, dl]))
    b = jnp.asarray(rng.standard_normal(n))
    x = np.asarray(thomas_solve(C, b))
    x_ref = np.linalg.solve(_dense(C), np.asarray(b))
    np.testing.assert_allclose(x, x_ref, rtol=1e-10)


def test_apply_tridiag_matches_dense():
    rng = np.random.default_rng(1)
    n = 20
    C = jnp.asarray(rng.standard_normal((3, n)))
    u = jnp.asarray(rng.standard_normal(n))
    np.testing.assert_allclose(np.asarray(apply_tridiag(C, u)),
                               _dense(C) @ np.asarray(u), rtol=1e-12)


def test_assembly_1d_properties():
    z = np.array([0.0, 0.5, 1.5, 2.0])
    tags = np.array([1, 2, 1])
    st = assemble_1d(z, tags, 2)
    K = _dense(st["K"].sum(0))
    M = _dense(st["M"].sum(0))
    # stiffness annihilates constants; mass integrates to the length
    np.testing.assert_allclose(K @ np.ones(4), 0.0, atol=1e-14)
    assert M.sum() == pytest.approx(2.0)
    # per-material split covers everything
    np.testing.assert_allclose(st["M"].sum(0), st["M_unit"])


def test_dirichlet_rows_equivalent_to_reduced_solve():
    rng = np.random.default_rng(2)
    n = 12
    d = 4.0 + rng.random(n)
    du = -rng.random(n); du[-1] = 0.0
    dl = -rng.random(n); dl[0] = 0.0
    C = jnp.asarray(np.stack([d, du, dl]))
    b = rng.standard_normal(n)
    mask = np.zeros(n); mask[0] = mask[-1] = mask[4] = 1.0
    vals = np.zeros(n); vals[0] = 1.0; vals[-1] = 2.0; vals[4] = -3.0

    Cb, bb = dirichlet_rows(C, jnp.asarray(b), jnp.asarray(mask),
                            jnp.asarray(vals))
    x = np.asarray(thomas_solve(Cb, bb))

    A = _dense(C)
    free = mask == 0
    x_ref = np.empty(n)
    x_ref[~free] = vals[~free]
    x_ref[free] = np.linalg.solve(
        A[np.ix_(free, free)],
        b[free] - A[np.ix_(free, ~free)] @ vals[~free])
    np.testing.assert_allclose(x, x_ref, rtol=1e-10)


def test_axis_extraction():
    cfg = tiny_no_diamond_cfg()
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    z, tags = extract_axis_submesh(mesh)
    np.testing.assert_allclose(z, mesh.z)
    assert len(tags) == len(z) - 1
    # tags follow the 5-material stack in order along z
    assert tags[0] == 1 and tags[-1] == 5
    assert np.all(np.diff(tags) >= 0)


def test_source_interpolation_matches_scipy():
    rng = np.random.default_rng(3)
    times = np.linspace(0, 1e-5, 9)
    gz = np.linspace(-2e-6, 2e-6, 15)
    vals = rng.standard_normal((9, 15)) * 1e6
    DELTA = 0.1e-6
    table = GradientTable(times=times, z=gz, values=vals, delta_r=DELTA)
    z_nodes = np.linspace(-3e-6, 3e-6, 40)   # extends beyond data → clamped
    kap = np.full(40, 3.8)
    fn = make_source_fn(table, z_nodes, kap)

    interp = RegularGridInterpolator((times, gz), vals, method="linear")
    for t in (0.0, 3.3e-6, 2e-5):  # includes t beyond range → clamped
        t_cl = np.clip(t, times[0], times[-1])
        z_cl = np.clip(z_nodes, gz[0], gz[-1])
        pts = np.column_stack([np.full_like(z_cl, t_cl), z_cl])
        grad = interp(pts)
        damp = np.where(z_nodes != z_cl, 0.1, 1.0)
        ref = 2.0 * kap * grad * damp / DELTA
        got = np.asarray(fn(jnp.asarray(t)))
        np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_node_kappa_rule():
    z = np.array([0.0, 1.0, 2.0, 3.0])
    tags = np.array([1, 2, 2])
    kap = np.array([10.0, 99.0])
    nk = node_kappas_1d(z, tags, kap)
    np.testing.assert_allclose(nk, [10.0, 10.0, 99.0, 99.0])


@pytest.fixture(scope="module")
def problem_1d():
    cfg = tiny_no_diamond_cfg(coarse=2.0)
    cfg["timing"]["num_steps"] = 8
    df = synthetic_heating()
    heating = HeatingCurve(time=df["time"].to_numpy(),
                           temp=df["temp"].to_numpy())
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    return cfg, mesh, build_problem_1d(mesh, heating, cfg)


def test_1d_end_to_end_vs_dense(problem_1d):
    """Full 1D run (no correction) vs a dense numpy backward Euler."""
    cfg, mesh, problem = problem_1d
    wp = {k: v[0] for k, v in coupler_watcher_points(cfg).items()}
    fn = make_simulate_fn_1d(problem, use_radial_correction=False,
                             record_fields=True, watcher_z=wp)
    ys = fn()

    z = problem.z
    n = len(z)
    st = assemble_1d(z, problem.cell_tags, len(problem.material_tags))
    A = _dense(np.einsum("m,mkn->kn", problem.rho_cvs, st["M"])
               + problem.dt * np.einsum("m,mkn->kn", problem.kappas, st["K"]))
    M = _dense(np.einsum("m,mkn->kn", problem.rho_cvs, st["M"]))

    mask = np.zeros(n, bool)
    mask[[0, -1, problem.heat_node]] = True
    ic = problem.ic_temp
    off = problem.heat_temp[0] - ic
    u = np.full(n, ic)
    for s in range(problem.num_steps):
        t = (s + 1) * problem.dt
        amp = np.interp(t, problem.heat_time, problem.heat_temp) - off
        g = np.full(n, ic); g[problem.heat_node] = amp
        b = M @ u
        free = ~mask
        x = np.linalg.solve(A[np.ix_(free, free)],
                            b[free] - A[np.ix_(free, mask)] @ g[mask])
        u = np.where(mask, g, 0.0); u[free] = x
        np.testing.assert_allclose(np.asarray(ys["field"][s]), u, rtol=1e-9,
                                   atol=1e-9 * np.abs(u).max())


def test_radial_correction_changes_answer(problem_1d):
    """A/B: enabling the correction must change watcher temps measurably
    (the reference's test_radial_correction.py:114-126 criterion)."""
    cfg, mesh, problem = problem_1d
    rng = np.random.default_rng(4)
    table = GradientTable(
        times=np.linspace(0, 7.5e-6, 12),
        z=np.linspace(problem.z.min(), problem.z.max(), 30),
        values=-np.abs(rng.standard_normal((12, 30))) * 1e6,
        delta_r=0.1e-6)
    p2 = build_problem_1d(
        mesh, HeatingCurve(time=problem.heat_time, temp=problem.heat_temp),
        cfg, gradient=table)
    wp = {k: v[0] for k, v in coupler_watcher_points(cfg).items()}
    ys_off = make_simulate_fn_1d(p2, use_radial_correction=False,
                                 watcher_z=wp)()
    ys_on = make_simulate_fn_1d(p2, use_radial_correction=True,
                                watcher_z=wp)()
    dmax = np.abs(np.asarray(ys_on["watch"]) -
                  np.asarray(ys_off["watch"])).max()
    assert dmax > 1e-6  # ref threshold: max |ΔT| > 1e-6 K
    assert np.all(np.isfinite(np.asarray(ys_on["watch"])))
