"""Steady-state solver and steady-as-initial-condition workflow."""

import numpy as np
import pytest

from heatflow_tpu.geometry import build_layout, coupler_watcher_points
from heatflow_tpu.mesh.structured import build_structured_mesh
from heatflow_tpu.sim.bc import HeatingCurve
from heatflow_tpu.sim.problem import build_problem
from heatflow_tpu.sim.steady import solve_steady, steady_heating_values
from heatflow_tpu.sim.stepper import run_transient
from tests.fixtures import synthetic_heating, tiny_no_diamond_cfg


@pytest.fixture(scope="module")
def problem():
    cfg = tiny_no_diamond_cfg(coarse=2.0)
    cfg["timing"]["num_steps"] = 4
    df = synthetic_heating()
    heating = HeatingCurve(time=df["time"].to_numpy(),
                           temp=df["temp"].to_numpy())
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    return cfg, build_problem(mesh, heating, cfg,
                              watcher_points=coupler_watcher_points(cfg))


def test_steady_constant_bc_gives_constant_field(problem):
    """With all Dirichlet values equal, the steady solution is constant."""
    _, p = problem
    g = np.full(p.mesh.shape, 345.0) * p.dirichlet_mask
    u, info = solve_steady(p, g)
    assert info["converged"]
    np.testing.assert_allclose(u, 345.0, rtol=1e-8)


def test_steady_residual_small(problem):
    """K u must vanish on free dofs for the heated steady solve."""
    import jax.numpy as jnp
    from heatflow_tpu.ops.stencil import apply_stencil
    _, p = problem
    g = steady_heating_values(p, amplitude=1500.0)
    u, info = solve_steady(p, g)
    assert info["converged"]
    K = np.einsum("m,mkij->kij", p.kappas, p.stencils.K_flat)
    res = np.asarray(apply_stencil(jnp.asarray(K), jnp.asarray(u)))
    res = res * p.free_mask
    scale = np.abs(np.asarray(apply_stencil(jnp.asarray(K),
                                            jnp.asarray(g)))).max()
    assert np.abs(res).max() < 1e-8 * scale
    # heated line is hottest; field between bounds
    assert u.max() <= 1500.0 + 1e-6
    assert u.min() >= 300.0 - 1e-6


def test_steady_weighted_variant(problem):
    _, p = problem
    g = steady_heating_values(p, amplitude=800.0)
    u, info = solve_steady(p, g, weighted=True)
    assert info["converged"]
    assert 300.0 - 1e-6 <= u.min() and u.max() <= 800.0 + 1e-6


def test_steady_as_initial_condition(problem):
    """run_transient(u0=steady) must start from the steady field."""
    _, p = problem
    g = steady_heating_values(p, amplitude=900.0)
    u_steady, _ = solve_steady(p, g)
    res = run_transient(p, rtol=1e-11, record_gradient=False,
                        record_fields=True, u0=u_steady)
    # after one step the field should still be near the steady profile in
    # the interior (the transient BC at t=dt is close to the curve start)
    assert np.all(np.isfinite(res.fields))
    d0 = np.abs(res.fields[0] - u_steady).max()
    d_const = np.abs(res.fields[0] - p.ic_temp).max()
    assert d0 < d_const  # closer to the steady start than to constant ic


def test_steady_adi_default_matches_jacobi_and_cuts_iterations(problem):
    """solve_steady's default 'adi' preconditioner (steady solves are cold
    — the regime where ADI cuts most) returns the same field as jacobi in
    fewer iterations."""
    _, p = problem
    g = steady_heating_values(p, amplitude=900.0)
    u_adi, info_adi = solve_steady(p, g)          # default: adi
    u_j, info_j = solve_steady(p, g, precondition="jacobi")
    assert info_adi["converged"] and info_j["converged"]
    np.testing.assert_allclose(u_adi, u_j, rtol=1e-7, atol=1e-6)
    assert info_adi["iters"] < info_j["iters"], \
        (info_adi["iters"], info_j["iters"])
    with pytest.raises(ValueError):
        solve_steady(p, g, precondition="nope")
