"""Unstructured ELL path: cross-validation against the structured stencil
path on the same mesh, and the .msh import round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heatflow_tpu.geometry import build_layout, coupler_watcher_points
from heatflow_tpu.mesh.msh_io import UnstructuredMesh, read_msh, write_msh
from heatflow_tpu.mesh.structured import build_structured_mesh
from heatflow_tpu.ops.ell import assemble_ell, ell_apply, ell_combine
from heatflow_tpu.sim.bc import HeatingCurve
from heatflow_tpu.sim.problem import build_problem
from heatflow_tpu.sim.stepper import run_transient
from heatflow_tpu.sim.unstructured import (build_problem_unstructured,
                                           make_simulate_fn_unstructured)
from tests.fixtures import synthetic_heating, tiny_no_diamond_cfg


@pytest.fixture(scope="module")
def meshes():
    cfg = tiny_no_diamond_cfg(coarse=2.0)
    cfg["timing"]["num_steps"] = 5
    domain, mats = build_layout(cfg)
    smesh = build_structured_mesh(domain, mats)
    tris, tags = smesh.triangles()
    umesh = UnstructuredMesh(nodes=smesh.node_coords(), cells=tris,
                             cell_tags=tags,
                             material_tags=dict(smesh.material_tags))
    df = synthetic_heating()
    heating = HeatingCurve(time=df["time"].to_numpy(),
                           temp=df["temp"].to_numpy())
    return cfg, smesh, umesh, heating


def test_ell_spmv_matches_scipy(meshes):
    import scipy.sparse as sp
    from tests import reference_fem
    cfg, smesh, umesh, _ = meshes
    _, mats = build_layout(cfg)
    kappas = np.array([m.kappa for m in mats])
    rho_cvs = np.array([m.rho_cv for m in mats])
    ell = assemble_ell(umesh.nodes, umesh.cells, umesh.cell_tags, len(mats))
    A_vals, M_vals = ell_combine(jnp.asarray(ell.K_vals),
                                 jnp.asarray(ell.M_vals),
                                 jnp.asarray(kappas), jnp.asarray(rho_cvs),
                                 1e-7)
    ck = kappas[umesh.cell_tags - 1]
    cr = rho_cvs[umesh.cell_tags - 1]
    K_ref, M_ref = reference_fem.assemble(umesh.nodes, umesh.cells, ck, cr)
    A_ref = (M_ref + 1e-7 * K_ref)
    rng = np.random.default_rng(0)
    u = rng.standard_normal(len(umesh.nodes))
    y = np.asarray(ell_apply(jnp.asarray(ell.cols), A_vals, jnp.asarray(u)))
    y_ref = A_ref @ u
    np.testing.assert_allclose(y, y_ref, rtol=1e-9,
                               atol=1e-12 * np.abs(y_ref).max())


def test_unstructured_matches_structured_stepper(meshes):
    """Both operator paths on the same mesh must agree to solver tolerance —
    full cross-validation of stencil assembly, ELL assembly, masks, BC
    values, gradient projection and sampling."""
    cfg, smesh, umesh, heating = meshes
    wp = coupler_watcher_points(cfg)
    sp_prob = build_problem(smesh, heating, cfg, watcher_points=wp)
    us_prob = build_problem_unstructured(umesh, heating, cfg,
                                         watcher_points=wp)
    r1 = run_transient(sp_prob, rtol=1e-12, record_fields=True)
    fn = jax.jit(make_simulate_fn_unstructured(us_prob, rtol=1e-12,
                                               record_fields=True))
    ys = jax.tree.map(np.asarray, fn())

    scale = np.abs(r1.fields).max()
    assert np.abs(ys["field"].reshape(r1.fields.shape[0], -1)
                  - r1.fields.reshape(r1.fields.shape[0], -1)
                  ).max() / scale < 5e-8
    assert np.abs(ys["watch"] - r1.watcher).max() / scale < 5e-8
    # radial CSV rows agree (same bins, same axis nodes)
    np.testing.assert_allclose(us_prob.bin_centers, sp_prob.radial.bin_centers)
    bscale = np.abs(r1.band_rows).max()
    assert np.abs(ys["band"] - r1.band_rows).max() / bscale < 5e-4
    np.testing.assert_allclose(us_prob.axis_z, smesh.z)
    ascale = np.abs(r1.axis_rows).max()
    assert np.abs(ys["axis"] - r1.axis_rows).max() / ascale < 5e-4


def test_msh_import_runs(meshes, tmp_path):
    """Persist to .msh, re-import, run — same result as the in-memory mesh."""
    cfg, smesh, umesh, heating = meshes
    p = tmp_path / "mesh.msh"
    write_msh(str(p), umesh.nodes, umesh.cells, umesh.cell_tags,
              umesh.material_tags)
    back = read_msh(str(p))
    wp = coupler_watcher_points(cfg)
    prob = build_problem_unstructured(back, heating, cfg, watcher_points=wp)
    fn = jax.jit(make_simulate_fn_unstructured(prob, rtol=1e-12,
                                               record_gradient=False))
    ys = jax.tree.map(np.asarray, fn())
    prob2 = build_problem_unstructured(umesh, heating, cfg,
                                       watcher_points=wp)
    fn2 = jax.jit(make_simulate_fn_unstructured(prob2, rtol=1e-12,
                                                record_gradient=False))
    ys2 = jax.tree.map(np.asarray, fn2())
    np.testing.assert_allclose(ys["watch"], ys2["watch"], rtol=1e-12)
