"""Stencil assembly vs independent scipy quadrature assembly, and the
stencil application machinery."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from heatflow_tpu.geometry import build_layout
from heatflow_tpu.mesh.structured import build_structured_mesh
from heatflow_tpu.ops.stencil import (apply_stencil, assemble_stencils,
                                      combine_operator, stencil_to_coo,
                                      stencil_transpose_apply)
from tests import reference_fem
from tests.fixtures import tiny_no_diamond_cfg


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_no_diamond_cfg(coarse=2.0)
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    pack = assemble_stencils(mesh)
    tris, tri_tags = mesh.triangles()
    nodes = mesh.node_coords()
    kappas = np.array([m.kappa for m in mats])
    rho_cvs = np.array([m.rho_cv for m in mats])
    cell_kappa = kappas[tri_tags - 1]
    cell_rhocv = rho_cvs[tri_tags - 1]
    return mesh, pack, nodes, tris, cell_kappa, cell_rhocv, kappas, rho_cvs


def _coo_to_csr(C, n):
    rows, cols, vals = stencil_to_coo(np.asarray(C))
    return sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()


def test_operator_matches_scipy_assembly(setup):
    mesh, pack, nodes, tris, ck, cr, kappas, rho_cvs = setup
    K_ref, M_ref = reference_fem.assemble(nodes, tris, ck, cr)
    dt = 1.5e-7
    A_ref = M_ref + dt * K_ref

    A, M_op = combine_operator(jnp.asarray(pack.K), jnp.asarray(pack.M),
                               jnp.asarray(kappas), jnp.asarray(rho_cvs),
                               dt)
    n = mesh.num_nodes
    A_st = _coo_to_csr(A, n)
    M_st = _coo_to_csr(M_op, n)
    assert abs(A_st - A_ref).max() <= 1e-9 * abs(A_ref).max()
    assert abs(M_st - M_ref).max() <= 1e-9 * abs(M_ref).max()


def test_apply_matches_matvec(setup):
    mesh, pack, nodes, tris, ck, cr, kappas, rho_cvs = setup
    A, _ = combine_operator(jnp.asarray(pack.K), jnp.asarray(pack.M),
                            jnp.asarray(kappas), jnp.asarray(rho_cvs), 1e-7)
    rng = np.random.default_rng(1)
    u = rng.standard_normal(mesh.shape)
    y = np.asarray(apply_stencil(A, jnp.asarray(u)))
    A_sp = _coo_to_csr(A, mesh.num_nodes)
    y_ref = (A_sp @ u.ravel()).reshape(mesh.shape)
    np.testing.assert_allclose(y, y_ref, rtol=1e-12, atol=1e-12 * np.abs(y_ref).max())


def test_transpose_apply(setup):
    mesh, pack, *_ = setup
    G = jnp.asarray(pack.G_r)
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal(mesh.shape))
    v = jnp.asarray(rng.standard_normal(mesh.shape))
    lhs = float(jnp.sum(v * apply_stencil(G, u)))
    rhs = float(jnp.sum(u * stencil_transpose_apply(G, v)))
    assert lhs == pytest.approx(rhs, rel=1e-12)


def test_gradient_operators_match_scipy(setup):
    mesh, pack, nodes, tris, *_ = setup
    Mp_ref, G_ref = reference_fem.gradient_projection_matrices(nodes, tris)
    n = mesh.num_nodes
    Mp = _coo_to_csr(pack.M_proj, n)
    G = _coo_to_csr(pack.G_r, n)
    assert abs(Mp - Mp_ref).max() <= 1e-9 * abs(Mp_ref).max()
    assert abs(G - G_ref).max() <= 1e-9 * abs(G_ref).max()


def test_stiffness_annihilates_constants(setup):
    mesh, pack, *_ = setup
    Ksum = jnp.asarray(pack.K.sum(axis=0))
    ones = jnp.ones(mesh.shape)
    y = np.asarray(apply_stencil(Ksum, ones))
    assert np.abs(y).max() < 1e-10 * np.abs(np.asarray(pack.K)).max()


def test_batched_combine_vmaps(setup):
    """Per-config operators via batched combine == loop over configs."""
    mesh, pack, nodes, tris, ck, cr, kappas, rho_cvs = setup
    B = 3
    rng = np.random.default_rng(3)
    kb = np.tile(kappas, (B, 1)) * rng.uniform(0.5, 2.0, (B, 1))
    rb = np.tile(rho_cvs, (B, 1))
    A_b, M_b = combine_operator(jnp.asarray(pack.K), jnp.asarray(pack.M),
                                jnp.asarray(kb), jnp.asarray(rb), 1e-7)
    assert A_b.shape == (B, 7) + mesh.shape
    for i in range(B):
        A_i, _ = combine_operator(jnp.asarray(pack.K), jnp.asarray(pack.M),
                                  jnp.asarray(kb[i]), jnp.asarray(rb[i]),
                                  1e-7)
        np.testing.assert_allclose(np.asarray(A_b[i]), np.asarray(A_i),
                                   rtol=1e-14)
