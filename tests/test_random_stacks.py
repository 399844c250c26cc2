"""Property-style robustness: random layered stacks must mesh, tag, and
assemble into operators with the right structural invariants."""

import numpy as np
import pytest

from heatflow_tpu.geometry import MaterialSpec
from heatflow_tpu.mesh.structured import build_structured_mesh
from heatflow_tpu.ops.stencil import assemble_stencils, stencil_to_coo
import scipy.sparse as sp


def _random_stack(rng, n_layers):
    zmin = -float(rng.uniform(1, 5)) * 1e-6
    z = zmin
    mats = []
    r_max = float(rng.uniform(2, 8)) * 1e-6
    for i in range(n_layers):
        dz = float(rng.uniform(0.1, 3.0)) * 1e-6
        h = float(rng.uniform(0.05, 0.5)) * 1e-6
        mats.append(MaterialSpec(
            f"layer{i}", (z, z + dz, 0.0, r_max),
            rho_cv=float(rng.uniform(1e5, 1e7)),
            kappa=float(rng.uniform(0.5, 2000.0)), mesh_size=h))
        z += dz
    return (zmin, z, 0.0, r_max), mats


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_random_stack_invariants(seed):
    rng = np.random.default_rng(seed)
    domain, mats = _random_stack(rng, int(rng.integers(2, 7)))
    mesh = build_structured_mesh(domain, mats)

    # tags tile and map back to the right layers
    assert mesh.cell_tags.min() >= 1
    assert mesh.cell_tags.max() == len(mats)
    zc = 0.5 * (mesh.z[:-1] + mesh.z[1:])
    for m in mats:
        tag = mesh.material_tags[m.name]
        rows = np.where((zc > m.bounds[0]) & (zc < m.bounds[1]))[0]
        assert np.all(mesh.cell_tags[rows, :] == tag)

    pack = assemble_stencils(mesh)
    n = mesh.num_nodes
    # stiffness annihilates constants (each material block individually)
    ones = np.ones(n)
    for m in range(len(mats)):
        rows, cols, vals = stencil_to_coo(pack.K[m])
        K = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
        resid = np.abs(K @ ones).max()
        assert resid < 1e-8 * max(np.abs(vals).max(), 1e-300)
        # symmetry
        asym = abs(K - K.T).max()
        assert asym < 1e-12 * max(np.abs(vals).max(), 1e-300)
    # total r-weighted mass equals ∫ r dA = Lz * rmax²/2
    rows, cols, vals = stencil_to_coo(pack.M.sum(axis=0))
    expect = (mesh.z[-1] - mesh.z[0]) * mesh.r[-1] ** 2 / 2
    assert vals.sum() == pytest.approx(expect, rel=1e-10)


@pytest.mark.parametrize("seed", [10, 11, 12])
def test_random_stack_perturbed_overlay_invariants(seed):
    """Random stacks through the non-grid generator: triangulation valid,
    tags conform, overlay stencils EXACTLY equal the ELL operator (the
    overlay conversion must be lossless on arbitrary layered geometry)."""
    import scipy.sparse as sp
    from heatflow_tpu.mesh.unstructured_gen import build_unstructured_mesh
    from heatflow_tpu.ops.ell import assemble_ell
    from heatflow_tpu.ops.overlay import ell_to_stencils
    from heatflow_tpu.ops.stencil import stencil_to_coo

    rng = np.random.default_rng(seed)
    domain, mats = _random_stack(rng, int(rng.integers(2, 6)))
    umesh = build_unstructured_mesh(domain, mats, jitter=0.25, seed=seed)
    n = len(umesh.nodes)

    # tags conform: centroids inside their material rectangles
    cent = umesh.nodes[umesh.cells].mean(axis=1)
    for m in mats:
        tag = umesh.material_tags[m.name]
        sel = umesh.cell_tags == tag
        assert np.all(cent[sel, 0] >= m.bounds[0] - 1e-15)
        assert np.all(cent[sel, 0] <= m.bounds[1] + 1e-15)

    ell = assemble_ell(umesh.nodes, umesh.cells, umesh.cell_tags, len(mats))
    stn = ell_to_stencils(ell, umesh.grid_overlay)
    idx = np.asarray(umesh.grid_overlay["index"])

    # overlay stencil == permuted ELL matrix, entry for entry
    for m in range(len(mats)):
        rows, cols, vals = stencil_to_coo(stn["K"][m])
        K_ov = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
        rows_e = np.repeat(np.arange(n), ell.cols.shape[1])
        K_ell = sp.coo_matrix(
            (ell.K_vals[m].ravel(), (idx[rows_e], idx[ell.cols.ravel()])),
            shape=(n, n)).tocsr()
        K_ell.sum_duplicates()
        d = abs(K_ov - K_ell).max()
        scale = max(np.abs(ell.K_vals[m]).max(), 1e-300)
        assert d < 1e-12 * scale

        # stiffness annihilates constants, symmetric
        ones = np.ones(n)
        assert np.abs(K_ov @ ones).max() < 1e-8 * scale
        assert abs(K_ov - K_ov.T).max() < 1e-12 * scale
