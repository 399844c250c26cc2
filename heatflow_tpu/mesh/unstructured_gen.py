"""Genuinely unstructured (non-grid) triangulations of the DAC geometry.

The reference meshes its rectangle stacks with gmsh: graded unstructured
triangles driven by per-material Box size fields combined through a Min field
(ref mesh_and_materials/mesh.py:129-144). gmsh is a C++ dependency we don't
carry, but the *property* that matters for validating the unstructured
operator path — irregular node placement, mixed diagonal orientations,
arbitrary node/cell numbering, per-region grading — is reproduced here:

  1. start from the graded tensor grid (per-region sizes = gmsh's Min-field
     grading);
  2. jitter every node that does not lie on a material interface or the
     domain boundary (interface/boundary nodes are pinned, exactly like
     gmsh respects the CAD edges);
  3. split each quad along a randomly chosen diagonal;
  4. randomly permute node and cell numbering.

The result is a conforming P1 triangulation that is *not* a tensor grid in
any sense the solver can exploit; it exercises the ELL operator path the
same way a gmsh mesh does, with exact material-region conformity so per-cell
tags stay valid.
"""

from __future__ import annotations

import numpy as np

from heatflow_tpu.geometry import MaterialSpec
from heatflow_tpu.mesh.msh_io import UnstructuredMesh
from heatflow_tpu.mesh.structured import StructuredMesh, build_structured_mesh


def _pinned(axis_vals: np.ndarray, pinned_coords: set[float],
            tol: float = 1e-15) -> np.ndarray:
    """(N,) bool — grid lines that coincide with a pinned coordinate."""
    pins = np.asarray(sorted(pinned_coords), dtype=np.float64)
    if len(pins) == 0:
        return np.zeros(len(axis_vals), dtype=bool)
    d = np.abs(axis_vals[:, None] - pins[None, :]).min(axis=1)
    scale = max(abs(axis_vals[0]), abs(axis_vals[-1]), 1.0)
    return d <= tol * scale + 1e-300


def perturb_structured_mesh(mesh: StructuredMesh, *, jitter: float = 0.25,
                            seed: int = 0, shuffle: bool = True
                            ) -> UnstructuredMesh:
    """Turn a structured mesh into a perturbed non-grid triangulation.

    jitter: max displacement as a fraction of the smaller adjacent grid
    spacing per axis (<= 0.3 keeps all triangles valid). Nodes on material
    interfaces / domain boundaries are pinned in the interface-normal axis,
    so cell tags remain exact.
    """
    if not 0.0 <= jitter <= 0.3:
        raise ValueError("jitter must be in [0, 0.3] to guarantee validity")
    rng = np.random.default_rng(seed)
    z, r = mesh.z, mesh.r
    nz, nr = mesh.shape

    pinned_z = {b for m in mesh.materials for b in m.bounds[:2]}
    pinned_z |= {float(z[0]), float(z[-1])}
    pinned_r = {b for m in mesh.materials for b in m.bounds[2:]}
    pinned_r |= {float(r[0]), float(r[-1])}
    movable_z = ~_pinned(z, pinned_z)
    movable_r = ~_pinned(r, pinned_r)

    # per-grid-line max displacement: the smaller adjacent spacing
    def room(axis):
        d = np.diff(axis)
        out = np.empty(len(axis))
        out[0] = d[0]
        out[-1] = d[-1]
        out[1:-1] = np.minimum(d[:-1], d[1:])
        return out

    room_z = room(z) * movable_z
    room_r = room(r) * movable_r

    zz, rr = np.meshgrid(z, r, indexing="ij")
    dz = rng.uniform(-jitter, jitter, (nz, nr)) * room_z[:, None]
    dr = rng.uniform(-jitter, jitter, (nz, nr)) * room_r[None, :]
    nodes = np.stack([(zz + dz).ravel(), (rr + dr).ravel()], axis=1)

    # random diagonal per quad: 0 → (00,10,11)+(00,11,01), 1 → (00,10,01)+(10,11,01)
    i, j = np.meshgrid(np.arange(nz - 1), np.arange(nr - 1), indexing="ij")
    n00 = (i * nr + j).ravel()
    n10 = ((i + 1) * nr + j).ravel()
    n11 = ((i + 1) * nr + j + 1).ravel()
    n01 = (i * nr + j + 1).ravel()
    flip = rng.random(n00.shape) < 0.5
    t1 = np.where(flip[:, None],
                  np.stack([n00, n10, n01], axis=1),
                  np.stack([n00, n10, n11], axis=1))
    t2 = np.where(flip[:, None],
                  np.stack([n10, n11, n01], axis=1),
                  np.stack([n00, n11, n01], axis=1))
    tris = np.concatenate([t1, t2], axis=0).astype(np.int64)
    tags = np.concatenate([mesh.cell_tags.ravel()] * 2).astype(np.int32)

    # validity: all triangles must keep positive signed area
    p = nodes[tris]
    d1 = p[:, 1] - p[:, 0]
    d2 = p[:, 2] - p[:, 0]
    det = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
    if det.min() <= 0:
        raise RuntimeError(
            f"perturbation produced {int((det <= 0).sum())} degenerate or "
            f"inverted triangles (min det {det.min():.3e}); lower jitter")

    lattice = np.arange(nz * nr, dtype=np.int64)   # node n sits at lattice n
    if shuffle:
        node_perm = rng.permutation(len(nodes))
        inv = np.empty_like(node_perm)
        inv[node_perm] = np.arange(len(nodes))
        nodes = nodes[node_perm]
        tris = inv[tris]
        lattice = lattice[node_perm]
        cell_perm = rng.permutation(len(tris))
        tris, tags = tris[cell_perm], tags[cell_perm]

    return UnstructuredMesh(nodes=nodes, cells=tris.astype(np.int32),
                            cell_tags=tags,
                            material_tags=dict(mesh.material_tags),
                            grid_overlay={"shape": (nz, nr),
                                          "index": lattice})


def build_unstructured_mesh(domain_bounds, materials: list[MaterialSpec], *,
                            size_scale: float = 1.0, jitter: float = 0.25,
                            seed: int = 0, shuffle: bool = True
                            ) -> UnstructuredMesh:
    """Graded non-grid triangulation of a material stack (gmsh-mesh analogue,
    ref mesh_and_materials/mesh.py:81-149)."""
    smesh = build_structured_mesh(domain_bounds, materials,
                                  size_scale=size_scale)
    return perturb_structured_mesh(smesh, jitter=jitter, seed=seed,
                                   shuffle=shuffle)
