"""ELL-format sparse operators for unstructured P1 triangle meshes.

The structured stencil path covers meshes from the native generator; this
path covers *imported* meshes (gmsh .msh files produced by the reference
toolchain, ref run_no_diamond.py:190-195) so reference meshes can be run
unmodified for exact-mesh parity.

ELL layout: every row stores its ≤K nonzero (column, value) pairs padded to
K; SpMV is a gather + multiply + row-sum — regular shapes, no dynamic
sparsity, vmappable. Per-material value tensors keep the sweep trick
(operator = linear combination) available on device.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from heatflow_tpu.ops import p1


@dataclass
class EllOps:
    """Assembled ELL operators for an unstructured triangle mesh."""

    cols: np.ndarray          # (N, K) int32 column ids (self-padded)
    K_vals: np.ndarray        # (n_mats, N, K) stiffness values (unit κ)
    M_vals: np.ndarray        # (n_mats, N, K) r-weighted mass (unit ρc)
    G_vals: np.ndarray        # (N, K) radial-gradient rhs operator
    Mp_vals: np.ndarray       # (N, K) r-weighted mass (projection matrix)
    Kf_vals: np.ndarray | None = None  # (n_mats, N, K) unweighted stiffness
    Mf_vals: np.ndarray | None = None  # (n_mats, N, K) unweighted mass

    def device_put(self, dtype=jnp.float32):
        n = self.cols.shape[0]
        own = self.cols == np.arange(n, dtype=self.cols.dtype)[:, None]
        return {
            "cols": jnp.asarray(self.cols),
            "own": jnp.asarray(own, dtype),   # diagonal-slot mask
            "K": jnp.asarray(self.K_vals, dtype),
            "M": jnp.asarray(self.M_vals, dtype),
            "G": jnp.asarray(self.G_vals, dtype),
            "Mp": jnp.asarray(self.Mp_vals, dtype),
        }


def _coo_to_ell(n, rows, cols, vals_list):
    """Convert shared-sparsity COO triplets (several value arrays) to ELL."""
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    vals_list = [v[order] for v in vals_list]
    # unique (row, col) with summed duplicates
    key = rows.astype(np.int64) * n + cols
    uniq, inv = np.unique(key, return_inverse=True)
    u_rows = (uniq // n).astype(np.int64)
    u_cols = (uniq % n).astype(np.int32)
    summed = []
    for v in vals_list:
        s = np.zeros(len(uniq), dtype=v.dtype)
        np.add.at(s, inv, v)
        summed.append(s)

    counts = np.bincount(u_rows, minlength=n)
    Kmax = int(counts.max())
    slot = np.zeros(len(uniq), dtype=np.int64)
    # position within each row (u_rows is sorted)
    start = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=start[1:])
    slot = np.arange(len(uniq)) - start[u_rows]

    cols_ell = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, Kmax))
    out_vals = [np.zeros((n, Kmax), dtype=v.dtype) for v in summed]
    cols_ell[u_rows, slot] = u_cols
    for o, s in zip(out_vals, summed):
        o[u_rows, slot] = s
    return cols_ell, out_vals


def assemble_ell(nodes: np.ndarray, tris: np.ndarray, tri_tags: np.ndarray,
                 n_mats: int) -> EllOps:
    """Assemble per-material K/M plus G_r and M_proj in one shared-sparsity
    ELL structure (exact closed-form P1 integrals, ops/p1.py)."""
    coords = nodes[tris]                          # (M, 3, 2)
    Ke = p1.tri_stiffness_rw(coords)
    Me = p1.tri_mass_rw(coords)
    Kfe = p1.tri_stiffness(coords)
    Mfe = p1.tri_mass(coords)
    w = p1.tri_load_rw(coords)
    cr = p1.tri_dr_coeff(coords)
    Ge = w[:, :, None] * cr[:, None, :]

    rows = np.repeat(tris, 3, axis=1).ravel()
    cols = np.tile(tris, (1, 3)).ravel()

    vals = []
    for elem in (Ke, Me, Kfe, Mfe):
        for m in range(n_mats):
            sel = (tri_tags == m + 1).astype(np.float64)[:, None, None]
            vals.append((elem * sel).ravel())
    vals.append(Ge.ravel())

    n = len(nodes)
    cols_ell, out = _coo_to_ell(n, rows, cols, vals)
    K_vals = np.stack(out[:n_mats])
    M_vals = np.stack(out[n_mats:2 * n_mats])
    Kf_vals = np.stack(out[2 * n_mats:3 * n_mats])
    Mf_vals = np.stack(out[3 * n_mats:4 * n_mats])
    G_vals = out[4 * n_mats]
    return EllOps(cols=cols_ell, K_vals=K_vals, M_vals=M_vals, G_vals=G_vals,
                  Mp_vals=M_vals.sum(axis=0), Kf_vals=Kf_vals,
                  Mf_vals=Mf_vals)


def ell_apply(cols: jnp.ndarray, vals: jnp.ndarray, u: jnp.ndarray
              ) -> jnp.ndarray:
    """SpMV: (A @ u) with A in ELL form. u (..., N) → (..., N).

    Padded slots point at the row's own column with value 0, so no masking
    is needed.
    """
    return (vals * u[..., cols]).sum(-1)


def ell_combine(K_vals, M_vals, kappas, rho_cvs, dt):
    """(A_vals, M_vals_op) for a backward-Euler step."""
    M_op = jnp.einsum("...m,mnk->...nk", rho_cvs, M_vals)
    A = M_op + dt * jnp.einsum("...m,mnk->...nk", kappas, K_vals)
    return A, M_op


def ell_diag(cols: np.ndarray, vals) -> jnp.ndarray:
    """Extract the diagonal of an ELL operator."""
    n = cols.shape[0]
    own = cols == np.arange(n, dtype=cols.dtype)[:, None]
    return (vals * jnp.asarray(own, vals.dtype)).sum(-1)
