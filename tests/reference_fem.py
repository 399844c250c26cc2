"""Independent scipy/quadrature-based P1 FEM implementation used ONLY by the
test suite to validate the framework's closed-form stencil assembly and
scan-based stepper against a classical sparse-matrix backward-Euler solver
(the same algorithm the reference framework delegates to PETSc/MUMPS).

Deliberately written with numerical quadrature (degree-3 rule) and sparse LU
so it shares no code path with heatflow_tpu.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

# symmetric degree-3 quadrature rule (4 points) in barycentric coords
_QP = np.array([
    [1 / 3, 1 / 3, 1 / 3],
    [0.6, 0.2, 0.2],
    [0.2, 0.6, 0.2],
    [0.2, 0.2, 0.6],
])
_QW = np.array([-27 / 48, 25 / 48, 25 / 48, 25 / 48])


def _tri_geom(nodes, tris):
    p = nodes[tris]                     # (M, 3, 2)
    d1 = p[:, 1] - p[:, 0]
    d2 = p[:, 2] - p[:, 0]
    det = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
    area = 0.5 * np.abs(det)
    x, y = p[..., 0], p[..., 1]
    gx = np.stack([y[:, 1] - y[:, 2], y[:, 2] - y[:, 0], y[:, 0] - y[:, 1]],
                  axis=1) / det[:, None]
    gy = np.stack([x[:, 2] - x[:, 1], x[:, 0] - x[:, 2], x[:, 1] - x[:, 0]],
                  axis=1) / det[:, None]
    grads = np.stack([gx, gy], axis=2)  # (M, 3, 2)
    return p, area, grads


def assemble(nodes, tris, cell_kappa, cell_rhocv, *, r_weighted=True):
    """Return (K, M) global sparse matrices via quadrature.

    K: stiffness with per-cell kappa; M: mass with per-cell rho_cv; both with
    the cylindrical weight r if r_weighted.
    """
    n = len(nodes)
    p, area, grads = _tri_geom(nodes, tris)
    rq = np.einsum("qa,ma->mq", _QP, p[..., 1])          # r at quad points
    w = _QW[None, :] * area[:, None]                      # (M, q)
    wr = w * (rq if r_weighted else 1.0)

    # mass: Σ_q w_q φa φb
    phi = _QP                                              # (q, 3)
    Me = np.einsum("mq,qa,qb->mab", wr, phi, phi) * cell_rhocv[:, None, None]
    # stiffness: grads constant
    gg = np.einsum("mad,mbd->mab", grads, grads)
    Ke = gg * wr.sum(axis=1)[:, None, None] * cell_kappa[:, None, None]

    rows = np.repeat(tris, 3, axis=1).ravel()
    cols = np.tile(tris, (1, 3)).ravel()
    K = sp.coo_matrix((Ke.ravel(), (rows, cols)), shape=(n, n)).tocsr()
    M = sp.coo_matrix((Me.ravel(), (rows, cols)), shape=(n, n)).tocsr()
    return K, M


def gradient_projection_matrices(nodes, tris):
    """(M_proj, G_r): r-weighted mass and the rhs operator with
    (G_r u)_a = ∫ (∂u/∂r) φ_a r dA."""
    n = len(nodes)
    p, area, grads = _tri_geom(nodes, tris)
    rq = np.einsum("qa,ma->mq", _QP, p[..., 1])
    w = _QW[None, :] * area[:, None]
    wr = w * rq
    Me = np.einsum("mq,qa,qb->mab", wr, _QP, _QP)
    wa = np.einsum("mq,qa->ma", wr, _QP)                  # ∫ φ_a r
    Ge = wa[:, :, None] * grads[:, None, :, 1]            # (M, a, b)

    rows = np.repeat(tris, 3, axis=1).ravel()
    cols = np.tile(tris, (1, 3)).ravel()
    Mp = sp.coo_matrix((Me.ravel(), (rows, cols)), shape=(n, n)).tocsr()
    G = sp.coo_matrix((Ge.ravel(), (rows, cols)), shape=(n, n)).tocsr()
    return Mp, G


def backward_euler(nodes, tris, cell_kappa, cell_rhocv, dt, num_steps,
                   dirichlet, g_of_t, ic, *, watch_nodes=(),
                   project_gradient=False):
    """Classical factor-once LU backward Euler with Dirichlet lifting —
    mirrors ref run_no_diamond.py:529-566 semantics.

    dirichlet: (n,) bool; g_of_t(t) -> (n,) boundary values (ignored at free
    dofs); returns dict of traces.
    """
    n = len(nodes)
    K, M = assemble(nodes, tris, cell_kappa, cell_rhocv)
    A = (M + dt * K).tocsc()
    free = ~dirichlet
    A_ff = A[free][:, free]
    A_fd = A[free][:, dirichlet]
    lu = spla.splu(A_ff.tocsc())

    if project_gradient:
        Mp, G = gradient_projection_matrices(nodes, tris)
        lup = spla.splu(Mp.tocsc())

    u = np.full(n, ic, dtype=np.float64)
    traces = {"watch": [], "u": [], "grad_r": []}
    for s in range(num_steps):
        t = (s + 1) * dt
        g = g_of_t(t)
        b = M @ u
        rhs = b[free] - A_fd @ g[dirichlet]
        x = lu.solve(rhs)
        u = np.where(dirichlet, g, 0.0)
        u[free] = x
        traces["u"].append(u.copy())
        if watch_nodes:
            traces["watch"].append([u[i] for i in watch_nodes])
        if project_gradient:
            traces["grad_r"].append(lup.solve(G @ u))
    return {k: np.array(v) for k, v in traces.items() if len(v)}
