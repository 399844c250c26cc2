"""1D P1 assembly (3-point stencils) and a jit/vmap-compatible tridiagonal
direct solver.

The reduced model's implicit systems are tridiagonal, so instead of an
iterative solve (or the reference's MUMPS LU, ref run_no_diamond_1d.py:602-607)
each step is an exact Thomas-algorithm solve expressed as two ``lax.scan``
sweeps — sequential over the ~10²-10³ axis nodes but fully vectorized over
vmapped sweep batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def assemble_1d(z: np.ndarray, cell_tags: np.ndarray, n_mats: int):
    """Per-material geometric 1D stencils.

    Returns dict with 'K' and 'M' of shape (n_mats, 3, Nz): index 0 is the
    diagonal, 1 the +1 off-diagonal (coupling to the right neighbor), 2 the
    -1 off-diagonal. 'M_unit' (3, Nz) is the unit-density mass used for
    source-term integration (ref run_no_diamond_1d.py:543).
    """
    z = np.asarray(z, dtype=np.float64)
    h = np.diff(z)                      # (Nz-1,)
    nz = len(z)
    K = np.zeros((n_mats, 3, nz))
    M = np.zeros((n_mats, 3, nz))
    for m in range(n_mats):
        w = (np.asarray(cell_tags) == m + 1).astype(np.float64)
        kh = w / h
        mh = w * h / 6.0
        # element [[1,-1],[-1,1]]/h and h/6 [[2,1],[1,2]] scattered to nodes
        K[m, 0, :-1] += kh
        K[m, 0, 1:] += kh
        K[m, 1, :-1] -= kh      # node i -> i+1
        K[m, 2, 1:] -= kh       # node i -> i-1
        M[m, 0, :-1] += 2.0 * mh
        M[m, 0, 1:] += 2.0 * mh
        M[m, 1, :-1] += mh
        M[m, 2, 1:] += mh
    return {"K": K, "M": M, "M_unit": M.sum(axis=0)}


def apply_tridiag(C: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """(A @ u) for a 3-point stencil C (..., 3, Nz), u (..., Nz)."""
    d, up, lo = C[..., 0, :], C[..., 1, :], C[..., 2, :]
    right = jnp.pad(u[..., 1:], [(0, 0)] * (u.ndim - 1) + [(0, 1)])
    left = jnp.pad(u[..., :-1], [(0, 0)] * (u.ndim - 1) + [(1, 0)])
    return d * u + up * right + lo * left


def combine_tridiag(K, M, kappas, rho_cvs, dt):
    """(A, M_op) for a backward-Euler step, batched like combine_operator
    (unrolled multiply-add, not einsum — see stencil.material_combine)."""
    from heatflow_tpu.ops.stencil import material_combine
    M_op = material_combine(rho_cvs, M)
    A = M_op + dt * material_combine(kappas, K)
    return A, M_op


def thomas_solve(C: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact tridiagonal solve A x = b with A as a 3-point stencil (3, Nz).

    Two lax.scan sweeps; vmap over leading batch dims handled by jax.
    """
    d, du, dl = C[0], C[1], C[2]

    def fwd(carry, x):
        cp_prev, dp_prev = carry
        a, bb, c, rhs = x
        denom = bb - a * cp_prev
        cp = c / denom
        dp = (rhs - a * dp_prev) / denom
        return (cp, dp), (cp, dp)

    zero = jnp.zeros((), b.dtype)
    _, (cps, dps) = jax.lax.scan(fwd, (zero, zero), (dl, d, du, b))

    def back(x_next, x):
        cp, dp = x
        xi = dp - cp * x_next
        return xi, xi

    _, xs = jax.lax.scan(back, zero, (cps, dps), reverse=True)
    return xs


def dirichlet_rows(C: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray,
                   values: jnp.ndarray):
    """Impose Dirichlet rows by identity-row replacement (exact for a direct
    solve; equivalent to the reference's lifting + set_bc)."""
    free = 1.0 - mask
    d = C[0] * free + mask
    du = C[1] * free
    dl = C[2] * free
    # also zero the *columns* touching constrained nodes, lifting their
    # contribution into the rhs, to keep the solve exactly equivalent
    right_g = jnp.pad((mask * values)[1:], (0, 1))
    left_g = jnp.pad((mask * values)[:-1], (1, 0))
    b = jnp.where(mask > 0, values, b - du * right_g - dl * left_g)
    du = du * (1.0 - jnp.pad(mask[1:], (0, 1)))
    dl = dl * (1.0 - jnp.pad(mask[:-1], (1, 0)))
    return jnp.stack([d, du, dl]), b
