"""PCG solver correctness, masking, and vmap behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heatflow_tpu.ops.cg import jacobi_preconditioner, pcg, pcg_fixed


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    Q = rng.standard_normal((n, n))
    A = Q @ Q.T + n * np.eye(n)
    return A


def test_pcg_solves_dense_spd():
    n = 40
    A = _spd(n)
    b = np.arange(1.0, n + 1)
    apply_op = lambda x: jnp.asarray(A) @ x
    res = pcg(apply_op, jnp.asarray(b), jnp.zeros(n),
              precond=jacobi_preconditioner(jnp.asarray(np.diag(A))),
              rtol=1e-13, maxiter=500)
    x_ref = np.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-9)
    assert bool(res.converged)


def test_pcg_masked_preserves_constrained_values():
    n = 30
    A = _spd(n, 1)
    mask = np.ones(n, bool)
    mask[[0, 7, 29]] = False
    g = np.zeros(n)
    g[[0, 7, 29]] = [3.0, -2.0, 5.0]
    b = np.linspace(-1, 1, n)

    # reference: solve the reduced system with lifting
    A_ff = A[np.ix_(mask, mask)]
    b_l = b[mask] - A[np.ix_(mask, ~mask)] @ g[~mask]
    x_ref = np.linalg.solve(A_ff, b_l)

    apply_op = lambda x: jnp.asarray(A) @ x
    bl_full = jnp.asarray(b) - apply_op(jnp.asarray(g))
    res = pcg(apply_op, bl_full, jnp.zeros(n),
              precond=jacobi_preconditioner(jnp.asarray(np.diag(A)),
                                            jnp.asarray(mask)),
              mask=jnp.asarray(mask), rtol=1e-13, maxiter=500)
    u = np.asarray(res.x) + g  # embed boundary values
    np.testing.assert_allclose(u[mask], x_ref, rtol=1e-9)
    np.testing.assert_allclose(u[~mask], g[~mask])


def test_pcg_fixed_matches_pcg():
    n = 25
    A = _spd(n, 2)
    b = np.ones(n)
    apply_op = lambda x: jnp.asarray(A) @ x
    pre = jacobi_preconditioner(jnp.asarray(np.diag(A)))
    r1 = pcg(apply_op, jnp.asarray(b), jnp.zeros(n), precond=pre,
             rtol=0.0, atol=1e-300, maxiter=10)
    r2 = pcg_fixed(apply_op, jnp.asarray(b), jnp.zeros(n), precond=pre,
                   iters=10)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x),
                               rtol=1e-12)


def test_pcg_vmaps_over_batched_systems():
    n, B = 20, 4
    rng = np.random.default_rng(3)
    As = np.stack([_spd(n, seed=10 + i) for i in range(B)])
    bs = rng.standard_normal((B, n))

    def solve_one(A, b):
        return pcg(lambda x: A @ x, b, jnp.zeros(n),
                   precond=jacobi_preconditioner(jnp.diagonal(A)),
                   rtol=1e-13, maxiter=600).x

    xs = jax.vmap(solve_one)(jnp.asarray(As), jnp.asarray(bs))
    for i in range(B):
        np.testing.assert_allclose(np.asarray(xs[i]),
                                   np.linalg.solve(As[i], bs[i]), rtol=1e-8)
