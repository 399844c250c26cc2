"""VMEM-resident Pallas CG kernel — interpreter-mode validation on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heatflow_tpu.geometry import build_layout
from heatflow_tpu.mesh.structured import build_structured_mesh
from heatflow_tpu.ops.cg import pcg
from heatflow_tpu.ops.pallas_cg import (cg_vmem_tol, fits_in_vmem,
                                        masked_scaled_operator)
from heatflow_tpu.ops.stencil import apply_stencil, assemble_stencils, \
    combine_operator
from tests.fixtures import tiny_no_diamond_cfg


@pytest.fixture(scope="module")
def system():
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    pack = assemble_stencils(mesh)
    kp = jnp.asarray([m.kappa for m in mats])
    rc = jnp.asarray([m.rho_cv for m in mats])
    A, _ = combine_operator(jnp.asarray(pack.K), jnp.asarray(pack.M), kp, rc,
                            1.5e-7)
    rng = np.random.default_rng(0)
    free = jnp.asarray((rng.random(mesh.shape) > 0.15).astype(float))
    s = jax.lax.rsqrt(jnp.where(A[0] > 0, A[0], 1.0)) * free + (1 - free)
    sm = s * free
    x_true = jnp.asarray(rng.standard_normal(mesh.shape)) * free
    b = sm * apply_stencil(A, sm * x_true)
    return A, sm, free, b, x_true


def test_kernel_matches_xla_cg(system):
    A, sm, free, b, x_true = system
    x, iters = cg_vmem_tol(A, sm, b, jnp.zeros_like(b), 1e-11,
                           maxiter=20000, interpret=True)
    err = float(jnp.abs(x - x_true).max() / jnp.abs(x_true).max())
    assert err < 1e-8
    assert 0 < int(iters) < 20000

    apply_s = lambda y: sm * apply_stencil(A, sm * y)
    ref = pcg(apply_s, b, jnp.zeros_like(b), mask=free, rtol=1e-11,
              maxiter=20000, rtol_wrt="r0")
    # same Krylov process → very similar iteration counts
    assert abs(int(iters) - int(ref.iters)) <= max(3, int(ref.iters) // 10)


def test_kernel_respects_tolerance(system):
    A, sm, free, b, x_true = system
    x_loose, it_loose = cg_vmem_tol(A, sm, b, jnp.zeros_like(b), 1e-2,
                                    maxiter=20000, interpret=True)
    x_tight, it_tight = cg_vmem_tol(A, sm, b, jnp.zeros_like(b), 1e-10,
                                    maxiter=20000, interpret=True)
    assert int(it_loose) < int(it_tight)
    e_loose = float(jnp.abs(x_loose - x_true).max())
    e_tight = float(jnp.abs(x_tight - x_true).max())
    assert e_tight < e_loose


def test_fits_in_vmem_thresholds():
    assert fits_in_vmem(251, 1107)            # flagship
    assert not fits_in_vmem(4000, 4000)       # way too big


def test_masked_scaled_operator_identity(system):
    """sanity for the (deprecated for solving, kept for analysis) baked
    operator: matches on-the-fly application in f64."""
    A, sm, free, b, x_true = system
    C, s = masked_scaled_operator(A, free)
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal(b.shape))
    lhs = apply_stencil(C, v)
    rhs = s * free * apply_stencil(A, s * free * v) + (1 - free) * v
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-12,
                               atol=1e-12 * float(jnp.abs(rhs).max()))
