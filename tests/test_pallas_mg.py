"""In-VMEM multigrid-preconditioned CG — interpreter-mode validation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heatflow_tpu.geometry import build_layout
from heatflow_tpu.mesh.structured import build_structured_mesh
from heatflow_tpu.ops.cg import pcg
from heatflow_tpu.ops.pallas_mg import build_mg_setup, mgcg_vmem_tol
from heatflow_tpu.ops.stencil import apply_stencil, assemble_stencils, \
    combine_operator
from tests.fixtures import tiny_no_diamond_cfg


@pytest.fixture(scope="module")
def system():
    cfg = tiny_no_diamond_cfg(coarse=2.0)
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    pack = assemble_stencils(mesh)
    kp = jnp.asarray([m.kappa for m in mats])
    rc = jnp.asarray([m.rho_cv for m in mats])
    A, _ = combine_operator(jnp.asarray(pack.K), jnp.asarray(pack.M), kp, rc,
                            1.5e-7)
    free = np.ones(mesh.shape)
    free[0, :] = free[-1, :] = free[:, -1] = 0.0
    free = jnp.asarray(free)
    s = jax.lax.rsqrt(jnp.where(A[0] > 0, A[0], 1.0)) * free + (1 - free)
    sm = s * free
    rng = np.random.default_rng(0)
    x_true = jnp.asarray(rng.standard_normal(mesh.shape)) * free
    b = sm * apply_stencil(A, sm * x_true)
    return mesh, A, sm, free, b, x_true


def test_mgcg_solves_and_beats_plain_cg(system):
    mesh, A, sm, free, b, x_true = system
    setup = build_mg_setup(np.asarray(A), np.asarray(free), mesh.z, mesh.r,
                           n_levels=3, dtype=jnp.float64)
    x, iters = mgcg_vmem_tol(setup, b, jnp.zeros_like(b), 1e-10,
                             maxiter=2000, interpret=True)
    err = float(jnp.abs(x - x_true).max() / jnp.abs(x_true).max())
    assert err < 1e-8, f"err {err:.2e}"

    apply_s = lambda y: sm * apply_stencil(A, sm * y)
    ref = pcg(apply_s, b, jnp.zeros_like(b), mask=free, rtol=1e-10,
              maxiter=40000, rtol_wrt="r0")
    assert int(iters) < int(ref.iters) / 3, \
        f"MG-PCG {int(iters)} vs plain {int(ref.iters)}"
