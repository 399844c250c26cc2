"""Multi-device sharding on the virtual 8-device CPU mesh: config-batch
parallelism and z-domain decomposition (XLA halo exchange)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from heatflow_tpu.geometry import build_layout
from heatflow_tpu.mesh.structured import build_structured_mesh
from heatflow_tpu.ops.stencil import apply_stencil, assemble_stencils, \
    combine_operator
from heatflow_tpu.parallel.sharding import (batch_step_sharded, config_mesh,
                                            shard_batch)
from tests.fixtures import tiny_no_diamond_cfg

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def system():
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    pack = assemble_stencils(mesh)
    kp = np.array([m.kappa for m in mats])
    rc = np.array([m.rho_cv for m in mats])
    return mesh, pack, kp, rc


def test_sharded_stencil_apply_matches_single_device(system):
    """z-sharded apply must equal the unsharded result — validates the
    XLA-inserted halo exchange."""
    mesh, pack, kp, rc = system
    A, _ = combine_operator(jnp.asarray(pack.K), jnp.asarray(pack.M),
                            jnp.asarray(kp), jnp.asarray(rc), 1e-7)
    nz, nr = mesh.shape
    pad = (-nz) % 2
    A = jnp.pad(A, ((0, 0), (0, pad), (0, 0)))
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((nz + pad, nr)))
    y_ref = np.asarray(apply_stencil(A, u))

    dmesh = config_mesh(8, z_shards=2)
    with dmesh:
        A_s = jax.device_put(A, NamedSharding(dmesh, P(None, "z", None)))
        u_s = jax.device_put(u, NamedSharding(dmesh, P("z", None)))
        f = jax.jit(apply_stencil,
                    out_shardings=NamedSharding(dmesh, P("z", None)))
        y = np.asarray(f(A_s, u_s))
    np.testing.assert_allclose(y, y_ref, rtol=1e-12,
                               atol=1e-12 * np.abs(y_ref).max())


def test_batch_step_sharded_matches_unsharded(system):
    mesh, pack, kp, rc = system
    nz, nr = mesh.shape
    pad = (-nz) % 2
    B = 8
    kb = np.tile(kp, (B, 1))
    kb[:, 2] *= np.linspace(0.5, 2.0, B)
    A, M_op = combine_operator(jnp.asarray(pack.K), jnp.asarray(pack.M),
                               jnp.asarray(kb), jnp.asarray(np.tile(rc, (B, 1))),
                               1e-7)
    A = jnp.pad(A, ((0, 0), (0, 0), (0, pad), (0, 0)))
    M_op = jnp.pad(M_op, ((0, 0), (0, 0), (0, pad), (0, 0)))
    free = np.ones((nz + pad, nr), np.float64)
    free[0, :] = free[-1 - pad:, :] = 0.0
    g = np.zeros((B, nz + pad, nr))
    g[:, 0, :] = 350.0
    u = np.full((B, nz + pad, nr), 300.0)

    # unsharded reference via the same building block on one device
    dmesh1 = config_mesh(1, z_shards=1)
    with dmesh1:
        step1 = batch_step_sharded(dmesh1, iters=6)
        a1, m1, u1, g1 = shard_batch(dmesh1, (A, M_op, u, g))
        f1 = jax.device_put(jnp.asarray(free), NamedSharding(
            dmesh1, P("z", None)))
        ref = np.asarray(step1(a1, m1, f1, g1, u1))

    dmesh = config_mesh(8, z_shards=2)
    with dmesh:
        step = batch_step_sharded(dmesh, iters=6)
        a2, m2, u2, g2 = shard_batch(dmesh, (A, M_op, u, g))
        f2 = jax.device_put(jnp.asarray(free), NamedSharding(
            dmesh, P("z", None)))
        out = np.asarray(step(a2, m2, f2, g2, u2))
    np.testing.assert_allclose(out, ref, rtol=1e-10,
                               atol=1e-10 * np.abs(ref).max())
