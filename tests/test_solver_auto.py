"""Round-3 driver defaults, part 2: solver='auto'.

Both drivers now default to solver='auto' — the batched VMEM Pallas engine
on TPU f32 whenever the working set fits, the XLA streaming path otherwise
(plain f64_refine sweeps always run the VMEM engine, the only one that
refines without record_gradient). The sweep driver resolves per width
group (mesh shape known there) and records what actually executed in
sweep_metadata.json's solver_resolved — metadata must report what ran,
not what was requested.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import yaml

from heatflow_tpu.drivers import sweep as sweep_mod
from tests.fixtures import synthetic_heating, tiny_no_diamond_cfg


def _tiny_mesh(tmp_path):
    from heatflow_tpu.geometry import build_layout
    from heatflow_tpu.mesh.structured import build_structured_mesh
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    domain, mats = build_layout(cfg)
    return build_structured_mesh(domain, mats)


def test_resolve_solver_matrix(tmp_path, monkeypatch):
    mesh = _tiny_mesh(tmp_path)
    res = sweep_mod._resolve_solver
    kw = dict(precondition="jacobi", f64_refine=0, record_gradient=False)

    # explicit choices pass through untouched
    assert res("xla", mesh, dtype=jnp.float32, **kw) == "xla"
    assert res("vmem", mesh, dtype=jnp.float32, **kw) == "vmem"
    # off-TPU (this test runs on CPU): auto → xla
    assert res("auto", mesh, dtype=jnp.float32, **kw) == "xla"
    # plain refine sweeps only exist on the VMEM engine
    assert res("auto", mesh, dtype=jnp.float32, precondition="jacobi",
               f64_refine=1, record_gradient=False) == "vmem"
    # recording refine has an XLA engine too — normal resolution (CPU→xla)
    assert res("auto", mesh, dtype=jnp.float32, precondition="jacobi",
               f64_refine=1, record_gradient=True) == "xla"

    # emulate the TPU backend: f32 fitting mesh → vmem; f64 → xla
    monkeypatch.setattr(sweep_mod.jax, "default_backend", lambda: "tpu")
    assert res("auto", mesh, dtype=jnp.float32, **kw) == "vmem"
    assert res("auto", mesh, dtype=jnp.float64, **kw) == "xla"

    # an over-budget grid falls back to the streaming path
    class Huge:
        shape = (4096, 8192)
    assert res("auto", Huge(), dtype=jnp.float32, **kw) == "xla"


def test_sweep_metadata_records_resolved_solver(tmp_path):
    heat_csv = tmp_path / "heat.csv"
    synthetic_heating(heat_csv)
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    cfg["heating"]["file"] = str(heat_csv)
    cfg["timing"]["num_steps"] = 2
    cfg_path = tmp_path / "base.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    width = float(cfg["mats"]["p_sample"]["z"])

    out = str(tmp_path / "sweep_auto")
    results, failed = sweep_mod.run_parameter_sweep(
        str(cfg_path), out, (4e-6, 4e-6), (3.0, 3.0), (width, width),
        (1, 2, 1), base_mesh_folder=str(tmp_path / "meshes"),
        suppress_print=True, dtype=jnp.float32)
    assert len(results) == 2 and not failed
    meta = json.load(open(os.path.join(out, "sweep_metadata.json")))
    assert meta["solver"] == "auto"
    # CPU test backend: auto resolves to the XLA path, and the metadata
    # says so per width group
    assert meta["solver_resolved"] == {f"{width:.6e}": "xla"}


def test_sweep_driver_resolves_warm_start(tmp_path):
    """f32 recording sweeps default to extrapolated warm starts (solve +
    per-step projection seed) — the +35-40%-at-flat-accuracy point; the
    resolved value reaches the maker (captured via its memoization key)."""
    from heatflow_tpu.sim import sweepkernel

    heat_csv = tmp_path / "heat.csv"
    synthetic_heating(heat_csv)
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    cfg["heating"]["file"] = str(heat_csv)
    cfg["timing"]["num_steps"] = 2
    cfg_path = tmp_path / "base.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    width = float(cfg["mats"]["p_sample"]["z"])

    seen = {}
    real = sweepkernel.make_sweep_fn_recording

    def capture(problem, **kw):
        seen.update(kw)
        return real(problem, **kw)

    import unittest.mock as mock
    with mock.patch.object(sweepkernel, "make_sweep_fn_recording", capture):
        results, failed = sweep_mod.run_parameter_sweep(
            str(cfg_path), str(tmp_path / "ws"), (4e-6, 4e-6), (3.0, 3.0),
            (width, width), (1, 1, 1),
            base_mesh_folder=str(tmp_path / "meshes"),
            suppress_print=True, dtype=jnp.float32, record_gradient=True)
    assert results and not failed
    assert seen["warm_start"] == "extrapolate"
    assert seen["precondition"] == "rline"
    assert seen["rtol"] == 1e-5
