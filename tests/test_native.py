"""Native C++ mesh/assembly kernels vs the numpy implementations."""

import numpy as np
import pytest

from heatflow_tpu.geometry import build_layout
from heatflow_tpu.mesh.axes import graded_axis
from heatflow_tpu.mesh.structured import build_structured_mesh
from heatflow_tpu.native import (get_lib, native_assemble_stencils,
                                 native_assign_cell_tags, native_graded_axis)
from heatflow_tpu.ops.stencil import assemble_stencils
from tests.fixtures import tiny_no_diamond_cfg

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native library unavailable")


def test_native_graded_axis_matches_numpy():
    spans = [(0.0, 2.0, 0.5), (1.0, 10.0, 2.0), (4.0, 5.0, 0.25)]
    ref = graded_axis(0.0, 10.0, spans)
    got = native_graded_axis(0.0, 10.0, spans, 2.0)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12)


def test_native_cell_tags_match():
    cfg = tiny_no_diamond_cfg()
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    rects = np.array([m.bounds for m in mats])
    got = native_assign_cell_tags(mesh.z, mesh.r, rects)
    np.testing.assert_array_equal(got, mesh.cell_tags)


def test_native_assembly_matches_numpy():
    cfg = tiny_no_diamond_cfg(coarse=2.0)
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    ref = assemble_stencils(mesh, backend="numpy")
    out = native_assemble_stencils(mesh.z, mesh.r, mesh.cell_tags, len(mats))
    K, M, Kf, Mf, G_r, G_z = out
    for got, exp, name in ((K, ref.K, "K"), (M, ref.M, "M"),
                           (Kf, ref.K_flat, "K_flat"),
                           (Mf, ref.M_flat, "M_flat"),
                           (G_r, ref.G_r, "G_r"), (G_z, ref.G_z, "G_z")):
        scale = np.abs(exp).max()
        assert np.abs(got - exp).max() <= 1e-13 * scale, name


def test_auto_backend_used_in_assemble():
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    a = assemble_stencils(mesh, backend="auto")
    b = assemble_stencils(mesh, backend="numpy")
    np.testing.assert_allclose(a.K, b.K, atol=1e-13 * np.abs(b.K).max())
    np.testing.assert_allclose(a.M_proj, b.M_proj,
                               atol=1e-13 * np.abs(b.M_proj).max())
