"""Mesh generation: graded axes, cell tagging, triangle view."""

import numpy as np
import pytest

from heatflow_tpu.geometry import build_layout, coupler_watcher_points
from heatflow_tpu.mesh.axes import graded_axis
from heatflow_tpu.mesh.structured import build_structured_mesh
from tests.fixtures import tiny_no_diamond_cfg


def test_graded_axis_respects_sizes():
    ax = graded_axis(0.0, 10.0, [(0.0, 2.0, 0.5), (2.0, 10.0, 2.0)])
    assert ax[0] == 0.0 and ax[-1] == 10.0
    d = np.diff(ax)
    fine = d[(ax[:-1] >= 0) & (ax[1:] <= 2.0)]
    assert np.all(fine <= 0.5 + 1e-12)
    assert np.all(d > 0)


def test_graded_axis_min_of_overlaps():
    ax = graded_axis(0.0, 4.0, [(0.0, 4.0, 1.0), (1.0, 2.0, 0.25)])
    d = np.diff(ax)
    mids = 0.5 * (ax[:-1] + ax[1:])
    assert np.all(d[(mids > 1.0) & (mids < 2.0)] <= 0.25 + 1e-12)
    assert np.all(d[mids > 2.5] <= 1.0 + 1e-12)


def test_structured_mesh_tiles_and_tags():
    cfg = tiny_no_diamond_cfg()
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    assert set(mesh.material_tags) == {m.name for m in mats}
    assert sorted(mesh.material_tags.values()) == list(
        range(1, len(mats) + 1))
    # every cell tagged, and tag regions match material bounds
    assert mesh.cell_tags.min() >= 1
    zc = 0.5 * (mesh.z[:-1] + mesh.z[1:])
    rc = 0.5 * (mesh.r[:-1] + mesh.r[1:])
    for m in mats:
        tag = mesh.material_tags[m.name]
        sel = mesh.cell_tags == tag
        ii, jj = np.where(sel)
        assert np.all(zc[ii] >= m.bounds[0] - 1e-15)
        assert np.all(zc[ii] <= m.bounds[1] + 1e-15)
        assert np.all(rc[jj] >= m.bounds[2] - 1e-15)
        assert np.all(rc[jj] <= m.bounds[3] + 1e-15)


def test_triangle_view_consistent():
    cfg = tiny_no_diamond_cfg()
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    tris, tags = mesh.triangles()
    nodes = mesh.node_coords()
    assert tris.shape[0] == 2 * mesh.num_cells
    assert tags.shape[0] == tris.shape[0]
    # total triangle area == domain area
    p = nodes[tris]
    d1 = p[:, 1] - p[:, 0]
    d2 = p[:, 2] - p[:, 0]
    area = 0.5 * np.abs(d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0])
    expect = (mesh.z[-1] - mesh.z[0]) * (mesh.r[-1] - mesh.r[0])
    assert area.sum() == pytest.approx(expect, rel=1e-12)


def test_layout_geometry_stacks_contiguously():
    cfg = tiny_no_diamond_cfg()
    domain, mats = build_layout(cfg)
    by = {m.name: m for m in mats}
    order = ["p_ins", "p_coupler", "p_sample", "o_coupler", "o_ins"]
    for a, b in zip(order[:-1], order[1:]):
        assert by[a].bounds[1] == pytest.approx(by[b].bounds[0])
    assert by["p_ins"].bounds[0] == pytest.approx(domain[0])
    assert by["o_ins"].bounds[1] == pytest.approx(domain[1])


def test_watcher_points_at_coupler_centers():
    cfg = tiny_no_diamond_cfg()
    wp = coupler_watcher_points(cfg)
    _, mats = build_layout(cfg)
    by = {m.name: m for m in mats}
    assert wp["pside"][0] == pytest.approx(
        0.5 * (by["p_coupler"].bounds[0] + by["p_coupler"].bounds[1]))
    assert wp["oside"][0] == pytest.approx(
        0.5 * (by["o_coupler"].bounds[0] + by["o_coupler"].bounds[1]))
    assert wp["pside"][1] == 0.0


def test_nearest_node():
    cfg = tiny_no_diamond_cfg()
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    nodes = mesh.node_coords()
    q = (mesh.z[3] + 1e-12, mesh.r[5] - 1e-12)
    nid = mesh.nearest_node(*q)
    d = np.linalg.norm(nodes - np.array(q), axis=1)
    assert d[nid] == pytest.approx(d.min())
