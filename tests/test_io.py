"""CSV format conventions, .msh round-trip, XDMF round-trip."""

import numpy as np
import pandas as pd
import pytest

from heatflow_tpu.geometry import build_layout
from heatflow_tpu.mesh.msh_io import read_msh, write_msh
from heatflow_tpu.mesh.structured import build_structured_mesh
from heatflow_tpu.io.csvio import (read_gradient_csv, write_gradient_csv,
                                   write_watcher_csv)
from heatflow_tpu.io.xdmfio import (XDMFTimeSeriesWriter,
                                    extract_point_timeseries_xdmf,
                                    read_xdmf_timeseries)
from tests.fixtures import tiny_no_diamond_cfg


def test_watcher_csv_has_time_column(tmp_path):
    p = tmp_path / "watcher_points.csv"
    times = np.array([1e-7, 2e-7])
    write_watcher_csv(str(p), times, {"pside": np.array([310.0, 320.0]),
                                      "oside": np.array([301.0, 302.0])})
    df = pd.read_csv(p)
    assert list(df.columns) == ["time", "pside", "oside"]
    np.testing.assert_allclose(df["time"], times)


def test_gradient_csv_time_index(tmp_path):
    p = tmp_path / "radial_gradient.csv"
    times = np.array([1e-7, 2e-7, 3e-7])
    cols = np.array([-1e-6, 0.0, 1e-6])
    rows = np.arange(9.0).reshape(3, 3)
    write_gradient_csv(str(p), times, cols, rows)
    # raw text convention: first header cell is 'time'
    header = open(p).readline()
    assert header.startswith("time,")
    t2, z2, v2 = read_gradient_csv(str(p))
    np.testing.assert_allclose(t2, times)
    np.testing.assert_allclose(z2, cols)
    np.testing.assert_allclose(v2, rows)


def test_msh_roundtrip(tmp_path):
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    tris, tags = mesh.triangles()
    nodes = mesh.node_coords()
    p = tmp_path / "mesh.msh"
    write_msh(str(p), nodes, tris, tags, mesh.material_tags)
    back = read_msh(str(p))
    np.testing.assert_allclose(back.nodes, nodes, rtol=0, atol=1e-18)
    np.testing.assert_array_equal(back.cells, tris)
    np.testing.assert_array_equal(back.cell_tags, tags)
    assert back.material_tags == mesh.material_tags


def test_xdmf_roundtrip_and_extraction(tmp_path):
    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    cells = np.array([[0, 1, 2], [0, 2, 3]])
    p = tmp_path / "output.xdmf"
    w = XDMFTimeSeriesWriter(str(p), nodes, cells)
    f0 = np.array([1.0, 2.0, 3.0, 4.0])
    f1 = 10 * f0
    w.write(f0, 0.0)
    w.write(f1, 0.5)
    w.close()

    times, nodes2, cells2, fields = read_xdmf_timeseries(str(p))
    np.testing.assert_allclose(times, [0.0, 0.5])
    np.testing.assert_allclose(fields, np.stack([f0, f1]))

    t, data = extract_point_timeseries_xdmf(str(p), "Temperature (K)",
                                            [(0.99, 0.01), (0.01, 0.99)])
    np.testing.assert_allclose(data[0], [2.0, 20.0])   # nearest node 1
    np.testing.assert_allclose(data[1], [4.0, 40.0])   # nearest node 3

    t, data = extract_point_timeseries_xdmf(str(p), "Temperature (K)",
                                            [(0.5, 0.5)], method="linear")
    assert data.shape == (1, 2)
    assert 1.0 <= data[0, 0] <= 4.0


def test_xdmf_xml_is_valid(tmp_path):
    import xml.etree.ElementTree as ET
    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    cells = np.array([[0, 1, 2]])
    p = tmp_path / "o.xdmf"
    w = XDMFTimeSeriesWriter(str(p), nodes, cells)
    w.write(np.zeros(3), 0.0)
    w.close()
    tree = ET.parse(p)
    grids = tree.getroot().findall(".//Grid[@GridType='Uniform']")
    assert len(grids) == 1
