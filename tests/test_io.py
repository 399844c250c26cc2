"""CSV format conventions, .msh round-trip, XDMF round-trip."""

import os

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


# ----------------------------------------------------------------------
# cross-format XDMF reading (VERDICT r1 item 7): dolfinx- and meshio-layout
# files must read through the same extraction utility as our own
# (ref io_utilities/xdmf_extract.py:31-56 reads dolfinx-written files)
# ----------------------------------------------------------------------

def _write_dolfinx_style_xdmf(folder, name, nodes, cells, times, fields,
                              field_name="Temperature (K)"):
    """Emulate dolfinx.io.XDMFFile's on-disk layout: a standalone mesh grid,
    a temporal collection whose step grids reference the mesh via
    xi:include xpointer, heavy data under /Mesh/mesh/* and
    /Function/<name>/<i> in the HDF5 sidecar."""
    import h5py
    xdmf_path = os.path.join(folder, f"{name}.xdmf")
    h5_name = f"{name}.h5"
    with h5py.File(os.path.join(folder, h5_name), "w") as f:
        f.create_dataset("Mesh/mesh/geometry", data=np.asarray(nodes, float))
        f.create_dataset("Mesh/mesh/topology", data=np.asarray(cells))
        for i, fld in enumerate(fields):
            f.create_dataset(f"Function/{field_name}/{i}",
                             data=np.asarray(fld, float)[:, None])
    n, m = len(nodes), len(cells)
    steps = "\n".join(f"""
      <Grid Name="{field_name}" GridType="Uniform">
        <xi:include xpointer="xpointer(/Xdmf/Domain/Grid[@GridType='Uniform'][1]/*[self::Topology or self::Geometry])" />
        <Time Value="{t!r}" />
        <Attribute Name="{field_name}" AttributeType="Scalar" Center="Node">
          <DataItem Dimensions="{n} 1" Format="HDF">{h5_name}:/Function/{field_name}/{i}</DataItem>
        </Attribute>
      </Grid>""" for i, t in enumerate(times))
    xml = f"""<?xml version="1.0"?>
<Xdmf Version="3.0" xmlns:xi="http://www.w3.org/2001/XInclude">
  <Domain>
    <Grid Name="mesh" GridType="Uniform">
      <Topology TopologyType="triangle" NumberOfElements="{m}" NodesPerElement="3">
        <DataItem Dimensions="{m} 3" NumberType="Int" Format="HDF">{h5_name}:/Mesh/mesh/topology</DataItem>
      </Topology>
      <Geometry GeometryType="XY">
        <DataItem Dimensions="{n} 2" Format="HDF">{h5_name}:/Mesh/mesh/geometry</DataItem>
      </Geometry>
    </Grid>
    <Grid Name="{field_name}" GridType="Collection" CollectionType="Temporal">{steps}
    </Grid>
  </Domain>
</Xdmf>
"""
    with open(xdmf_path, "w") as f:
        f.write(xml)
    return xdmf_path


def _write_meshio_style_xdmf(folder, name, nodes, cells, times, fields,
                             field_name="T"):
    """Emulate meshio TimeSeriesWriter's layout: inline-XML data items,
    XYZ geometry, data under sequential step grids."""
    xdmf_path = os.path.join(folder, f"{name}.xdmf")
    xyz = np.zeros((len(nodes), 3))
    xyz[:, :2] = nodes

    def item(arr, numtype="Float"):
        flat = " ".join(repr(float(v)) for v in np.asarray(arr, float).ravel())
        dims = " ".join(str(d) for d in np.shape(arr))
        return (f'<DataItem Dimensions="{dims}" NumberType="{numtype}" '
                f'Format="XML">{flat}</DataItem>')

    steps = "\n".join(f"""
      <Grid Name="step{i}" GridType="Uniform">
        <xi:include xpointer="xpointer(//Grid[@Name='mesh0']/*[self::Topology or self::Geometry])" />
        <Time Value="{t!r}" />
        <Attribute Name="{field_name}" AttributeType="Scalar" Center="Node">
          {item(fld)}
        </Attribute>
      </Grid>""" for i, (t, fld) in enumerate(zip(times, fields)))
    xml = f"""<?xml version="1.0"?>
<Xdmf Version="3.0" xmlns:xi="https://www.w3.org/2001/XInclude">
  <Domain>
    <Grid Name="mesh0" GridType="Uniform">
      <Topology TopologyType="Triangle" NumberOfElements="{len(cells)}">
        {item(cells, "Int")}
      </Topology>
      <Geometry GeometryType="XYZ">
        {item(xyz)}
      </Geometry>
    </Grid>
    <Grid Name="TimeSeries" GridType="Collection" CollectionType="Temporal">{steps}
    </Grid>
  </Domain>
</Xdmf>
"""
    with open(xdmf_path, "w") as f:
        f.write(xml)
    return xdmf_path


def _cross_format_case():
    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    cells = np.array([[0, 1, 2], [0, 2, 3]])
    times = [0.0, 0.5, 1.0]
    fields = [np.array([1.0, 2.0, 3.0, 4.0]) * (1 + s) for s in range(3)]
    return nodes, cells, times, fields


def test_extraction_reads_dolfinx_layout(tmp_path):
    nodes, cells, times, fields = _cross_format_case()
    p = _write_dolfinx_style_xdmf(str(tmp_path), "solution", nodes, cells,
                                  times, fields)
    t, nodes2, cells2, flds = read_xdmf_timeseries(p, "Temperature (K)")
    np.testing.assert_allclose(t, times)
    np.testing.assert_allclose(nodes2, nodes)
    np.testing.assert_array_equal(cells2, cells)
    np.testing.assert_allclose(flds, np.stack(fields))
    t, data = extract_point_timeseries_xdmf(p, "Temperature (K)",
                                            [(0.99, 0.01), (0.01, 0.99)])
    np.testing.assert_allclose(data[0], [2.0, 4.0, 6.0])
    np.testing.assert_allclose(data[1], [4.0, 8.0, 12.0])


def test_extraction_reads_meshio_layout(tmp_path):
    nodes, cells, times, fields = _cross_format_case()
    p = _write_meshio_style_xdmf(str(tmp_path), "ts", nodes, cells, times,
                                 fields)
    t, nodes2, cells2, flds = read_xdmf_timeseries(p, "T")
    np.testing.assert_allclose(t, times)
    np.testing.assert_allclose(nodes2, nodes)   # XYZ → XY truncation
    np.testing.assert_allclose(flds, np.stack(fields))
    t, data = extract_point_timeseries_xdmf(p, "T", [(0.5, 0.5)],
                                            method="linear")
    assert data.shape == (1, 3) and np.isfinite(data).all()


def test_extraction_unknown_field_name_tolerated(tmp_path):
    """The reference passes arbitrary function names; a mismatch should fall
    back to the single field present instead of failing."""
    nodes, cells, times, fields = _cross_format_case()
    p = _write_dolfinx_style_xdmf(str(tmp_path), "s2", nodes, cells, times,
                                  fields)
    t, data = extract_point_timeseries_xdmf(p, "f", [(0.0, 0.0)])
    np.testing.assert_allclose(data[0], [1.0, 2.0, 3.0])


def _write_msh41(path, nodes, cells, cell_tags, material_tags):
    """Emit an MSH 4.1 ASCII file the way gmsh does (one surface entity per
    physical group, entity-blocked nodes/elements) — the format modern gmsh
    writes for the reference's meshes."""
    tags = sorted(set(int(t) for t in cell_tags))
    lines = ["$MeshFormat", "4.1 0 8", "$EndMeshFormat",
             "$PhysicalNames", str(len(material_tags))]
    for name, tag in sorted(material_tags.items(), key=lambda kv: kv[1]):
        lines.append(f'2 {tag} "{name}"')
    lines += ["$EndPhysicalNames", "$Entities",
              f"0 0 {len(tags)} 0"]
    for t in tags:   # surface entity tag == physical tag here
        lines.append(f"{t} 0 0 0 1 1 0 1 {t} 0")
    lines += ["$EndEntities", "$Nodes",
              f"1 {len(nodes)} 1 {len(nodes)}",
              f"2 {tags[0]} 0 {len(nodes)}"]
    for i in range(len(nodes)):
        lines.append(str(i + 1))
    for z, r in nodes:
        lines.append(f"{z:.16e} {r:.16e} 0")
    lines += ["$EndNodes", "$Elements"]
    blocks = [(t, np.where(cell_tags == t)[0]) for t in tags]
    lines.append(f"{len(blocks)} {len(cells)} 1 {len(cells)}")
    e = 1
    for t, idxs in blocks:
        lines.append(f"2 {t} 2 {len(idxs)}")
        for ci in idxs:
            conn = " ".join(str(int(c) + 1) for c in cells[ci])
            lines.append(f"{e} {conn}")
            e += 1
    lines += ["$EndElements", ""]
    with open(path, "w") as f:
        f.write("\n".join(lines))


def test_msh41_import(tmp_path):
    """MSH 4.1 files (modern gmsh default) read identically to 2.2."""
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    tris, tags = mesh.triangles()
    p41 = tmp_path / "mesh41.msh"
    _write_msh41(str(p41), mesh.node_coords(), tris, tags,
                 mesh.material_tags)
    back = read_msh(str(p41))
    np.testing.assert_allclose(back.nodes, mesh.node_coords())
    # element order is grouped by entity in 4.1 — compare as sets with tags
    got = {(*sorted(map(int, c)), int(t))
           for c, t in zip(back.cells, back.cell_tags)}
    want = {(*sorted(map(int, c)), int(t)) for c, t in zip(tris, tags)}
    assert got == want
    assert back.material_tags == mesh.material_tags
