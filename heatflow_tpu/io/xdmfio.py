"""XDMF + HDF5 time-series output and extraction.

Replaces dolfinx.io.XDMFFile (ref run_no_diamond.py:364-374,568-569) and the
meshio-based point extraction (ref io_utilities/xdmf_extract.py). Heavy data
(geometry, topology, per-step nodal fields) lives in an HDF5 sidecar; the
.xdmf file is the XML index — readable by ParaView and by
:func:`read_xdmf_timeseries`.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import h5py
import numpy as np

_TOPO_TYPE = {3: "Triangle", 2: "Polyline"}


class XDMFTimeSeriesWriter:
    """Write a mesh once, then one nodal scalar field per time step."""

    def __init__(self, path: str, nodes: np.ndarray, cells: np.ndarray,
                 field_name: str = "Temperature (K)"):
        self.path = path
        self.h5path = os.path.splitext(path)[0] + ".h5"
        self.field_name = field_name
        self.nodes = np.asarray(nodes, dtype=np.float64)
        self.cells = np.asarray(cells, dtype=np.int64)
        self.times: list[float] = []
        self._h5 = h5py.File(self.h5path, "w")
        # pad 2D coords to 3D XYZ for visualization tools
        xyz = np.zeros((len(self.nodes), 3))
        xyz[:, :self.nodes.shape[1]] = self.nodes
        self._h5.create_dataset("mesh/geometry", data=xyz)
        self._h5.create_dataset("mesh/topology", data=self.cells)
        self._steps = self._h5.create_group("fields")

    def write(self, field: np.ndarray, t: float) -> None:
        idx = len(self.times)
        self._steps.create_dataset(f"step_{idx:06d}",
                                   data=np.asarray(field, np.float64).ravel())
        self.times.append(float(t))

    def close(self) -> None:
        self._h5.create_dataset("times", data=np.asarray(self.times))
        self._h5.close()
        self._write_xml()

    # ------------------------------------------------------------------
    def _write_xml(self) -> None:
        h5rel = os.path.basename(self.h5path)
        npts, ncell = len(self.nodes), len(self.cells)
        nv = self.cells.shape[1]
        xdmf = ET.Element("Xdmf", Version="3.0")
        dom = ET.SubElement(xdmf, "Domain")
        grid_t = ET.SubElement(dom, "Grid", Name="TimeSeries",
                               GridType="Collection", CollectionType="Temporal")
        for idx, t in enumerate(self.times):
            g = ET.SubElement(grid_t, "Grid", Name=f"step_{idx}",
                              GridType="Uniform")
            ET.SubElement(g, "Time", Value=repr(t))
            topo = ET.SubElement(g, "Topology",
                                 TopologyType=_TOPO_TYPE[nv],
                                 NumberOfElements=str(ncell))
            d = ET.SubElement(topo, "DataItem",
                              Dimensions=f"{ncell} {nv}", Format="HDF",
                              NumberType="Int")
            d.text = f"{h5rel}:/mesh/topology"
            geo = ET.SubElement(g, "Geometry", GeometryType="XYZ")
            d = ET.SubElement(geo, "DataItem", Dimensions=f"{npts} 3",
                              Format="HDF")
            d.text = f"{h5rel}:/mesh/geometry"
            att = ET.SubElement(g, "Attribute", Name=self.field_name,
                                AttributeType="Scalar", Center="Node")
            d = ET.SubElement(att, "DataItem", Dimensions=str(npts),
                              Format="HDF")
            d.text = f"{h5rel}:/fields/step_{idx:06d}"
        ET.ElementTree(xdmf).write(self.path, xml_declaration=True)


def read_xdmf_timeseries(path: str):
    """Return (times (S,), nodes (N,2), cells, fields (S,N))."""
    h5path = os.path.splitext(path)[0] + ".h5"
    with h5py.File(h5path, "r") as f:
        times = f["times"][()]
        nodes = f["mesh/geometry"][()][:, :2]
        cells = f["mesh/topology"][()]
        fields = np.stack([f[f"fields/step_{i:06d}"][()]
                           for i in range(len(times))])
    return times, nodes, cells, fields


def extract_point_timeseries_xdmf(xdmf_path: str, function_name: str,
                                  query_points, method: str = "nearest"):
    """Post-hoc extraction of a nodal field at query points.

    Same contract as the reference utility (io_utilities/xdmf_extract.py:6-60):
    returns (times (S,), data (n_points, S)); 'nearest' uses nearest vertex,
    'linear' barycentric interpolation.
    """
    times, nodes, _cells, fields = read_xdmf_timeseries(xdmf_path)
    del function_name  # single-field files; kept for API parity
    qp = np.asarray(query_points, dtype=float)
    if method == "nearest":
        d2 = ((nodes[None, :, :] - qp[:, None, :]) ** 2).sum(-1)
        idx = d2.argmin(axis=1)
        data = fields[:, idx].T
    elif method == "linear":
        from scipy.interpolate import griddata
        data = np.stack([
            griddata(nodes, fields[s], qp, method="linear")
            for s in range(len(times))], axis=1)
    else:
        raise ValueError(f"unknown method {method!r}")
    order = np.argsort(times)
    return times[order], data[:, order]
