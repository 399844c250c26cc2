"""Dirichlet boundary condition masks and time-dependent heating values.

Reproduces the geometric DOF-location semantics of the reference's
RowDirichletBC (ref: dirichlet_bc/bc.py:32-118): locations 'left'/'right'
(z extremes), 'bottom'/'top' (r extremes), 'outer' (all four), and inner
lines 'x'/'y' at a given coordinate, optionally clipped to a centred segment
of given length (tolerance +1e-14, ref bc.py:54). Default geometric width is
1e-10 (ref bc.py:32).

The per-DOF Python evaluation loop of the reference (bc.py:128-137) is
replaced by precomputed masks + vectorized profile evaluation inside jit.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

DEFAULT_WIDTH = 1e-10


def _close(vals: np.ndarray, target: float, width: float) -> np.ndarray:
    # matches np.isclose(vals, target, atol=width, rtol=1e-05) used by the
    # reference; for the coordinate magnitudes here the rtol term is the same
    # semantics, so replicate isclose exactly.
    return np.isclose(vals, target, atol=width)


def _centred(vals: np.ndarray, center: float, length: float | None) -> np.ndarray:
    if length is None:
        return np.ones_like(vals, dtype=bool)
    return np.abs(vals - center) <= 0.5 * length + 1e-14


def structured_row_mask(z: np.ndarray, r: np.ndarray, location: str, *,
                        coord: float | None = None,
                        center: float | None = None,
                        length: float | None = None,
                        width: float = DEFAULT_WIDTH) -> np.ndarray:
    """(Nz, Nr) boolean mask of boundary nodes for a RowDirichletBC location."""
    zmin, zmax = z.min(), z.max()
    rmin, rmax = r.min(), r.max()
    zmid, rmid = 0.5 * (zmin + zmax), 0.5 * (rmin + rmax)

    def outer(zt, c_ax, c_ctr):
        # edge along constant z = zt, clipped in r around c_ctr
        return np.outer(_close(z, zt, width), _centred(r, c_ctr, length))

    if location == "left":
        return np.outer(_close(z, zmin, width), _centred(r, rmid, length))
    if location == "right":
        return np.outer(_close(z, zmax, width), _centred(r, rmid, length))
    if location == "bottom":
        return np.outer(_centred(z, zmid, length), _close(r, rmin, width))
    if location == "top":
        return np.outer(_centred(z, zmid, length), _close(r, rmax, width))
    if location == "outer":
        m = structured_row_mask(z, r, "left", length=length, width=width)
        for loc in ("right", "bottom", "top"):
            m = m | structured_row_mask(z, r, loc, length=length, width=width)
        return m
    if location == "x":
        if coord is None:
            raise ValueError("coord required for location='x'")
        # NOTE: the reference defaults the clipping center of an 'x' line to
        # the *z* midpoint even though clipping runs along r (bc.py:47-48);
        # every driver passes center explicitly so the quirk is replicated
        # verbatim for parity.
        ctr = zmid if center is None else center
        return np.outer(_close(z, float(coord), width), _centred(r, ctr, length))
    if location == "y":
        if coord is None:
            raise ValueError("coord required for location='y'")
        ctr = rmid if center is None else center
        return np.outer(_centred(z, ctr, length), _close(r, float(coord), width))
    raise ValueError(f"unknown BC location {location!r}")


def node_row_mask(nodes: np.ndarray, location: str, *,
                  coord: float | None = None, center: float | None = None,
                  length: float | None = None,
                  width: float = DEFAULT_WIDTH) -> np.ndarray:
    """(N,) boolean mask over arbitrary (z, r) node arrays — the unstructured
    counterpart of :func:`structured_row_mask`, matching RowDirichletBC's
    geometric predicates verbatim (ref bc.py:56-101)."""
    z, r = nodes[:, 0], nodes[:, 1]
    zmin, zmax = z.min(), z.max()
    rmin, rmax = r.min(), r.max()
    zmid, rmid = 0.5 * (zmin + zmax), 0.5 * (rmin + rmax)

    if location == "left":
        return _close(z, zmin, width) & _centred(r, rmid, length)
    if location == "right":
        return _close(z, zmax, width) & _centred(r, rmid, length)
    if location == "bottom":
        return _close(r, rmin, width) & _centred(z, zmid, length)
    if location == "top":
        return _close(r, rmax, width) & _centred(z, zmid, length)
    if location == "outer":
        out = np.zeros(len(nodes), bool)
        for loc in ("left", "right", "bottom", "top"):
            out |= node_row_mask(nodes, loc, length=length, width=width)
        return out
    if location == "x":
        if coord is None:
            raise ValueError("coord required for location='x'")
        ctr = zmid if center is None else center  # reference quirk, bc.py:47
        return _close(z, float(coord), width) & _centred(r, ctr, length)
    if location == "y":
        if coord is None:
            raise ValueError("coord required for location='y'")
        ctr = rmid if center is None else center
        return _close(r, float(coord), width) & _centred(z, ctr, length)
    raise ValueError(f"unknown BC location {location!r}")


@dataclass
class HeatingCurve:
    """Experimental heating trace driving the laser boundary condition.

    CSV schema: columns 'time' and 'temp' (plus optional 'oside' used by the
    analysis layer), ref run_no_diamond.py:204-224. Rows are sorted by time
    and non-numeric entries dropped, matching the reference's cleaning.
    """

    time: np.ndarray
    temp: np.ndarray
    oside: np.ndarray | None = None

    @classmethod
    def from_csv(cls, path: str) -> "HeatingCurve":
        df = pd.read_csv(path)
        for col in ("time", "temp"):
            if col not in df.columns:
                raise ValueError(
                    f"Heating CSV {path} must contain a '{col}' column")
        df = (df.assign(time=pd.to_numeric(df["time"], errors="coerce"),
                        temp=pd.to_numeric(df["temp"], errors="coerce"))
                .dropna(subset=["time", "temp"])
                .sort_values("time")
                .reset_index(drop=True))
        oside = None
        if "oside" in df.columns:
            oside = pd.to_numeric(df["oside"], errors="coerce").to_numpy(float)
        return cls(time=df["time"].to_numpy(float),
                   temp=df["temp"].to_numpy(float), oside=oside)

    def amplitude_offset(self, ic_temp: float) -> float:
        """offset = temp[0] - ic so heating starts at the initial condition
        (ref run_no_diamond.py:299-301)."""
        return float(self.temp[0]) - float(ic_temp)


def gaussian_coeff(fwhm):
    """-4 ln2 / FWHM² (ref run_no_diamond.py:304)."""
    return -4.0 * np.log(2.0) / (fwhm ** 2)


def describe_row_bcs(masks: dict[str, np.ndarray], nodes: np.ndarray, *,
                     label: str = "Row BC") -> list[str]:
    """Print coordinate bounds for each named BC mask — the debugging helper
    of ref bc.py:152-174. ``masks``: name -> (N,) or (Nz, Nr) boolean;
    ``nodes``: (N, 2) coordinates (or None entries are skipped)."""
    lines = []
    for k, (name, mask) in enumerate(masks.items()):
        flat = np.asarray(mask).ravel()
        sel = nodes[flat.astype(bool)]
        if sel.size == 0:
            line = f"{label} #{k} ({name}): no DOFs"
        else:
            line = (f"{label} #{k} ({name}): "
                    f"x in [{sel[:, 0].min():.3e}, {sel[:, 0].max():.3e}]  "
                    f"y in [{sel[:, 1].min():.3e}, {sel[:, 1].max():.3e}]  "
                    f"(n = {len(sel)} DOFs)")
        print(line)
        lines.append(line)
    return lines
