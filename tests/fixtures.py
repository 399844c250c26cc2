"""Shared test fixtures: a small reference-schema config and heating data."""

from __future__ import annotations

import numpy as np
import pandas as pd


def tiny_no_diamond_cfg(*, coarse: float = 1.0) -> dict:
    """A scaled-down 5-material stack (reference-schema config) that meshes
    to a few thousand nodes so numerical tests stay fast. Values follow the
    physical ballpark of cfgs/geballe_no_diamond.yaml with much coarser mesh
    sizes and smaller radial extents."""
    return {
        "heating": {"fwhm": 6.0e-6, "ic_temp": 300.0},
        "timing": {"t_final": 7.5e-6, "num_steps": 12},
        "mats": {
            "p_ins": {"rho": 4131, "cv": 668, "k": 10, "z": 3.2e-6,
                      "r": 6e-6, "mesh": 0.4e-6 * coarse},
            "p_coupler": {"rho": 26504, "cv": 130, "k": 352, "z": 0.8e-7,
                          "r": 6e-6, "mesh": 0.4e-7 * coarse},
            "p_sample": {"rho": 5164, "cv": 1158, "k": 3.8, "z": 1.84e-6,
                         "r": 6e-6, "mesh": 0.3e-6 * coarse},
            "o_coupler": {"rho": 26504, "cv": 130, "k": 352, "z": 0.8e-7,
                          "r": 6e-6, "mesh": 0.4e-7 * coarse},
            "o_ins": {"rho": 4131, "cv": 668, "k": 10, "z": 6.3e-6,
                      "r": 6e-6, "mesh": 0.5e-6 * coarse},
        },
        "io": {"mesh_path": "meshes/test"},
        "material_tags": {},
    }


def synthetic_heating(path=None, n: int = 40) -> pd.DataFrame:
    """A smooth synthetic laser pulse trace with the reference CSV schema
    (time, temp, oside)."""
    t = np.linspace(3.0e-7, 7.5e-6, n)
    temp = 2100 + 1500 * np.exp(-((t - 2.5e-6) / 1.2e-6) ** 2)
    oside = 2400 + 600 * np.exp(-((t - 3.2e-6) / 1.5e-6) ** 2)
    df = pd.DataFrame({"time": t, "temp": temp, "oside": oside})
    if path is not None:
        df.to_csv(path, index=False)
    return df
