"""Simulation configuration handling.

The YAML schema is compatible with the reference framework's configs
(``cfgs/*.yaml`` in cebarker1000/heatflow):

.. code-block:: yaml

    mats:
      <name>: {rho: float, cv: float, k: float, r: float, z: float, mesh: float}
    heating:
      file: path/to/heating.csv     # columns: time, temp [, oside]
      fwhm: float                   # laser FWHM [m]
      ic_temp: float                # initial / far-field temperature [K]
    timing:
      t_final: float                # total simulated time [s]
      num_steps: int
    io:
      mesh_path: str                # vestigial in the reference; kept for parity
    material_tags: {}               # populated into mesh_cfg.yaml copies

(ref schema usage: run_no_diamond.py:62-76,204-224,256-262)
"""

from __future__ import annotations

import copy
import os
from typing import Any

import yaml

REQUIRED_MAT_KEYS = ("rho", "cv", "k", "r", "z", "mesh")


class ConfigError(ValueError):
    """Raised when a configuration file is malformed."""


def load_config(path: str | os.PathLike) -> dict:
    """Load a YAML simulation config, returning a plain dict (reference-compatible)."""
    with open(path, "r") as f:
        cfg = yaml.safe_load(f)
    if not isinstance(cfg, dict):
        raise ConfigError(f"{path}: top level must be a mapping")
    return cfg


# libyaml's C dumper when available (~10x faster than the pure-Python
# emitter — the sweep driver writes one used_config.yaml per run, and the
# single-core host's yaml time was ~0.7 s of a 6 s B=128 recording batch);
# output is the same YAML documents
_DUMPER = getattr(yaml, "CSafeDumper", yaml.SafeDumper)


def save_config(cfg: dict, path: str | os.PathLike) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        yaml.dump(cfg, f, Dumper=_DUMPER, default_flow_style=False)


def mat_float(cfg: dict, mat: str, key: str) -> float:
    """Fetch ``cfg['mats'][mat][key]`` as float with a helpful error."""
    try:
        return float(cfg["mats"][mat][key])
    except KeyError as e:
        raise ConfigError(f"config missing mats.{mat}.{key}") from e
    except (TypeError, ValueError) as e:
        raise ConfigError(f"config mats.{mat}.{key} is not a number: "
                          f"{cfg['mats'][mat].get(key)!r}") from e


def validate_config(cfg: dict, *, require_heating_file: bool = False) -> None:
    """Validate the schema pieces every driver needs.

    The reference validates lazily (crashes at float() time); we check up
    front but accept the same schema.
    """
    if "mats" not in cfg or not isinstance(cfg["mats"], dict) or not cfg["mats"]:
        raise ConfigError("config must define a non-empty 'mats' mapping")
    for name, mat in cfg["mats"].items():
        if not isinstance(mat, dict):
            raise ConfigError(f"mats.{name} must be a mapping")
        # explicit-bounds (custom layout) materials carry their geometry in
        # 'bounds' instead of the stack parameters r/z (geometry.layout_custom)
        required = (("rho", "cv", "k", "mesh") if "bounds" in mat
                    else REQUIRED_MAT_KEYS)
        if "bounds" in mat:
            if (not isinstance(mat["bounds"], (list, tuple))
                    or len(mat["bounds"]) != 4):
                raise ConfigError(
                    f"mats.{name}.bounds must be [zmin, zmax, rmin, rmax]")
        for k in required:
            if k not in mat:
                raise ConfigError(f"mats.{name} missing key '{k}'")
            try:
                float(mat[k])
            except (TypeError, ValueError):
                raise ConfigError(
                    f"mats.{name}.{k} is not a number: {mat[k]!r}")
    for section, keys in (("heating", ("fwhm", "ic_temp")),
                          ("timing", ("t_final", "num_steps"))):
        if section not in cfg:
            raise ConfigError(f"config missing '{section}' section")
        for k in keys:
            if k not in cfg[section]:
                raise ConfigError(f"config missing {section}.{k}")
    if require_heating_file and "file" not in cfg["heating"]:
        raise ConfigError("config missing heating.file")


def with_parameters(cfg: dict, *, fwhm: float | None = None,
                    sample_k: float | None = None,
                    sample_z: float | None = None) -> dict:
    """Return a deep copy of ``cfg`` with sweep parameters substituted.

    Mirrors the reference sweep's config mutation
    (ref: parameter_sweep.py:238-266) but never mutates the input.
    """
    out = copy.deepcopy(cfg)
    if fwhm is not None:
        out["heating"]["fwhm"] = float(fwhm)
    if sample_k is not None:
        out["mats"]["p_sample"]["k"] = float(sample_k)
    if sample_z is not None:
        out["mats"]["p_sample"]["z"] = float(sample_z)
    return out


def timing(cfg: dict) -> tuple[float, int, float]:
    """Return (t_final, num_steps, dt)."""
    t_final = float(cfg["timing"]["t_final"])
    num_steps = int(cfg["timing"]["num_steps"])
    return t_final, num_steps, t_final / num_steps


def config_equal(a: Any, b: Any) -> bool:
    """Structural equality useful for mesh-reuse decisions."""
    return yaml.safe_dump(a, sort_keys=True) == yaml.safe_dump(b, sort_keys=True)
