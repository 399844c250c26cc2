"""Free-form (custom) material layouts: explicit per-material bounds in the
config — the YAML form of the reference's raw Material API that its
notebooks use for IR-absorber stacks (ref mesh_and_materials/materials.py:
16-34; with_ir_steady.ipynb / clean_with_ir.ipynb geometry cells)."""

import copy

import numpy as np
import pytest

from heatflow_tpu.config import ConfigError, validate_config
from heatflow_tpu.geometry import build_layout, heating_line, layout_custom
from heatflow_tpu.mesh.structured import build_structured_mesh
from heatflow_tpu.sim.bc import HeatingCurve
from heatflow_tpu.sim.problem import build_problem
from heatflow_tpu.sim.stepper import run_transient

from tests.fixtures import synthetic_heating, tiny_no_diamond_cfg


def _custom_from_canonical(cfg):
    """Rewrite a canonical stack config into explicit-bounds form."""
    domain, mats = build_layout(cfg)
    out = copy.deepcopy(cfg)
    for m in mats:
        mat = out["mats"][m.name]
        mat.pop("r"), mat.pop("z")
        mat["bounds"] = list(m.bounds)
    # the canonical heating line, stated explicitly
    coord, length = heating_line(cfg, mats)
    out["heating"]["z"] = float(coord)
    out["heating"]["r_max"] = float(length / 2.0)
    return out


def test_custom_layout_matches_canonical(tmp_path):
    cfg = tiny_no_diamond_cfg(coarse=2.0)
    heat_csv = tmp_path / "heat.csv"
    synthetic_heating(heat_csv)
    cfg["heating"]["file"] = str(heat_csv)
    ccfg = _custom_from_canonical(cfg)
    validate_config(ccfg)

    dom_a, mats_a = build_layout(cfg)
    dom_b, mats_b = build_layout(ccfg)          # auto-detects custom
    # the canonical layout's *nominal* domain rmax can exceed the meshed
    # union (geometry.layout_no_diamond docstring); the meshes must agree
    assert [m.bounds for m in mats_a] == [m.bounds for m in mats_b]

    heating = HeatingCurve.from_csv(str(heat_csv))
    mesh_a = build_structured_mesh(dom_a, mats_a)
    mesh_b = build_structured_mesh(dom_b, mats_b)
    np.testing.assert_array_equal(mesh_a.z, mesh_b.z)
    np.testing.assert_array_equal(mesh_a.r, mesh_b.r)
    pa = build_problem(mesh_a, heating, cfg)
    pb = build_problem(mesh_b, heating, ccfg)
    assert np.array_equal(pa.dirichlet_mask, pb.dirichlet_mask)
    assert np.array_equal(pa.heat_mask, pb.heat_mask)

    ra = run_transient(pa, rtol=1e-10, record_gradient=False)
    rb = run_transient(pb, rtol=1e-10, record_gradient=False)
    np.testing.assert_allclose(rb.final_u, ra.final_u, rtol=0, atol=1e-12)


def _ir_stack_cfg(heat_csv):
    """A with_ir-style free-form stack: insulator / coupler / sample with an
    embedded IR-absorber layer / sample / insulator (six rects, one of which
    the canonical layouts cannot express)."""
    um = 1e-6
    mats = {
        "p_ins": {"rho": 4131, "cv": 668, "k": 10, "mesh": 0.4 * um,
                  "bounds": [-4.0 * um, -1.0 * um, 0.0, 6.0 * um]},
        "p_coupler": {"rho": 26504, "cv": 130, "k": 352, "mesh": 0.1 * um,
                      "bounds": [-1.0 * um, -0.9 * um, 0.0, 6.0 * um]},
        "sample_left": {"rho": 5164, "cv": 1158, "k": 3.8, "mesh": 0.3 * um,
                        "bounds": [-0.9 * um, 0.0, 0.0, 6.0 * um]},
        "ir_absorber": {"rho": 19300, "cv": 132, "k": 310, "mesh": 0.1 * um,
                        "bounds": [0.0, 0.2 * um, 0.0, 6.0 * um]},
        "sample_right": {"rho": 5164, "cv": 1158, "k": 3.8, "mesh": 0.3 * um,
                         "bounds": [0.2 * um, 1.1 * um, 0.0, 6.0 * um]},
        "o_ins": {"rho": 4131, "cv": 668, "k": 10, "mesh": 0.5 * um,
                  "bounds": [1.1 * um, 4.1 * um, 0.0, 6.0 * um]},
    }
    return {
        "mats": mats,
        "heating": {"fwhm": 6.0e-6, "ic_temp": 300.0, "file": str(heat_csv),
                    "z": -1.0 * um, "r_max": 5.0 * um},
        "timing": {"t_final": 7.5e-6, "num_steps": 10},
        "io": {"mesh_path": "meshes/ir"},
    }


def test_ir_stack_transient_and_steady(tmp_path):
    heat_csv = tmp_path / "heat.csv"
    synthetic_heating(heat_csv)
    cfg = _ir_stack_cfg(heat_csv)
    validate_config(cfg, require_heating_file=True)

    domain, mats = build_layout(cfg)
    assert [m.name for m in mats][3] == "ir_absorber"
    mesh = build_structured_mesh(domain, mats)
    heating = HeatingCurve.from_csv(str(heat_csv))
    problem = build_problem(mesh, heating, cfg,
                            watcher_points={"mid": (0.1e-6, 0.0)})

    # heating line sits at the configured z, clipped to r <= r_max
    zi = int(np.argmin(np.abs(mesh.z - (-1.0e-6))))
    assert problem.heat_mask[zi].any()
    assert not problem.heat_mask[zi, mesh.r > 5.0e-6 + 1e-12].any()

    res = run_transient(problem, rtol=1e-10, record_gradient=False)
    assert np.all(np.isfinite(res.final_u))
    # the pulse reached the watcher inside the IR layer (peak of the trace;
    # the final value may undershoot the IC — consistent-mass P1 ringing)
    assert res.watcher.max() > 320.0

    # steady solve on the same stack feeds the transient as its IC
    # (the notebooks' steady-as-IC workflow, with_gasket.ipynb cells 15-18)
    from heatflow_tpu.sim.steady import solve_steady, steady_heating_values
    u_ss, info = solve_steady(problem,
                              steady_heating_values(problem, amplitude=900.0))
    assert info["converged"] and np.all(np.isfinite(u_ss))
    res2 = run_transient(problem, rtol=1e-10, record_gradient=False,
                         u0=u_ss)
    assert np.all(np.isfinite(res2.final_u))


def test_custom_layout_validation_errors(tmp_path):
    heat_csv = tmp_path / "heat.csv"
    synthetic_heating(heat_csv)
    cfg = _ir_stack_cfg(heat_csv)

    bad = copy.deepcopy(cfg)
    bad["mats"]["p_ins"]["bounds"] = [0.0, 1.0, 0.0]   # 3 entries
    with pytest.raises(ConfigError):
        validate_config(bad)

    bad = copy.deepcopy(cfg)
    del bad["mats"]["p_ins"]["bounds"]                 # neither bounds nor r/z
    with pytest.raises(ConfigError):
        validate_config(bad)

    # layout_custom requires bounds on every material
    with pytest.raises(ValueError):
        layout_custom(bad)

    # without p_coupler, heating.z is mandatory
    bad = copy.deepcopy(cfg)
    del bad["heating"]["z"]
    del bad["mats"]["p_coupler"]
    with pytest.raises(ValueError):
        domain, mats = build_layout(bad)
        from heatflow_tpu.mesh.structured import build_structured_mesh as bm
        build_problem(bm(domain, mats), HeatingCurve.from_csv(str(heat_csv)),
                      bad)
