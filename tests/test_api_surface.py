"""Direct tests for public API pieces previously covered only indirectly
(or not at all) — config round-trips, CSV round-trips, element integrals
vs numerical quadrature, BC description, single-step stepper, mesh
perturbation invariants, Konopkova conversion, steady driver, plots."""

import os

import jax.numpy as jnp
import matplotlib
import numpy as np
import pandas as pd
import pytest

matplotlib.use("Agg")

from heatflow_tpu.config import (config_equal, load_config, mat_float,
                                 save_config)
from tests.fixtures import synthetic_heating, tiny_no_diamond_cfg


def test_config_roundtrip_and_helpers(tmp_path):
    cfg = tiny_no_diamond_cfg()
    p = tmp_path / "cfg.yaml"
    save_config(cfg, p)
    back = load_config(p)
    assert config_equal(cfg, back)
    assert mat_float(cfg, "p_sample", "k") == float(cfg["mats"]["p_sample"]["k"])
    from heatflow_tpu.config import ConfigError
    with pytest.raises(ConfigError, match="p_sample.nope"):
        mat_float(cfg, "p_sample", "nope")
    assert not config_equal(cfg, {**cfg, "extra": 1})


def test_watcher_csv_roundtrip(tmp_path):
    from heatflow_tpu.io.csvio import read_watcher_csv, write_watcher_csv
    t = np.linspace(0, 1e-6, 5)
    pside = np.linspace(300, 800, 5)
    path = str(tmp_path / "w.csv")
    write_watcher_csv(path, t, {"pside": pside, "oside": pside * 0.5})
    df = read_watcher_csv(path)
    assert list(df.columns) == ["time", "pside", "oside"]
    np.testing.assert_allclose(df["pside"], pside)


def test_element_integrals_match_quadrature():
    """Closed-form P1 integrals equal brute-force numerical quadrature on a
    random triangle (the correctness root of the whole operator layer)."""
    from heatflow_tpu.ops.p1 import (interval_load, tri_load, tri_load_rw,
                                     tri_stiffness)
    rng = np.random.default_rng(3)
    coords = rng.uniform(0.0, 2.0, (3, 2))

    # centroid quadrature over all n² sub-triangles (lower + upper)
    n = 120
    pts = []
    for i in range(n):
        for j in range(n - i):
            pts.append(((i + 1 / 3) / n, (j + 1 / 3) / n))     # lower
            if i + j <= n - 2:
                pts.append(((i + 2 / 3) / n, (j + 2 / 3) / n))  # upper
    l12 = np.array(pts)
    lam = np.c_[l12, 1.0 - l12.sum(1)]       # (Q, 3) barycentric
    xy = lam @ coords                        # (Q, 2)
    v1, v2 = coords[1] - coords[0], coords[2] - coords[0]
    area = 0.5 * abs(v1[0] * v2[1] - v1[1] * v2[0])
    w = np.full(len(lam), area / (n * n))    # each sub-triangle: A/n²

    load_q = (lam * w[:, None]).sum(0)
    np.testing.assert_allclose(tri_load(coords[None])[0], load_q, rtol=1e-3)

    r = xy[:, 1]
    load_rw_q = (lam * (w * r)[:, None]).sum(0)
    np.testing.assert_allclose(tri_load_rw(coords[None])[0], load_rw_q,
                               rtol=1e-3)

    # stiffness: gradients constant → quadrature trivial; compare vs exact
    K = tri_stiffness(coords[None])[0]
    assert np.allclose(K, K.T) and abs(K.sum()) < 1e-12
    assert np.all(np.diag(K) > 0)

    # interval_load takes element LENGTHS: ∫ φ_a dz = h/2 per vertex
    np.testing.assert_allclose(interval_load(np.array([0.5])),
                               [[0.25, 0.25]])


def test_describe_row_bcs_reports_bounds():
    from heatflow_tpu.sim.bc import describe_row_bcs
    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 2.0]])
    masks = {"left": np.array([True, False, False]),
             "empty": np.zeros(3, bool)}
    lines = describe_row_bcs(masks, nodes)
    assert len(lines) == 2
    assert "left" in lines[0] and "no DOFs" in lines[1]


def test_make_step_fn_matches_run_transient():
    """The single-step entry (used by the compile-check driver) reproduces
    the first scan step of the full stepper."""
    from heatflow_tpu.geometry import build_layout
    from heatflow_tpu.mesh.structured import build_structured_mesh
    from heatflow_tpu.sim.bc import HeatingCurve
    from heatflow_tpu.sim.problem import build_problem
    from heatflow_tpu.sim.stepper import make_simulate_fn, make_step_fn

    cfg = tiny_no_diamond_cfg(coarse=3.0)
    cfg["timing"]["num_steps"] = 1
    df = synthetic_heating()
    heating = HeatingCurve(time=df["time"].to_numpy(),
                           temp=df["temp"].to_numpy())
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    problem = build_problem(mesh, heating, cfg)

    step = make_step_fn(problem, dtype=jnp.float64, fixed_iters=200)
    nz, nr = mesh.shape
    u0 = jnp.full((nz, nr), problem.ic_temp, jnp.float64)
    u1 = np.asarray(step(u0, jnp.float64(problem.dt)))

    fn = make_simulate_fn(problem, dtype=jnp.float64, rtol=1e-13,
                          record_gradient=False)
    ref = np.asarray(fn()["final_u"])
    np.testing.assert_allclose(u1, ref, rtol=1e-9,
                               atol=1e-9 * np.abs(ref).max())


def test_perturb_structured_mesh_invariants():
    """Perturbation keeps boundary/interface nodes on their lines and all
    triangles positively oriented."""
    from heatflow_tpu.geometry import build_layout
    from heatflow_tpu.mesh.structured import build_structured_mesh
    from heatflow_tpu.mesh.unstructured_gen import perturb_structured_mesh

    cfg = tiny_no_diamond_cfg(coarse=2.0)
    domain, mats = build_layout(cfg)
    smesh = build_structured_mesh(domain, mats)
    umesh = perturb_structured_mesh(smesh, jitter=0.25, seed=1)
    z, r = umesh.nodes[:, 0], umesh.nodes[:, 1]
    assert z.min() >= smesh.z.min() - 1e-15
    assert z.max() <= smesh.z.max() + 1e-15
    a, b, c = (umesh.nodes[umesh.cells[:, k]] for k in range(3))
    cross = ((b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
             - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]))
    assert (np.abs(cross) > 0).all()


def test_konopkova_conversion(tmp_path):
    from heatflow_tpu.analysis.konopkova import (convert_konopkova,
                                                 load_xy_csv)
    p = tmp_path / "pside.csv"
    o = tmp_path / "oside.csv"
    np.savetxt(p, np.c_[np.linspace(0, 2, 8), np.linspace(2.0, 3.0, 8)],
               delimiter=",")
    np.savetxt(o, np.c_[np.linspace(0, 2, 6), np.linspace(1.9, 2.4, 6)],
               delimiter=",")
    x, y = load_xy_csv(str(p))
    assert (np.diff(x) > 0).all() and len(x) == 8
    out = tmp_path / "heat.csv"
    df = convert_konopkova(str(p), str(o), str(out))
    back = pd.read_csv(out)
    assert {"time", "temp", "oside"} <= set(back.columns)
    assert back["temp"].iloc[0] == pytest.approx(2000.0)   # kK → K
    assert back["time"].max() == pytest.approx(2e-6)       # µs → s


def test_run_steady_driver(tmp_path):
    from heatflow_tpu.drivers.steady import run_steady

    cfg = tiny_no_diamond_cfg(coarse=3.0)
    heat_csv = tmp_path / "heat.csv"
    synthetic_heating(heat_csv)
    cfg["heating"]["file"] = str(heat_csv)
    out = run_steady(cfg, str(tmp_path / "mesh"), rebuild_mesh=True,
                     output_folder=str(tmp_path / "steady"),
                     write_xdmf=False, dtype=jnp.float64)
    u = np.asarray(out[0])
    assert np.isfinite(u).all()
    # the heated line exceeds the ambient edges in steady state
    assert u.max() > u.min()


def test_plot_temperature_curves_smoke(tmp_path):
    from heatflow_tpu.analysis.compare import plot_temperature_curves
    t = np.linspace(0, 1, 10)
    png = str(tmp_path / "cmp.png")
    plot_temperature_curves(t, np.sin(t), np.cos(t), 0.5 * np.sin(t),
                            0.5 * np.cos(t), exp_time=t, save_path=png,
                            show_plot=False)
    assert os.path.isfile(png) and os.path.getsize(png) > 0


def test_packaging_entry_points_resolve():
    """pyproject.toml console scripts point at real callables, and every
    example imports WITHOUT executing a simulation (round-3 weakness: the
    examples ran full runs at module import)."""
    import importlib
    import importlib.util
    import tomllib

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "pyproject.toml"), "rb") as f:
        proj = tomllib.load(f)
    scripts = proj["project"]["scripts"]
    assert len(scripts) >= 7
    for target in scripts.values():
        mod_name, func = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func)), target

    for name in ("no_diamond", "with_diamond", "no_diamond_1d",
                 "with_ir_steady", "radial_analysis"):
        path = os.path.join(root, "examples", f"{name}.py")
        spec = importlib.util.spec_from_file_location(f"_ex_{name}", path)
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)      # must be cheap: no sim at import
        assert callable(getattr(m, "main")), name
