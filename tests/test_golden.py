"""Golden-trace regression: any change to assembly, BCs, solver or sampling
that shifts results beyond solver tolerance fails here."""

import os

import numpy as np
import pytest

from heatflow_tpu.geometry import build_layout, coupler_watcher_points
from heatflow_tpu.mesh.structured import build_structured_mesh
from heatflow_tpu.sim.bc import HeatingCurve
from heatflow_tpu.sim.problem import build_problem
from heatflow_tpu.sim.stepper import run_transient
from tests.fixtures import synthetic_heating, tiny_no_diamond_cfg

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "tiny_no_diamond_f64.npz")


@pytest.fixture(scope="module")
def result():
    cfg = tiny_no_diamond_cfg(coarse=2.0)
    df = synthetic_heating()
    heating = HeatingCurve(time=df["time"].to_numpy(),
                           temp=df["temp"].to_numpy())
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    problem = build_problem(mesh, heating, cfg,
                            watcher_points=coupler_watcher_points(cfg))
    return run_transient(problem, rtol=1e-13)


def test_watcher_traces_golden(result):
    g = np.load(GOLDEN)
    np.testing.assert_allclose(result.times, g["times"], rtol=1e-14)
    scale = np.abs(g["watcher"]).max()
    assert np.abs(result.watcher - g["watcher"]).max() / scale < 1e-9


def test_gradient_rows_golden(result):
    g = np.load(GOLDEN)
    np.testing.assert_allclose(result.band_centers, g["band_centers"],
                               rtol=1e-14)
    np.testing.assert_allclose(result.axis_z, g["axis_z"], rtol=1e-14)
    bscale = np.abs(g["band"]).max()
    assert np.abs(result.band_rows - g["band"]).max() / bscale < 1e-6
    ascale = np.abs(g["axis"]).max()
    assert np.abs(result.axis_rows - g["axis"]).max() / ascale < 1e-6
