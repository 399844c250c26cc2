"""Checkpoint/resume: a split run (N steps, checkpoint, N more) must match a
continuous 2N-step run."""

import numpy as np
import pytest

from heatflow_tpu.geometry import build_layout, coupler_watcher_points
from heatflow_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from heatflow_tpu.io.runmeta import save_params
from heatflow_tpu.mesh.structured import build_structured_mesh
from heatflow_tpu.sim.bc import HeatingCurve
from heatflow_tpu.sim.problem import build_problem
from heatflow_tpu.sim.stepper import run_transient
from tests.fixtures import synthetic_heating, tiny_no_diamond_cfg


def _make_problem(num_steps):
    cfg = tiny_no_diamond_cfg(coarse=3.0)
    cfg["timing"]["num_steps"] = num_steps
    cfg["timing"]["t_final"] = 7.5e-6 * num_steps / 8  # keep dt constant
    df = synthetic_heating()
    heating = HeatingCurve(time=df["time"].to_numpy(),
                           temp=df["temp"].to_numpy())
    domain, mats = build_layout(cfg)
    mesh = build_structured_mesh(domain, mats)
    return build_problem(mesh, heating, cfg,
                         watcher_points=coupler_watcher_points(cfg))


def test_resume_matches_continuous(tmp_path):
    p8 = _make_problem(8)
    full = run_transient(p8, rtol=1e-13, record_gradient=False)

    p4 = _make_problem(4)
    first = run_transient(p4, rtol=1e-13, record_gradient=False)
    ck = save_checkpoint(str(tmp_path), first.final_u,
                         float(first.times[-1]), step=4)
    u0, t0, step, _ = load_checkpoint(ck)
    assert step == 4
    second = run_transient(p4, rtol=1e-13, record_gradient=False,
                           u0=u0, t0=t0)

    np.testing.assert_allclose(second.times, full.times[4:], rtol=1e-12)
    scale = np.abs(full.watcher).max()
    assert np.abs(np.concatenate([first.watcher, second.watcher])
                  - full.watcher).max() / scale < 1e-9


def test_save_params(tmp_path):
    path = save_params(str(tmp_path), {"dt": 1.5e-7, "solver": "cg"})
    text = open(path).read()
    assert "dt = 1.5e-07" in text and "solver = cg" in text
