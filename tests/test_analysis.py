"""Analysis layer: RMSE/normalization, radial plotter, split-normal fitting,
gradient diagnostics."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pandas as pd
import pytest

from heatflow_tpu.analysis.compare import calculate_rmse, normalized_traces
from heatflow_tpu.analysis.gradcheck import (analyze_gradient_data,
                                             test_source_term_magnitude as
                                             source_term_magnitude)
from heatflow_tpu.analysis.radial import RadialGradientPlotter
from heatflow_tpu.analysis.splitnormal import (
    analyze_split_normal_fits, analyze_split_normal_fits_amplitude_only,
    fit_split_normal_amplitude_only, fit_split_normal_to_profile,
    save_fitted_curves_csv, split_normal_function)
from heatflow_tpu.io.csvio import read_gradient_csv, write_gradient_csv


def test_calculate_rmse_matches_manual():
    exp_t = np.array([0.0, 1.0, 2.0])
    exp_d = np.array([0.0, 0.5, 1.0])
    sim_t = np.array([0.0, 2.0])
    sim_d = np.array([0.0, 1.0])
    # sim interpolated onto exp_t is exactly exp_d → rmse 0
    assert calculate_rmse(exp_t, exp_d, sim_t, sim_d) == pytest.approx(0.0)
    assert calculate_rmse(exp_t, exp_d + 1.0, sim_t, sim_d) == \
        pytest.approx(1.0)


def test_normalized_traces_reference_math():
    df_sim = pd.DataFrame({"pside": [300.0, 500.0, 400.0],
                           "oside": [300.0, 350.0, 380.0]})
    df_exp = pd.DataFrame({"temp": [2000.0, 3000.0, 2500.0],
                           "oside": [2400.0, 2600.0, 2500.0]})
    tr = normalized_traces(df_sim, df_exp, ic_temp=300.0)
    np.testing.assert_allclose(tr["sim_pside"], [0.0, 1.0, 0.5])
    # o-side normalized by the P-SIDE span (200)
    np.testing.assert_allclose(tr["sim_oside"], [0.0, 0.25, 0.4])
    np.testing.assert_allclose(tr["exp_pside"], [0.0, 1.0, 0.5])
    # shifted o-side: 300, 500, 400 → normalized by exp temp span (1000)
    np.testing.assert_allclose(tr["exp_oside"], [0.0, 0.2, 0.1])


@pytest.fixture
def gradient_csv(tmp_path):
    rng = np.random.default_rng(0)
    times = np.linspace(1e-7, 7.5e-6, 20)
    z = np.linspace(-4e-6, 7e-6, 40)
    amp = -2e6 * np.exp(-((times - 2e-6) / 1.5e-6) ** 2)
    rows = amp[:, None] * np.exp(-0.5 * ((z[None, :] + 1e-6) / 8e-7) ** 2) \
        + 100.0 + rng.standard_normal((20, 40)) * 50.0
    p = tmp_path / "radial_gradient.csv"
    write_gradient_csv(str(p), times, z, rows)
    return str(p), times, z, rows


def test_radial_plotter(gradient_csv, tmp_path):
    path, times, z, rows = gradient_csv
    pl = RadialGradientPlotter(path)
    np.testing.assert_allclose(pl.time_values, times)
    np.testing.assert_allclose(pl.radial_positions, z)
    s = pl.get_data_summary()
    assert s["num_time_points"] == 20
    assert s["peak_gradient"] == pytest.approx(rows.min(), rel=1e-12)
    fig, _ = pl.plot_gradient_evolution(time_indices=[0, 10],
                                        show_plot=False,
                                        save_path=str(tmp_path / "e.png"))
    fig, _ = pl.plot_heatmap(show_plot=False,
                             save_path=str(tmp_path / "h.png"))
    assert (tmp_path / "e.png").exists() and (tmp_path / "h.png").exists()


def test_split_normal_fit_recovers_parameters():
    r = np.linspace(-5e-6, 5e-6, 80)
    true = (-3e6, -1e-6, 1.2e-6, 2.5e-6, 150.0)
    y = split_normal_function(r, *true)
    params, err = fit_split_normal_to_profile(r, y)
    amp, c, sl, sr, off = params
    assert amp == pytest.approx(true[0], rel=1e-4)
    assert c == pytest.approx(true[1], rel=1e-3, abs=1e-9)
    assert sl == pytest.approx(true[2], rel=1e-3)
    assert sr == pytest.approx(true[3], rel=1e-3)
    assert off == pytest.approx(true[4], rel=1e-3, abs=1.0)
    assert err < 1e-1


def test_split_normal_fit_with_noise_and_nans():
    rng = np.random.default_rng(1)
    r = np.linspace(-5e-6, 5e-6, 60)
    y = split_normal_function(r, 2e6, 0.5e-6, 1e-6, 1.5e-6, -50.0)
    y = y + rng.standard_normal(60) * 1e4
    y[::13] = np.nan
    params, err = fit_split_normal_to_profile(r, y)
    assert params[0] == pytest.approx(2e6, rel=0.05)
    assert np.isfinite(err)


def test_maxerr_fit_is_true_minimax():
    """fit_method='maxerr' must beat the RMSE solution under the max-error
    metric on asymmetric profiles, and match-or-beat the reference's
    Powell implementation (scipy, ref gaussian_fit_analysis.py:91-96)."""
    from scipy.optimize import minimize
    rng = np.random.default_rng(4)
    wins = 0
    for trial in range(4):
        r = np.linspace(-5e-6, 5e-6, 70)
        true = (2e6 * (1 + trial), 0.3e-6, 0.8e-6, 2.6e-6, 40.0)
        y = split_normal_function(r, *true)
        # asymmetric, heavy-tailed perturbation so RMSE and minimax optima
        # genuinely differ
        y = y + 2e4 * np.sign(r - 1e-6) * (1 + np.abs(r) / 5e-6) \
            + rng.standard_normal(len(r)) * 5e3

        p_rmse, _ = fit_split_normal_to_profile(r, y, fit_method="rmse")
        p_mx, err_mx = fit_split_normal_to_profile(r, y,
                                                   fit_method="maxerr")
        maxerr_of = lambda p: float(np.max(np.abs(
            y - split_normal_function(r, *p))))
        assert err_mx == pytest.approx(maxerr_of(p_mx), rel=1e-12)
        assert err_mx <= maxerr_of(p_rmse) * (1 + 1e-9), \
            f"minimax worse than RMSE solution: {err_mx:.6e} vs " \
            f"{maxerr_of(p_rmse):.6e}"

        # the reference's Powell search from the same coarse initial guesses
        best_ref = np.inf
        amp0 = abs(y.max() - y.min())
        c0 = r[np.argmax(np.abs(y))]
        s0 = np.std(r) / 4
        for g in ([amp0, c0, s0, s0, y.min()],
                  [-amp0, c0, s0, s0, y.min()]):
            res = minimize(lambda p: np.max(np.abs(
                y - split_normal_function(r, *p))), g, method="Powell")
            best_ref = min(best_ref, float(res.fun))
        if err_mx <= best_ref * (1 + 1e-6):
            wins += 1
    assert wins >= 3, f"beat Powell on only {wins}/4 asymmetric profiles"


def test_analyze_fits_maxerr_mode(tmp_path):
    """Whole-series maxerr mode: every timestep's maxerr <= the rmse-mode
    solution's maxerr."""
    from heatflow_tpu.analysis.radial import RadialGradientPlotter
    from heatflow_tpu.io.csvio import write_gradient_csv
    r = np.linspace(-4e-6, 4e-6, 50)
    times = np.linspace(1e-7, 1e-6, 6)
    rows = np.stack([
        split_normal_function(r, -1e6 * (1 + t * 1e6), 0.2e-6,
                              0.9e-6, 2.0e-6, 30.0)
        + 1.5e4 * np.sign(r) for t in times])
    path = str(tmp_path / "grad.csv")
    write_gradient_csv(path, times, r, rows)
    pl = RadialGradientPlotter(path)
    res_m = analyze_split_normal_fits(pl, fit_method="maxerr")
    res_r = analyze_split_normal_fits(pl, fit_method="rmse")
    for i in range(len(times)):
        pm = [res_m[k][i] for k in ("amplitudes", "centers", "sigma_lefts",
                                    "sigma_rights", "offsets")]
        pr = [res_r[k][i] for k in ("amplitudes", "centers", "sigma_lefts",
                                    "sigma_rights", "offsets")]
        me_m = np.max(np.abs(rows[i] - split_normal_function(r, *pm)))
        me_r = np.max(np.abs(rows[i] - split_normal_function(r, *pr)))
        assert me_m <= me_r * (1 + 1e-9)
        assert res_m["rmse_values"][i] == pytest.approx(me_m, rel=1e-10)


def test_split_normal_too_few_points():
    params, err = fit_split_normal_to_profile(
        np.array([0.0, 1.0]), np.array([1.0, np.nan]))
    assert params == [0.0, 0.0, 1.0, 1.0, 0.0] and err == np.inf


def test_amplitude_only_closed_form():
    r = np.linspace(-4e-6, 4e-6, 50)
    shape = (0.0, 1e-6, 2e-6, 10.0)
    y = split_normal_function(r, -5e5, *shape[:3], shape[3])
    amp, rmse = fit_split_normal_amplitude_only(r, y, list(shape))
    assert amp == pytest.approx(-5e5, rel=1e-10)
    assert rmse == pytest.approx(0.0, abs=1e-6)


def test_analyze_all_timesteps_and_export(gradient_csv, tmp_path):
    path, times, z, rows = gradient_csv
    pl = RadialGradientPlotter(path)
    results = analyze_split_normal_fits(pl)
    assert len(results["amplitudes"]) == 20
    # the synthetic data IS a gaussian + noise: fits should be excellent at
    # high-amplitude timesteps
    peak = np.argmax(np.abs(results["amplitudes"]))
    assert results["r_squared_values"][peak] > 0.98

    amp_only = analyze_split_normal_fits_amplitude_only(
        pl, float(results["centers"].mean()),
        float(results["sigma_lefts"].mean()),
        float(results["sigma_rights"].mean()),
        float(results["offsets"].mean()))
    assert len(amp_only["amplitudes"]) == 20

    out = tmp_path / "gaussfit_full.csv"
    save_fitted_curves_csv(results, pl.radial_positions, str(out))
    t2, z2, v2 = read_gradient_csv(str(out))
    np.testing.assert_allclose(t2, times)
    np.testing.assert_allclose(z2, z)
    assert v2.shape == rows.shape


def test_gradcheck(gradient_csv):
    path, *_ = gradient_csv
    stats = analyze_gradient_data(path)
    assert stats["num_timesteps"] == 20
    assert stats["nonzero_fraction"] > 0.99
    st = source_term_magnitude(path)
    assert st["max_abs_source"] > 0


def test_fit_reporting_surface(gradient_csv, tmp_path):
    """Round-5 parity trio (ref gaussian_fit_analysis.py:282,356,382):
    save_fit_results CSV schema; comparison plots return fig/ax and save
    300-dpi PNGs."""
    import pandas as pd
    from heatflow_tpu.analysis.splitnormal import (
        plot_comparison_raw_vs_amp_only, plot_fit_comparison,
        save_fit_results)
    path, times, z, rows = gradient_csv
    pl = RadialGradientPlotter(path)
    results = analyze_split_normal_fits(pl)
    amp_only = analyze_split_normal_fits_amplitude_only(
        pl, float(results["centers"].mean()),
        float(results["sigma_lefts"].mean()),
        float(results["sigma_rights"].mean()),
        float(results["offsets"].mean()))

    res_csv = tmp_path / "fit_results.csv"
    save_fit_results(results, str(res_csv))
    df = pd.read_csv(res_csv)
    assert list(df.columns) == ["time", "amplitude", "center", "sigma_left",
                                "sigma_right", "offset", "rmse", "r_squared"]
    np.testing.assert_allclose(df["time"], times)
    np.testing.assert_allclose(df["amplitude"], results["amplitudes"])

    p1 = tmp_path / "cmp.png"
    fig, ax = plot_fit_comparison(pl, results, [0, 5, 10, 500],
                                  save_path=str(p1), show_plot=False)
    assert p1.exists() and p1.stat().st_size > 1000
    p2 = tmp_path / "raw_vs_amp.png"
    fig, ax = plot_comparison_raw_vs_amp_only(pl, results, amp_only,
                                              [0, 5, 10], save_path=str(p2),
                                              show_plot=False)
    assert p2.exists() and p2.stat().st_size > 1000


def test_splitnormal_cli_reference_flags(gradient_csv, tmp_path):
    """The reference's gaussian_fit_analysis.py command line runs unmodified
    modulo module path (ref :486-506): every flag accepted, every artifact
    written."""
    import pandas as pd
    from heatflow_tpu.analysis.splitnormal import main as sn_main
    path, times, z, rows = gradient_csv
    arts = {k: tmp_path / f"{k}.{ext}" for k, ext in
            (("results", "csv"), ("analysis", "png"), ("comparison", "png"),
             ("compare", "png"), ("full", "csv"), ("amp", "csv"))}
    sn_main([path, "--fit-method", "rmse",
             "--save-results", str(arts["results"]),
             "--save-analysis-plot", str(arts["analysis"]),
             "--save-comparison-plot", str(arts["comparison"]),
             "--time-indices", "0", "3", "7",
             "--compare-steps", "0", "10",
             "--save-compare-plot", str(arts["compare"]),
             "--save-fitted-csv-full", str(arts["full"]),
             "--save-fitted-csv-amp", str(arts["amp"]),
             "--no-show"])
    for k, f in arts.items():
        assert f.exists(), k
    t2, z2, v2 = read_gradient_csv(str(arts["full"]))
    np.testing.assert_allclose(t2, times)
    assert v2.shape == rows.shape
    t3, _z3, v3 = read_gradient_csv(str(arts["amp"]))
    assert v3.shape == rows.shape
    df = pd.read_csv(arts["results"])
    assert len(df) == len(times)


def test_radial_cli_reference_flags(gradient_csv, tmp_path):
    """plot_radial_gradient.py's CLI runs unmodified modulo module path
    (ref :236-251): --plot-type both, --time-indices, --figsize."""
    from heatflow_tpu.analysis.radial import main as radial_main
    path, *_ = gradient_csv
    ev, hm = tmp_path / "ev.png", tmp_path / "hm.png"
    radial_main([path, "--plot-type", "both",
                 "--time-indices", "0", "5", "10",
                 "--figsize", "10", "6",
                 "--save-evolution", str(ev),
                 "--save-heatmap", str(hm), "--no-show"])
    assert ev.exists() and hm.exists()
    # condensed aliases still work
    s = tmp_path / "alias.png"
    radial_main([path, "--heatmap", "--save", str(s), "--no-show"])
    assert s.exists()
