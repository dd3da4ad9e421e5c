"""Temporal analysis (stats/temporal.py): PSD normalisation and peak
location, autocorrelation / integral time scale against analytic AR(1),
convergence report, and the tpiv temporal CLI."""
import numpy as np
import pytest

from torchpiv_tpu.stats.temporal import (autocorrelation, convergence_report,
                                         integral_time_scale,
                                         load_pair_stack, probe_series,
                                         running_mean, welch_psd)


def test_probe_series_shapes_and_negative_index():
    u = np.arange(3 * 4 * 5, dtype=float).reshape(3, 4, 5)
    s = probe_series(u, u * 2, [(0, 0), (-1, -1)])
    assert s["u"].shape == (3, 2)
    np.testing.assert_array_equal(s["u"][:, 1], u[:, -1, -1])
    np.testing.assert_array_equal(s["v"], 2 * s["u"])
    with pytest.raises(ValueError):
        probe_series(u[0], u[0], [(0, 0)])


def test_welch_psd_parseval_and_peak():
    rng = np.random.default_rng(3)
    fs = 100.0
    t = np.arange(4096) / fs
    x = np.sin(2 * np.pi * 12.5 * t) + 0.3 * rng.normal(size=t.size)
    freqs, psd = welch_psd(x, fs=fs, nperseg=512)
    # peak at the driven frequency
    assert abs(freqs[np.argmax(psd)] - 12.5) < fs / 512 + 1e-9
    # Parseval: integrated PSD equals the variance (within estimator noise)
    var = np.var(x)
    assert abs(psd.sum() * (freqs[1] - freqs[0]) - var) / var < 0.1


def test_welch_psd_handles_nan_segments_and_columns():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1024, 2))
    x[100:110, 0] = np.nan  # kills the segments covering those rows only
    freqs, psd = welch_psd(x, nperseg=128)
    assert np.isfinite(psd).all()
    x[:, 1] = np.nan
    freqs, psd = welch_psd(x, nperseg=128)
    assert np.isfinite(psd[:, 0]).all() and np.isnan(psd[:, 1]).all()
    with pytest.raises(ValueError):
        welch_psd(np.full(64, np.nan), nperseg=32)
    with pytest.raises(ValueError):
        welch_psd(np.zeros(4))


def test_autocorrelation_and_integral_scale_ar1():
    """AR(1) with coefficient a has rho(k) = a^k and integral scale
    ~ sum a^k = 1/(1-a) (trapz to first zero crossing comes close)."""
    rng = np.random.default_rng(5)
    a = 0.8
    T = 200_000
    x = np.empty(T)
    x[0] = 0.0
    eps = rng.normal(size=T)
    for k in range(1, T):
        x[k] = a * x[k - 1] + eps[k]
    rho = autocorrelation(x, max_lag=50)
    np.testing.assert_allclose(rho[0], 1.0)
    np.testing.assert_allclose(rho[1:6], a ** np.arange(1, 6), atol=0.02)
    tis = integral_time_scale(x, fs=1.0)
    # analytic continuous-sum scale: 1/(1-a) = 5 minus the half-weighted
    # endpoints of the trapezoid; generous tolerance for estimator noise
    assert 3.0 < tis < 6.0


def test_running_mean_skips_nan():
    x = np.array([1.0, np.nan, 2.0, 3.0])
    rm = running_mean(x)
    np.testing.assert_allclose(rm, [1.0, 1.0, 1.5, 2.0])


def test_convergence_report_white_noise():
    rng = np.random.default_rng(6)
    u = 3.0 + 0.1 * rng.normal(size=(400, 6, 6))
    v = 0.1 * rng.normal(size=(400, 6, 6))
    rep = convergence_report(u, v, fs=10.0)
    assert rep["snapshots"] == 400
    # white noise: nearly every snapshot independent
    assert rep["effective_samples"] > 100
    assert rep["relative_sem"] < 0.01
    assert abs(rep["mean_speed"] - 3.0) < 0.1


def _write_stack(tmp_path, T=64, freq_frac=0.25):
    """Per-pair binaries with a sinusoidal u at the centre point."""
    from torchpiv_tpu.utils.persistence import save_binary

    x, y = np.meshgrid(np.arange(5.0), np.arange(6.0))
    for t in range(T):
        u = np.ones((6, 5)) * np.sin(2 * np.pi * freq_frac * t)
        v = np.zeros((6, 5))
        save_binary(f"pair_{t}.npy", str(tmp_path), {
            "x": x, "y": y, "u": u, "v": v})


def test_load_pair_stack_orders_naturally(tmp_path):
    _write_stack(tmp_path, T=12)
    stack = load_pair_stack(str(tmp_path))
    assert stack["u"].shape == (12, 6, 5)
    expect = np.sin(2 * np.pi * 0.25 * np.arange(12))
    np.testing.assert_allclose(stack["u"][:, 0, 0], expect, atol=1e-12)
    with pytest.raises(ValueError):
        load_pair_stack(str(tmp_path / "missing"))


def test_cli_temporal_end_to_end(tmp_path, capsys):
    import pandas as pd

    from torchpiv_tpu.cli import main

    _write_stack(tmp_path, T=64, freq_frac=0.25)
    out = tmp_path / "rep"
    rc = main(["temporal", str(tmp_path), "--fs", "8.0",
               "--point", "2,2", "--nperseg", "32",
               "--out", str(out)])
    assert rc == 0
    text = capsys.readouterr().out
    assert "snapshots" in text
    # 0.25 cycles/pair at fs=8 Hz -> 2 Hz dominant frequency
    assert "peak 2 Hz" in text or "peak 2.0" in text or "peak 2 " in text
    psd = pd.read_csv(str(out / "temporal_psd.txt"), sep=", ",
                      engine="python")
    assert any(k.startswith("psd_u_2_2") for k in psd.columns)
    fcol = psd["f[Hz]"].values
    pcol = psd[[c for c in psd.columns if c.startswith("psd_u")][0]].values
    assert abs(fcol[np.argmax(pcol)] - 2.0) < 0.3
    conv = pd.read_csv(str(out / "temporal_convergence.txt"), sep=", ",
                       engine="python")
    assert any(k.startswith("runmean_speed") for k in conv.columns)


def test_integral_time_scale_constant_series_is_zero():
    assert integral_time_scale(np.ones(100)) == 0.0


def test_phase_average_recovers_coherent_motion():
    """Phase-locked averaging pulls a planted oscillation out of noise
    (stats/temporal.py phase_from_probe + phase_average)."""
    rng = np.random.default_rng(31)
    T, R, C = 160, 12, 16
    f, fs = 7.0, 100.0
    t = np.arange(T) / fs
    shape = np.outer(np.hanning(R), np.hanning(C))
    amp = 2.0
    clean = amp * np.sin(2 * np.pi * f * t)[:, None, None] * shape[None]
    u = clean + rng.normal(0, 1.0, (T, R, C))
    v = 0.5 * clean + rng.normal(0, 1.0, (T, R, C))

    from torchpiv_tpu.stats.temporal import phase_average, phase_from_probe

    probe = u[:, R // 2, C // 2]
    phase = phase_from_probe(probe)
    centers, ua, va, counts = phase_average(u, v, phase, n_bins=8)
    assert counts.sum() == T and (counts > 0).all()
    # at the probe point the binned mean must follow amp*sin(phase)
    probe_avg = ua[:, R // 2, C // 2]
    expected = amp * shape[R // 2, C // 2] * np.sin(centers)
    # Hilbert phase has sin-vs-cos convention: allow a global phase shift
    best = min(np.abs(probe_avg - amp * shape[R // 2, C // 2]
                      * np.sin(centers + s)).max()
               for s in np.linspace(0, 2 * np.pi, 361))
    noise_floor = 1.0 / np.sqrt(counts.mean())
    assert best < 4 * noise_floor
    # coherent amplitude preserved (not averaged away)
    assert probe_avg.max() > 0.8 * amp * shape[R // 2, C // 2]


def test_phase_average_validation_and_empty_bins():
    from torchpiv_tpu.stats.temporal import phase_average, phase_from_probe

    u = np.zeros((6, 4, 4))
    with pytest.raises(ValueError):
        phase_average(u, u, np.zeros(5))
    with pytest.raises(ValueError):
        phase_average(u, u, np.zeros(6), n_bins=0)
    with pytest.raises(ValueError):
        phase_from_probe(np.zeros(3))
    # all snapshots in one bin -> other bins NaN with count 0
    centers, ua, va, counts = phase_average(u, u, np.zeros(6), n_bins=4)
    assert counts[0] == 6 and counts[1:].sum() == 0
    assert np.isfinite(ua[0]).all() and np.isnan(ua[1]).all()


def test_cli_temporal_phase_bins(tmp_path, capsys):
    import os

    from torchpiv_tpu.cli import main

    _write_stack(tmp_path, T=64, freq_frac=0.25)
    out = tmp_path / "rep"
    rc = main(["temporal", str(tmp_path), "--fs", "8.0",
               "--point", "2,2", "--phase-bins", "4",
               "--out", str(out)])
    assert rc == 0
    assert "phase average" in capsys.readouterr().out
    bins = [f for f in os.listdir(out) if f.startswith("phase_bin")]
    assert len(bins) == 4
    arr = np.load(str(out / "phase_bin0.npy"))
    assert arr.shape == (4, 6, 5) and np.isfinite(arr).all()
