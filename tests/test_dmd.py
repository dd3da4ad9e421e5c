"""Dynamic mode decomposition (stats/dmd.py) against planted dynamics.

Exactly-low-rank sequences are recovered to machine precision (exact DMD
is an eigensolve, not a fit, when the data obey linear dynamics); noisy
stationary oscillations pin the practical rank-truncated path.
"""
import numpy as np
import pytest

from torchpiv_tpu.stats.dmd import compute_dmd

# The all-invalid-point mean is sum/count (never nanmean of an empty
# slice) — pin it: any reintroduced empty-slice RuntimeWarning fails.
pytestmark = pytest.mark.filterwarnings("error::RuntimeWarning")


def _wave_stack(n=40, r=20, c=30, dt=0.01, f=12.0, sigma=0.0, mean=0.0):
    x = np.linspace(0, 2 * np.pi, c)
    y = np.linspace(0, 2 * np.pi, r)
    X, Y = np.meshgrid(x, y)
    ts = np.arange(n) * dt
    u = np.stack([mean + np.cos(X - 2 * np.pi * f * t) * np.exp(sigma * t)
                  for t in ts])
    v = np.stack([0.7 * np.sin(Y + 2 * np.pi * f * t) * np.exp(sigma * t)
                  for t in ts])
    return u, v


def _dominant(d, f_min=1.0):
    idx = [i for i, fr in enumerate(d.frequencies) if fr > f_min]
    assert idx, f"no positive-frequency mode above {f_min} Hz"
    i = max(idx, key=lambda i: abs(d.amplitudes[i]))
    return d.frequencies[i], d.growth_rates[i]


def test_growing_wave_exact_without_mean_subtraction():
    dt, f, sigma = 0.01, 12.0, 3.0
    u, v = _wave_stack(dt=dt, f=f, sigma=sigma)
    d = compute_dmd(u, v, dt=dt, subtract_mean=False)
    fr, gr = _dominant(d)
    assert abs(fr - f) < 1e-9
    assert abs(gr - sigma) < 1e-9
    ur, vr = d.reconstruct(10)
    assert np.abs(ur - u[10]).max() < 1e-10 * np.abs(u[10]).max()
    assert np.abs(vr - v[10]).max() < 1e-10


def test_stationary_wave_with_mean_subtraction():
    # neutral oscillation over whole periods: temporal mean ~ steady part,
    # the default fluctuation DMD recovers the frequency.
    dt, f = 0.0025, 20.0  # 40 samples = 2 periods exactly
    u, v = _wave_stack(n=40, dt=dt, f=f, sigma=0.0, mean=1.5)
    d = compute_dmd(u, v, dt=dt)
    fr, gr = _dominant(d)
    assert abs(fr - f) < 1e-6
    assert abs(gr) < 1e-6
    # the steady part went into the mean, not a mode
    assert np.abs(d.mean_u - 1.5).max() < 1e-9


def test_noisy_oscillation_rank_truncated():
    rng = np.random.default_rng(7)
    dt, f = 0.0025, 20.0
    u, v = _wave_stack(n=80, dt=dt, f=f)
    u = u + 0.05 * rng.standard_normal(u.shape)
    v = v + 0.05 * rng.standard_normal(v.shape)
    d = compute_dmd(u, v, dt=dt, rank=6)
    fr, gr = _dominant(d)
    assert abs(fr - f) < 0.5
    assert abs(gr) < 2.0  # near-neutral despite noise


def test_nan_and_mask_tolerated():
    dt, f = 0.0025, 20.0
    u, v = _wave_stack(n=40, dt=dt, f=f)
    u[3, 5, 5] = np.nan
    mask = np.zeros(u.shape[1:], dtype=bool)
    mask[0, 0] = True
    d = compute_dmd(u, v, dt=dt, mask=mask)
    fr, _ = _dominant(d)
    assert abs(fr - f) < 0.5
    assert np.isfinite(d.modes_u).all()


def test_cli_dmd(tmp_path):
    import os

    from torchpiv_tpu.cli import main as cli_main
    from torchpiv_tpu.utils.persistence import load_table

    dt, f = 0.0025, 20.0
    u, v = _wave_stack(n=24, dt=dt, f=f)
    X, Y = np.meshgrid(np.arange(u.shape[2], dtype=float),
                       np.arange(u.shape[1], dtype=float))
    folder = str(tmp_path / "fields")
    os.makedirs(folder)
    for i in range(u.shape[0]):
        np.save(os.path.join(folder, f"f{i:03d}_pair.npy"),
                np.stack([X, Y, u[i], v[i]]))
    out = str(tmp_path / "out")
    assert cli_main(["dmd", folder, "--fs", str(1 / dt), "--rank", "4",
                     "--modes", "2", "--out", out]) == 0
    spec = load_table(os.path.join(out, "dmd_spectrum.txt"))
    fr = spec["f[Hz]"]
    amp = spec["amp[1]"]
    dom = fr.ravel()[np.argmax(np.where(fr.ravel() > 1, amp.ravel(), 0))]
    assert abs(dom - f) < 0.5
    mode_files = [p for p in os.listdir(out) if p.startswith("dmd_mode")]
    assert len(mode_files) >= 1


def test_validation_errors():
    with pytest.raises(ValueError):
        compute_dmd(np.zeros((2, 4, 4)), np.zeros((2, 4, 4)))
    with pytest.raises(ValueError):
        compute_dmd(np.zeros((5, 4, 4)), np.zeros((5, 4, 5)))
    with pytest.raises(ValueError):
        compute_dmd(np.zeros((5, 4, 4)), np.zeros((5, 4, 4)))  # all-zero
