"""End-to-end physical-units chain: synthetic frames -> OfflinePIV with
real scale/dt -> saved [4,R,C] binaries -> tpiv pressure -> Pascals.

Unit conversions (mm/px scale, us dt, the image->physical flip) are each
tested locally; these pin the WHOLE chain against analytic physics: a
solid-body rotation must reconstruct p = rho * Omega^2 * r^2 / 2 in Pa.
The saved-contract test is near machine precision; the full-pipeline test
bounds the recovered scale (PIV gradient noise squares into the Poisson
source, so ~15-20% amplitude error is physics — any UNITS slip would be
a factor >= 20).
"""
import os

import numpy as np
import pytest

from torchpiv_tpu.io.decode import imwrite_gray
from torchpiv_tpu.utils.persistence import save_binary
from torchpiv_tpu.utils.synthetic import particle_pair

SCALE, DT = 0.05, 200.0  # mm/px, us
OMEGA_PX = 0.012  # rad/frame


def _expected_pressure(x_mm, y_mm, rho):
    omega_phys = OMEGA_PX / (DT * 1e-6)  # 1/s
    xm = (x_mm - x_mm.mean()) / 1000.0
    ym = (y_mm - y_mm.mean()) / 1000.0
    pe = rho * omega_phys**2 * (xm**2 + ym**2) / 2
    return pe - pe.mean()


def test_pressure_units_on_saved_contract_fields():
    """Analytic rotation written exactly as the pipeline tail saves it
    (u flipped, v negated+flipped, x/y in mm, u/v in m/s): the recovered
    pressure must match rho*Omega^2*r^2/2 in Pa to <1%."""
    from torchpiv_tpu.ops.geometry import get_coordinates
    from torchpiv_tpu.stats import pressure_poisson

    H = W = 512
    x_px, y_px = get_coordinates((H, W), 32, 16)
    cx, cy = (W - 1) / 2, (H - 1) / 2
    k = SCALE / DT * 1000.0  # px/frame -> m/s
    u_img = -OMEGA_PX * (y_px - cy) * k
    v_img = OMEGA_PX * (x_px - cx) * k
    u = np.flip(u_img, axis=0)
    v = -np.flip(v_img, axis=0)
    x_mm, y_mm = x_px * SCALE, y_px * SCALE
    dx = (x_mm[0, 1] - x_mm[0, 0]) / 1000.0
    dy = (y_mm[1, 0] - y_mm[0, 0]) / 1000.0
    rho = 998.0
    p = pressure_poisson(u, v, dx, dy, rho=rho)
    pe = _expected_pressure(x_mm, y_mm, rho)
    assert np.abs(p - pe).max() < 0.01 * np.abs(pe).max()


@pytest.mark.slow
def test_pressure_scale_through_real_pipeline(tmp_path):
    from torchpiv_tpu.cli import main as cli_main
    from torchpiv_tpu.pipeline import OfflinePIV

    H = W = 512
    cx, cy = (W - 1) / 2, (H - 1) / 2

    def rotation(xs, ys):
        return -OMEGA_PX * (ys - cy), OMEGA_PX * (xs - cx)

    folder = str(tmp_path / "frames")
    os.makedirs(folder)
    fa, fb = particle_pair((H, W), displacement=rotation,
                           seed=60, density=0.03)
    imwrite_gray(os.path.join(folder, "p0_a.bmp"), fa)
    imwrite_gray(os.path.join(folder, "p0_b.bmp"), fb)

    piv = OfflinePIV(folder, device="cpu", file_fmt=".bmp",
                     wind_size=64, overlap=32, multipass=2,
                     scale=SCALE, dt=DT)
    out_fields = str(tmp_path / "fields")
    for i, (x, y, u, v) in enumerate(piv()):
        save_binary(f"pair_{i}.npy", out_fields,
                    {"x": x, "y": y, "u": u, "v": v})

    rho = 998.0
    out = str(tmp_path / "p")
    assert cli_main(["pressure", out_fields, "--rho", str(rho),
                     "--out", out]) == 0
    arr = np.load(os.path.join(out, "pressure_0000.npy"))
    x_mm, y_mm, p = arr[0], arr[1], arr[2]
    pe = _expected_pressure(x_mm, y_mm, rho)

    inner = np.zeros(p.shape, dtype=bool)
    inner[3:-3, 3:-3] = True
    pz = p - p[inner].mean()
    pez = pe - pe[inner].mean()
    fit = float((pz[inner] * pez[inner]).sum() / (pez[inner]**2).sum())
    # measurement-noise territory, but any unit slip (1000x mm/m, 1e6x
    # us/s, rho) or flip error would leave this range by decades
    assert 0.7 < fit < 1.4, fit
    corr = np.corrcoef(pz[inner], pez[inner])[0, 1]
    assert corr > 0.8, corr  # raw (unsmoothed) fields; structure matches
