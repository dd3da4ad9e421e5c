"""Turbulence scales (stats/turbulence.py) against closed-form cases."""
import numpy as np

from torchpiv_tpu.stats.turbulence import (
    dissipation_direct,
    integral_length_scale,
    kolmogorov_scales,
    taylor_microscale,
    taylor_reynolds,
    turbulence_report,
    turbulent_kinetic_energy,
)


def _grid(r=40, c=48, dx=0.002, dy=0.002):
    x = np.arange(c) * dx
    y = np.arange(r) * dy
    return np.meshgrid(x, y), dx, dy


def test_dissipation_pure_shear_closed_form():
    # u' = gamma*y, v' = 0: only (u_y + v_x)^2 survives -> eps = 3 nu gamma^2
    (X, Y), dx, dy = _grid()
    gamma, nu = 8.0, 1e-6
    eps = dissipation_direct(gamma * Y, np.zeros_like(Y), nu, dx, dy)
    assert abs(eps - 3.0 * nu * gamma**2) < 1e-9 * 3.0 * nu * gamma**2


def test_dissipation_solid_rotation_is_zero():
    (X, Y), dx, dy = _grid()
    om, nu = 5.0, 1e-6
    eps = dissipation_direct(-om * Y, om * X, nu, dx, dy)
    assert abs(eps) < 1e-12


def test_dissipation_mean_removed():
    # a constant-in-time mean shear must NOT count as dissipation
    (X, Y), dx, dy = _grid()
    rng = np.random.default_rng(3)
    base = 10.0 * Y
    u = np.stack([base + 1e-3 * rng.standard_normal(Y.shape)
                  for _ in range(6)])
    v = 1e-3 * rng.standard_normal(u.shape)
    eps = dissipation_direct(u, v, 1e-6, dx, dy)
    eps_with_mean = dissipation_direct(u[0], v[0], 1e-6, dx, dy)
    assert eps < 0.05 * eps_with_mean


def test_tke_isotropic_substitution():
    uu = np.full((4, 4), 2.0)
    vv = np.full((4, 4), 4.0)
    k = turbulent_kinetic_energy(uu, vv)
    assert np.allclose(k, 0.5 * (2 + 4 + 3))  # ww = (uu+vv)/2 = 3
    k2 = turbulent_kinetic_energy(uu, vv, ww=np.full((4, 4), 6.0))
    assert np.allclose(k2, 6.0)


def test_kolmogorov_and_taylor_formulas():
    nu, eps = 1e-6, 1e-4
    s = kolmogorov_scales(eps, nu)
    assert abs(s["eta"] - (nu**3 / eps) ** 0.25) < 1e-15
    assert abs(s["tau_eta"] - (nu / eps) ** 0.5) < 1e-15
    assert abs(s["u_eta"] - (nu * eps) ** 0.25) < 1e-15
    u_rms = 0.05
    lam = taylor_microscale(u_rms, eps, nu)
    assert abs(lam - np.sqrt(15 * nu * u_rms**2 / eps)) < 1e-12
    assert abs(taylor_reynolds(u_rms, eps, nu) - u_rms * lam / nu) < 1e-9
    assert kolmogorov_scales(0.0, nu)["eta"] == np.inf


def test_integral_length_cosine_correlation():
    # u(x) = cos(kx): rho(r) = cos(kr) (long record), integral to the
    # first zero crossing = 1/k.
    dx = 0.01
    x = np.arange(512) * dx
    k = 2 * np.pi / 0.8  # wavelength 0.8
    u = np.tile(np.cos(k * x), (6, 1))  # 6 identical rows, single snapshot
    L = integral_length_scale(u, dx)
    assert abs(L - 1.0 / k) < 0.05 / k


def test_cli_turbulence(tmp_path):
    import os

    from torchpiv_tpu.cli import main as cli_main

    rng = np.random.default_rng(5)
    (X, Y), dx, dy = _grid()
    folder = str(tmp_path / "fields")
    os.makedirs(folder)
    x_mm, y_mm = X * 1000, Y * 1000
    for i in range(5):
        u = 0.1 * rng.standard_normal(Y.shape)
        v = 0.1 * rng.standard_normal(Y.shape)
        np.save(os.path.join(folder, f"f{i:03d}_pair.npy"),
                np.stack([x_mm, y_mm, u, v]))
    out = str(tmp_path / "out")
    assert cli_main(["turbulence", folder, "--nu", "1.5e-5",
                     "--out", out]) == 0
    assert os.path.exists(os.path.join(out, "turbulence_report.txt"))


def test_turbulence_report_keys_and_resolution():
    rng = np.random.default_rng(11)
    (X, Y), dx, dy = _grid()
    u = 0.1 * rng.standard_normal((8,) + Y.shape)
    v = 0.1 * rng.standard_normal((8,) + Y.shape)
    rep = turbulence_report(u, v, nu=1e-6, dx=dx, dy=dy)
    for key in ("tke", "u_rms", "dissipation", "eta", "tau_eta",
                "taylor_microscale", "re_lambda", "integral_length",
                "resolution_dx_over_eta"):
        assert key in rep and np.isfinite(rep[key]), key
    assert rep["tke"] > 0 and rep["dissipation"] > 0
    assert rep["resolution_dx_over_eta"] > 0
