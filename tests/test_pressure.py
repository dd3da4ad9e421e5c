"""Pressure reconstruction (stats/pressure.py) against analytic flows.

Quadratic-pressure flows (solid-body rotation, stagnation) are exact for
the second-order discretisation — recovered to machine precision — while
Taylor-Green pins the O(h^2) convergence of the general path.
"""
import numpy as np
import pytest

from torchpiv_tpu.stats.pressure import (
    mean_pressure_rans,
    pressure_from_stack,
    pressure_poisson,
    solve_poisson_neumann,
)


def _grid(r, c, dx, dy):
    x = (np.arange(c) + 0.5) * dx - c * dx / 2
    y = (np.arange(r) + 0.5) * dy - r * dy / 2
    return np.meshgrid(x, y)


def test_solid_body_rotation_exact():
    dx, dy = 0.013, 0.011
    X, Y = _grid(40, 56, dx, dy)
    om, rho = 3.7, 1.2
    p = pressure_poisson(-om * Y, om * X, dx, dy, rho=rho)
    pe = rho * om**2 * (X**2 + Y**2) / 2
    pe -= pe.mean()
    assert np.abs(p - pe).max() < 1e-10


def test_stagnation_flow_exact():
    dx, dy = 0.02, 0.02
    X, Y = _grid(32, 32, dx, dy)
    a, rho = 2.1, 998.0
    p = pressure_poisson(a * X, -a * Y, dx, dy, rho=rho)
    pe = -rho * a**2 * (X**2 + Y**2) / 2
    pe -= pe.mean()
    assert np.abs(p - pe).max() < 1e-8 * np.abs(pe).max()


def test_taylor_green_second_order():
    rho = 1.2
    errs = []
    for n in (48, 96):
        dx, dy = np.pi / n, np.pi / n
        x = (np.arange(n) + 0.5) * dx
        X, Y = np.meshgrid(x, x)
        u = np.sin(X) * np.cos(Y)
        v = -np.cos(X) * np.sin(Y)
        p = pressure_poisson(u, v, dx, dy, rho=rho)
        pe = rho / 4 * (np.cos(2 * X) + np.cos(2 * Y))
        pe -= pe.mean()
        errs.append(np.abs(p - pe).max())
    assert errs[1] < 1e-3  # small at production-like resolution
    assert errs[1] < errs[0] / 3  # ~O(h^2) convergence


def test_unsteady_uniform_acceleration():
    # u = a*t (spatially uniform): dp/dx = -rho*a, p linear — exact.
    dx, dy = 0.01, 0.01
    X, Y = _grid(24, 30, dx, dy)
    a, rho, dt = 5.0, 1.0, 1e-3
    u_stack = np.stack([np.full_like(X, a * dt * i) for i in range(4)])
    v_stack = np.zeros_like(u_stack)
    p = pressure_from_stack(u_stack, v_stack, dt, dx, dy, rho=rho)
    pe = -rho * a * X
    pe -= pe.mean()
    for i in range(4):
        assert np.abs(p[i] - pe).max() < 1e-9


def test_decaying_taylor_green_unsteady_viscous():
    # u = sin x cos y e^{-2 nu t}: the unsteady and viscous boundary terms
    # cancel exactly in NS; pressure is the steady TG form times e^{-4 nu t}.
    rho, nu, dt, n = 1.0, 0.05, 0.02, 64
    dx = dy = np.pi / n
    x = (np.arange(n) + 0.5) * dx
    X, Y = np.meshgrid(x, x)
    ts = np.arange(5) * dt
    u_stack = np.stack([np.sin(X) * np.cos(Y) * np.exp(-2 * nu * t)
                        for t in ts])
    v_stack = np.stack([-np.cos(X) * np.sin(Y) * np.exp(-2 * nu * t)
                        for t in ts])
    p = pressure_from_stack(u_stack, v_stack, dt, dx, dy, rho=rho, nu=nu)
    i = 2  # interior snapshot: central time differences
    pe = rho / 4 * (np.cos(2 * X) + np.cos(2 * Y)) * np.exp(-4 * nu * ts[i])
    pe -= pe.mean()
    assert np.abs(p[i] - pe).max() < 2e-3 * np.abs(pe).max()


def test_rans_mean_pressure_from_stresses():
    # U = V = 0, uu = alpha x^2, vv = beta y^2: P = -rho(alpha x^2 + beta y^2).
    dx, dy = 0.015, 0.02
    X, Y = _grid(36, 28, dx, dy)
    alpha, beta, rho = 1.4, 0.6, 1.2
    P = mean_pressure_rans(np.zeros_like(X), np.zeros_like(X),
                           alpha * X**2, beta * Y**2, np.zeros_like(X),
                           dx, dy, rho=rho)
    Pe = -rho * (alpha * X**2 + beta * Y**2)
    Pe -= Pe.mean()
    assert np.abs(P - Pe).max() < 1e-8 * np.abs(Pe).max()


def test_nan_stragglers_tolerated():
    dx = dy = 0.01
    X, Y = _grid(32, 32, dx, dy)
    om = 2.0
    u, v = -om * Y, om * X
    u[5, 7] = np.nan
    v[20, 3] = np.nan
    p = pressure_poisson(u, v, dx, dy)
    assert np.isfinite(p).all()
    pe = om**2 * (X**2 + Y**2) / 2
    pe -= pe.mean()
    # localised error only
    assert np.abs(p - pe).mean() < 0.05 * np.abs(pe).max()


def _write_pair_files(folder, n, field_fn, r=24, c=32, dx_mm=2.0, dy_mm=2.5,
                      y_descending=False):
    import os
    os.makedirs(folder, exist_ok=True)
    x_mm = (np.arange(c) + 0.5) * dx_mm - c * dx_mm / 2
    y_mm = (np.arange(r) + 0.5) * dy_mm - r * dy_mm / 2
    if y_descending:
        y_mm = y_mm[::-1]
    X, Y = np.meshgrid(x_mm, y_mm)
    for i in range(n):
        u, v = field_fn(X / 1000.0, Y / 1000.0, i)
        np.save(os.path.join(folder, f"f{i:03d}_pair.npy"),
                np.stack([X, Y, u, v]))
    return X, Y


def test_cli_pressure_snapshot_and_mean(tmp_path):
    from torchpiv_tpu.cli import main as cli_main

    om = 4.0

    def rot(Xm, Ym, i):
        return -om * Ym, om * Xm

    folder = str(tmp_path / "fields")
    X, Y = _write_pair_files(folder, 3, rot)
    out = str(tmp_path / "out")
    assert cli_main(["pressure", folder, "--rho", "998", "--out", out]) == 0
    arr = np.load(str(tmp_path / "out" / "pressure_0000.npy"))
    assert arr.shape == (3,) + X.shape
    pe = 998.0 * om**2 * ((X / 1000)**2 + (Y / 1000)**2) / 2
    pe -= pe.mean()
    assert np.abs(arr[2] - pe).max() < 1e-6 * np.abs(pe).max()

    out2 = str(tmp_path / "out2")
    assert cli_main(["pressure", folder, "--mode", "mean",
                     "--rho", "998", "--out", out2]) == 0
    arr = np.load(str(tmp_path / "out2" / "pressure_mean.npy"))
    assert np.abs(arr[2] - pe).max() < 1e-6 * np.abs(pe).max()


def test_cli_pressure_single_file_folder(tmp_path):
    """A folder holding exactly one saved pair must work in the default
    steady mode (only the unsteady term needs >= 2 snapshots)."""
    from torchpiv_tpu.cli import main as cli_main

    om = 2.5

    def rot(Xm, Ym, i):
        return -om * Ym, om * Xm

    folder = str(tmp_path / "fields")
    X, Y = _write_pair_files(folder, 1, rot)
    out = str(tmp_path / "out")
    assert cli_main(["pressure", folder, "--rho", "1.0",
                     "--out", out]) == 0
    arr = np.load(str(tmp_path / "out" / "pressure_0000.npy"))
    pe = om**2 * ((X / 1000)**2 + (Y / 1000)**2) / 2
    pe -= pe.mean()
    assert np.abs(arr[2] - pe).max() < 1e-6 * np.abs(pe).max()


def test_cli_pressure_descending_y_and_single_file(tmp_path):
    """Saved tables may carry y descending with the row index; the solver
    must see ascending axes and the output must be restored to file order."""
    from torchpiv_tpu.cli import main as cli_main

    a = 3.0

    def stag(Xm, Ym, i):
        return a * Xm, -a * Ym

    folder = str(tmp_path / "fields")
    X, Y = _write_pair_files(folder, 1, stag, y_descending=True)
    f = str(tmp_path / "fields" / "f000_pair.npy")
    out = str(tmp_path / "out")
    assert cli_main(["pressure", f, "--rho", "1.2", "--out", out]) == 0
    arr = np.load(str(tmp_path / "out" / "pressure_0000.npy"))
    pe = -1.2 * a**2 * ((X / 1000)**2 + (Y / 1000)**2) / 2
    pe -= pe.mean()
    assert np.abs(arr[2] - pe).max() < 1e-6 * np.abs(pe).max()


def test_solver_gauge_and_validation():
    p = solve_poisson_neumann(np.zeros((8, 8)), 1.0, 1.0)
    assert np.abs(p).max() < 1e-12
    with pytest.raises(ValueError):
        solve_poisson_neumann(np.zeros((1, 8)), 1.0, 1.0)
    with pytest.raises(ValueError):
        pressure_poisson(np.zeros((4, 4)), np.zeros((4, 5)))
    with pytest.raises(ValueError):
        pressure_from_stack(np.zeros((1, 4, 4)), np.zeros((1, 4, 4)), 1.0)
