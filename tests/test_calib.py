"""Camera calibration + stereo reconstruction: fit synthetic pinhole-like
cameras with the Soloff polynomial model, then recover known 3-component
displacements from the two projected pixel-displacement fields."""
import numpy as np
import pytest

from torchpiv_tpu.calib import CameraMapping, dewarp_field, stereo_reconstruct


def _pinhole(theta_deg, scale=12.0, cx=640.0, cy=480.0, dist=0.0):
    """Synthetic camera: rotate about the y axis by theta, weak perspective
    + optional quadratic distortion (exercises the polynomial's job)."""
    th = np.radians(theta_deg)

    def proj(x, y, z):
        xr = np.cos(th) * x + np.sin(th) * z
        zr = -np.sin(th) * x + np.cos(th) * z
        X = cx + scale * xr * (1 - 1e-3 * zr) + dist * 1e-4 * (xr**2 + y**2)
        Y = cy + scale * y * (1 - 1e-3 * zr)
        return X, Y

    return proj


def _calib_points(proj):
    """Dot target at three z planes."""
    g = np.linspace(-20, 20, 9)
    xs, ys, zs = np.meshgrid(g, g, [-2.0, 0.0, 2.0], indexing="ij")
    world = np.stack([xs.ravel(), ys.ravel(), zs.ravel()], axis=1)
    X, Y = proj(world[:, 0], world[:, 1], world[:, 2])
    return world, np.stack([X, Y], axis=1)


@pytest.fixture(scope="module")
def cams():
    p1 = _pinhole(+30.0, dist=1.0)
    p2 = _pinhole(-30.0, dist=-0.5)
    m1 = CameraMapping.fit(*_calib_points(p1))
    m2 = CameraMapping.fit(*_calib_points(p2))
    return (p1, m1), (p2, m2)


def test_mapping_fit_accuracy(cams):
    (p1, m1), _ = cams
    g = np.linspace(-18, 18, 7)
    x, y = np.meshgrid(g, g)
    X, Y = m1.project(x, y, 0.5)
    Xt, Yt = p1(x, y, 0.5)
    assert np.abs(X - Xt).max() < 1e-3
    assert np.abs(Y - Yt).max() < 1e-3


def test_jacobian_matches_finite_difference(cams):
    (_, m1), _ = cams
    x, y, z = 3.0, -5.0, 0.0
    J = m1.jacobian(x, y, z)
    eps = 1e-4
    for col, dp in enumerate(np.eye(3) * eps):
        Xp, Yp = m1.project(x + dp[0], y + dp[1], z + dp[2])
        Xm, Ym = m1.project(x - dp[0], y - dp[1], z - dp[2])
        np.testing.assert_allclose(J[0, col], (Xp - Xm) / (2 * eps), rtol=1e-4)
        np.testing.assert_allclose(J[1, col], (Yp - Ym) / (2 * eps), rtol=1e-4)


def test_dewarp_recovers_world_displacement(cams):
    (p1, m1), _ = cams
    g = np.linspace(-15, 15, 11)
    x, y = np.meshgrid(g, g)
    dx_true = 0.08 * np.ones_like(x)
    dy_true = -0.05 + 0.001 * x
    X0, Y0 = p1(x, y, 0.0)
    X1, Y1 = p1(x + dx_true, y + dy_true, 0.0)
    dx, dy = dewarp_field(m1, x, y, X1 - X0, Y1 - Y0)
    assert np.abs(dx - dx_true).max() < 1e-3
    assert np.abs(dy - dy_true).max() < 1e-3


def test_stereo_reconstructs_three_components(cams):
    (p1, m1), (p2, m2) = cams
    g = np.linspace(-15, 15, 11)
    x, y = np.meshgrid(g, g)
    dx_t = 0.06 * np.ones_like(x)
    dy_t = -0.04 + 0.001 * y
    dz_t = 0.03 * np.sin(x / 10.0)  # out-of-plane: invisible to one camera

    def pixel_disp(proj):
        X0, Y0 = proj(x, y, 0.0)
        X1, Y1 = proj(x + dx_t, y + dy_t, dz_t)
        return X1 - X0, Y1 - Y0

    dx, dy, dz, rms = stereo_reconstruct(
        m1, m2, x, y, pixel_disp(p1), pixel_disp(p2))
    assert np.abs(dx - dx_t).max() < 2e-3
    assert np.abs(dy - dy_t).max() < 2e-3
    assert np.abs(dz - dz_t).max() < 2e-3
    assert rms.max() < 0.05  # px: linearisation error only


def test_single_plane_calibration_still_dewarpes(cams):
    """Single-z-plane fit: z terms zeroed, in-plane dewarp still works."""
    (p1, _), _ = cams
    g = np.linspace(-20, 20, 9)
    xs, ys = np.meshgrid(g, g, indexing="ij")
    world = np.stack([xs.ravel(), ys.ravel(), np.zeros(xs.size)], axis=1)
    X, Y = p1(world[:, 0], world[:, 1], world[:, 2])
    m = CameraMapping.fit(world, np.stack([X, Y], axis=1))
    x, y = np.meshgrid(np.linspace(-15, 15, 5), np.linspace(-15, 15, 5))
    X0, Y0 = p1(x, y, 0.0)
    X1, Y1 = p1(x + 0.1, y - 0.07, 0.0)
    dx, dy = dewarp_field(m, x, y, X1 - X0, Y1 - Y0)
    assert np.abs(dx - 0.1).max() < 1e-3
    assert np.abs(dy + 0.07).max() < 1e-3


def test_fit_validates_shapes():
    with pytest.raises(ValueError):
        CameraMapping.fit(np.zeros((5, 2)), np.zeros((5, 2)))
    with pytest.raises(ValueError):
        CameraMapping.fit(np.zeros((5, 3)), np.zeros((4, 2)))
