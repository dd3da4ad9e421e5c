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


def test_save_load_roundtrip(cams, tmp_path):
    (_, m1), _ = cams
    p = str(tmp_path / "cam.npz")
    m1.save(p)
    m = CameraMapping.load(p)
    np.testing.assert_array_equal(m.coef_x, m1.coef_x)
    np.testing.assert_array_equal(m.coef_y, m1.coef_y)
    assert m.fit_rms_px == m1.fit_rms_px
    np.save(str(tmp_path / "junk.npy"), np.zeros(3))
    np.savez(str(tmp_path / "junk.npz"), coef_x=np.zeros(3))
    with pytest.raises(ValueError):
        CameraMapping.load(str(tmp_path / "junk.npz"))


def test_inverse_roundtrips_projection(cams):
    (_, m1), _ = cams
    g = np.linspace(-15, 15, 7)
    x, y = np.meshgrid(g, g)
    for z in (0.0, 1.0):
        X, Y = m1.project(x, y, z)
        xb, yb = m1.inverse(X, Y, z)
        assert np.abs(xb - x).max() < 1e-9
        assert np.abs(yb - y).max() < 1e-9


# ---------------------------------------------------------------- targets


def _render_dots(shape, pts, sigma=1.8, amp=220.0):
    """Synthetic calibration image: Gaussian dots at sub-pixel centres."""
    img = np.zeros(shape, np.float64)
    half = 7
    win = np.arange(-half, half + 1, dtype=np.float64)
    for X, Y in pts:
        xi, yi = int(round(X)), int(round(Y))
        if not (half <= xi < shape[1] - half and half <= yi < shape[0] - half):
            raise AssertionError("test dot out of frame")
        gx = np.exp(-((win + xi - X) ** 2) / (2 * sigma**2))
        gy = np.exp(-((win + yi - Y) ** 2) / (2 * sigma**2))
        img[yi - half:yi + half + 1, xi - half:xi + half + 1] += (
            amp * gy[:, None] * gx[None, :])
    return np.clip(img, 0, 255).astype(np.uint8)


def test_detect_dot_grid_and_fit(cams):
    from torchpiv_tpu.calib import detect_dot_grid

    (p1, _), _ = cams
    worlds, images = [], []
    for z in (-2.0, 0.0, 2.0):
        g = np.linspace(-16, 16, 9)
        wx, wy = np.meshgrid(g, g)
        X, Y = p1(wx.ravel(), wy.ravel(), z)
        frame = _render_dots((960, 1280), np.stack([X, Y], 1))
        w, im = detect_dot_grid(frame, spacing=4.0, z=z)
        assert len(im) == 81
        worlds.append(w)
        images.append(im)
    m = CameraMapping.fit(np.concatenate(worlds), np.concatenate(images))
    # detection noise only: the polynomial absorbs the camera model
    assert m.fit_rms_px < 0.1
    # the fitted mapping reproduces the true camera on the world frame the
    # detector defined (centred grid, 4.0 spacing)
    g = np.linspace(-12, 12, 5)
    x, y = np.meshgrid(g, g)
    X, Y = m.project(x, y, 1.0)
    Xt, Yt = p1(x, y, 1.0)
    assert np.abs(X - Xt).max() < 0.2
    assert np.abs(Y - Yt).max() < 0.2


def test_order_into_grid_rejects_ragged():
    from torchpiv_tpu.calib import order_into_grid

    g = np.arange(5, dtype=np.float64) * 10
    x, y = np.meshgrid(g, g)
    pts = np.stack([x.ravel(), y.ravel()], 1)[:-1]  # drop one corner dot
    with pytest.raises(ValueError, match="ragged"):
        order_into_grid(pts)


def test_detect_dots_invert():
    from torchpiv_tpu.calib import detect_dots

    pts = np.array([[20.0, 30.0], [60.0, 30.0], [20.0, 70.0], [60.0, 70.0]])
    frame = 255 - _render_dots((100, 100), pts)  # dark dots on white
    found = detect_dots(frame, invert=True)
    assert len(found) == 4
    found = found[np.lexsort((found[:, 0], found[:, 1]))]
    pts = pts[np.lexsort((pts[:, 0], pts[:, 1]))]
    assert np.abs(found - pts).max() < 0.1


# ----------------------------------------------------------- image dewarp


def test_dewarp_image_recovers_world_pattern(cams):
    from torchpiv_tpu.calib import dewarp_image, world_grid

    (p1, m1), _ = cams

    def world_pattern(x, y):  # smooth, so bilinear resampling is accurate
        return 100 + 60 * np.sin(x / 3.0) * np.cos(y / 4.0)

    # raw camera frame: intensity of the world point each pixel observes.
    # Newton-invert on a coarse pixel grid and linearly upsample the smooth
    # world-coordinate fields (full-frame inverse would dominate test time).
    from scipy.interpolate import RegularGridInterpolator

    xs = np.linspace(0.0, 1279.0, 161)
    ys = np.linspace(0.0, 959.0, 121)
    Xc, Yc = np.meshgrid(xs, ys)
    xwc, ywc = m1.inverse(Xc, Yc, 0.0)
    Xpx, Ypx = np.meshgrid(np.arange(1280, dtype=np.float64),
                           np.arange(960, dtype=np.float64))
    pix = np.stack([Ypx.ravel(), Xpx.ravel()], axis=1)
    xw = RegularGridInterpolator((ys, xs), xwc)(pix).reshape(960, 1280)
    yw = RegularGridInterpolator((ys, xs), ywc)(pix).reshape(960, 1280)
    frame = world_pattern(xw, yw).astype(np.float32)

    shape = (64, 64)
    out = dewarp_image(m1, frame, x0=-10.0, y0=-10.0, pitch=0.3,
                       shape=shape, z=0.0)
    xg, yg = world_grid(-10.0, -10.0, 0.3, shape)
    expect = world_pattern(xg, yg)
    assert np.abs(out - expect).max() < 0.5  # bilinear error on the pattern


# ------------------------------------------------- grid-level stereo (CLI core)


def _camera_px_piv_field(proj, mapping, x_px_1d, y_px_1d, disp):
    """What a raw-frame PIV run on this camera would output: for each
    vector-grid pixel position, the true pixel displacement of the world
    point it observes under the 3-D displacement field ``disp``."""
    Xg, Yg = np.meshgrid(x_px_1d, y_px_1d)
    xw, yw = mapping.inverse(Xg, Yg, 0.0)
    dx, dy, dz = disp(xw, yw)
    X1, Y1 = proj(xw + dx, yw + dy, dz)
    return {"x": Xg, "y": Yg, "u": X1 - Xg, "v": Y1 - Yg}


def test_reconstruct_from_grids_end_to_end(cams):
    from torchpiv_tpu.calib import reconstruct_from_grids

    (p1, m1), (p2, m2) = cams

    def disp(x, y):
        return (0.05 * np.ones_like(x),
                -0.03 + 0.001 * y,
                0.02 * np.sin(x / 8.0))

    f1 = _camera_px_piv_field(p1, m1, np.arange(460, 830, 16.0),
                              np.arange(300, 670, 16.0), disp)
    f2 = _camera_px_piv_field(p2, m2, np.arange(450, 840, 16.0),
                              np.arange(300, 670, 16.0), disp)
    res = reconstruct_from_grids(m1, m2, f1, f2, z=0.0)
    valid = np.isfinite(res["dz"])
    assert valid.mean() > 0.5  # a real overlap region
    dxt, dyt, dzt = disp(res["x"], res["y"])
    for got, want in ((res["dx"], dxt), (res["dy"], dyt), (res["dz"], dzt)):
        # interpolation of the pixel fields adds error beyond the pure
        # stereo solve; a few-milli-world-unit bound is ample for 0.05-unit
        # displacements
        assert np.nanmax(np.abs((got - want)[valid])) < 5e-3
    assert np.nanmax(res["residual"][valid]) < 0.1


def test_reconstruct_propagates_invalid_vectors(cams):
    from torchpiv_tpu.calib import reconstruct_from_grids

    (p1, m1), (p2, m2) = cams

    def disp(x, y):
        return (0.05 * np.ones_like(x), 0.0 * x, 0.0 * x)

    f1 = _camera_px_piv_field(p1, m1, np.arange(460, 830, 16.0),
                              np.arange(300, 670, 16.0), disp)
    f2 = _camera_px_piv_field(p2, m2, np.arange(450, 840, 16.0),
                              np.arange(300, 670, 16.0), disp)
    f1["u"][5:8, 5:8] = np.nan  # invalid vectors in camera 1
    res = reconstruct_from_grids(m1, m2, f1, f2, z=0.0)
    assert np.isnan(res["dz"]).any()
    valid = np.isfinite(res["dz"])
    assert valid.any()
    assert np.nanmax(np.abs(res["dx"][valid] - 0.05)) < 5e-3


def test_table_to_px_field_inverts_finalize():
    """table_to_px_field undoes the finalize_fields unit conversion
    (pipeline.py:84-126: row flip, v negation, scale/dt*1000)."""
    from torchpiv_tpu.calib.stereo import table_to_px_field

    rng = np.random.default_rng(0)
    u_px = rng.normal(size=(6, 5))
    v_px = rng.normal(size=(6, 5))
    x_px, y_px = np.meshgrid(np.arange(5.0) * 16, np.arange(6.0) * 16)
    scale, dt = 0.05, 2.0
    table = {
        "x[mm]": x_px * scale,
        "y[mm]": y_px * scale,
        "Vx[m/s]": np.flip(u_px, 0) * scale / dt * 1000,
        "Vy[m/s]": -np.flip(v_px, 0) * scale / dt * 1000,
    }
    f = table_to_px_field(table, scale=scale, dt=dt)
    np.testing.assert_allclose(f["x"], x_px, atol=1e-12)
    np.testing.assert_allclose(f["y"], y_px, atol=1e-12)
    np.testing.assert_allclose(f["u"], u_px, atol=1e-12)
    np.testing.assert_allclose(f["v"], v_px, atol=1e-12)


# ------------------------------------------------------------- CLI workflow


def test_cli_calib_and_stereo_workflow(cams, tmp_path, capsys):
    """Full user path: target photos -> tpiv calib -> two engine-format
    tables -> tpiv stereo -> 3C world table."""
    from torchpiv_tpu.cli import main
    from torchpiv_tpu.io.decode import imwrite_gray
    from torchpiv_tpu.utils.persistence import load_table, save_table

    (p1, m1t), (p2, m2t) = cams
    calibs = {}
    for name, proj in (("cam1", p1), ("cam2", p2)):
        argv = ["calib", "--spacing", "4.0",
                "--out", str(tmp_path / f"{name}.npz")]
        for z in (-2.0, 0.0, 2.0):
            g = np.linspace(-16, 16, 9)
            wx, wy = np.meshgrid(g, g)
            X, Y = proj(wx.ravel(), wy.ravel(), z)
            img = str(tmp_path / f"{name}_z{z:+.0f}.bmp")
            imwrite_gray(img, _render_dots((960, 1280), np.stack([X, Y], 1)))
            argv += ["--target", f"{img}:{z}"]
        assert main(argv) == 0
        calibs[name] = str(tmp_path / f"{name}.npz")
    assert "residual" in capsys.readouterr().out

    def disp(x, y):
        return (0.04 * np.ones_like(x), 0.01 * np.ones_like(x),
                0.02 * np.cos(y / 9.0))

    tables = []
    for name, (proj, m) in (("cam1", (p1, CameraMapping.load(calibs["cam1"]))),
                            ("cam2", (p2, CameraMapping.load(calibs["cam2"])))):
        f = _camera_px_piv_field(proj, m, np.arange(460, 830, 16.0),
                                 np.arange(300, 670, 16.0), disp)
        tables.append(save_table(f"{name}.txt", str(tmp_path), {
            "x[mm]": f["x"], "y[mm]": f["y"],
            "Vx[m/s]": np.flip(f["u"], 0) * 1000,
            "Vy[m/s]": -np.flip(f["v"], 0) * 1000,
        }))
    rc = main(["stereo", tables[0], tables[1],
               "--calib1", calibs["cam1"], "--calib2", calibs["cam2"],
               "--out", str(tmp_path / "st"), "--vtk"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "valid points" in out
    res = load_table(str(tmp_path / "st" / "stereo_3c.txt"))
    valid = np.isfinite(res["dz[world]"])
    assert valid.mean() > 0.4
    dxt, dyt, dzt = disp(res["x[world]"], res["y[world]"])
    # calibration is itself fitted from rendered detections here, so allow
    # a little more than the analytic-mapping test
    assert np.nanmax(np.abs((res["dx[world]"] - dxt)[valid])) < 1e-2
    assert np.nanmax(np.abs((res["dz[world]"] - dzt)[valid])) < 1e-2
    assert (tmp_path / "st" / "stereo_3c.vtk").exists()


def test_cli_dewarp_writes_world_frames(cams, tmp_path):
    from torchpiv_tpu.cli import main
    from torchpiv_tpu.io.decode import imread_gray, imwrite_gray

    (_, m1), _ = cams
    calib = str(tmp_path / "cam.npz")
    m1.save(calib)
    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(1)
    for n in ("a_0", "b_0"):
        imwrite_gray(str(raw / f"{n}.bmp"),
                     rng.integers(0, 255, (960, 1280), dtype=np.uint8))
    rc = main(["dewarp", str(raw), "--calib", calib,
               "--x0", "-10", "--y0", "-10", "--pitch", "0.3",
               "--width", "48", "--height", "40",
               "--out", str(tmp_path / "dw")])
    assert rc == 0
    for n in ("a_0", "b_0"):
        img = imread_gray(str(tmp_path / "dw" / f"{n}.bmp"))
        assert img is not None and img.shape == (40, 48)
