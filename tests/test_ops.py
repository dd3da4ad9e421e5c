"""Unit parity tests: JAX ops vs the golden numpy mirror of the reference."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import golden
from torchpiv_tpu.ops import (
    correlate_fft,
    correlation_to_displacement,
    cws_shift,
    dws_shift,
    extract_windows,
    get_coordinates,
    get_field_shape,
    mean_normalize,
    min_subtract,
    per_window_origins,
    spline_matrix,
)


@pytest.mark.parametrize(
    "shape,win,ov",
    [((256, 256), 64, 32), ((256, 320), 32, 16), ((123, 257), 32, 8), ((100, 90), 16, 4)],
)
def test_geometry_matches_golden(shape, win, ov):
    assert get_field_shape(shape, win, ov) == golden.get_field_shape(shape, win, ov)
    x, y = get_coordinates(shape, win, ov)
    gx, gy = golden.get_coordinates(shape, win, ov)
    np.testing.assert_array_equal(x, gx)
    np.testing.assert_array_equal(y, gy)


@pytest.mark.parametrize(
    "shape,win,ov",
    [
        ((256, 256), 64, 32),  # 50% overlap -> reshape fast path
        ((128, 160), 32, 16),
        ((123, 257), 32, 8),  # stride does not divide window -> gather path
        ((96, 96), 16, 12),
    ],
)
def test_extract_windows_matches_strided(rng, shape, win, ov):
    frame = rng.integers(0, 255, shape, dtype=np.uint8)
    ours = np.asarray(extract_windows(jnp.asarray(frame), win, ov))
    theirs = golden.moving_window_array(frame, win, ov)
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize(
    "shape,win,ov",
    [
        ((256, 256), 64, 32),   # 50% overlap (f=2), the headline geometry
        ((128, 160), 32, 16),
        ((96, 96), 16, 12),     # f=4
        ((123, 257), 32, 8),    # gather path: variant is a no-op there
    ],
)
def test_extract_windows_tilemajor_bit_identical(rng, shape, win, ov):
    """The tile-major assembly variant (frame-sized transpose instead of
    window-tensor transpose — the pass-1 perf lever) must be bit-identical
    to the default stack assembly on every path."""
    frame = rng.integers(0, 255, shape, dtype=np.uint8)
    a = np.asarray(extract_windows(jnp.asarray(frame), win, ov, "stack"))
    b = np.asarray(extract_windows(jnp.asarray(frame), win, ov, "tilemajor"))
    np.testing.assert_array_equal(a, b)
    # batched frames too (the sharded path vmaps over a leading axis)
    frames = rng.integers(0, 255, (2, *shape), dtype=np.uint8)
    a = np.asarray(extract_windows(jnp.asarray(frames), win, ov, "stack"))
    b = np.asarray(extract_windows(jnp.asarray(frames), win, ov, "tilemajor"))
    np.testing.assert_array_equal(a, b)


def test_extract_windows_batched(rng):
    frames = rng.integers(0, 255, (3, 128, 128), dtype=np.uint8)
    ours = np.asarray(extract_windows(jnp.asarray(frames), 32, 16))
    for i in range(3):
        np.testing.assert_array_equal(
            ours[i], golden.moving_window_array(frames[i], 32, 16)
        )


def test_correlate_fft_matches_numpy(rng):
    a = rng.normal(1.0, 0.2, (17, 32, 32)).astype(np.float32)
    b = rng.normal(1.0, 0.2, (17, 32, 32)).astype(np.float32)
    ours = np.asarray(correlate_fft(jnp.asarray(a), jnp.asarray(b)))
    theirs = golden.correlate_fft(a.astype(np.float64), b.astype(np.float64))
    scale = np.abs(theirs).max()
    np.testing.assert_allclose(ours / scale, theirs / scale, rtol=0, atol=1e-5)


def test_mean_normalize_and_min_subtract(rng):
    w = rng.integers(0, 255, (5, 16, 16), dtype=np.uint8)
    ours = np.asarray(mean_normalize(jnp.asarray(w)))
    theirs = w.astype(np.float64) / w.astype(np.float64).mean((-2, -1), keepdims=True)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
    c = rng.normal(0, 1, (5, 16, 16)).astype(np.float32)
    ours = np.asarray(min_subtract(jnp.asarray(c)))
    theirs = c - c.min(axis=(-2, -1), keepdims=True)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


class TestPeakFit:
    def _gauss_map(self, d, peak_rc, sigma=1.3, amp=100.0):
        yy, xx = np.mgrid[0:d, 0:d]
        return amp * np.exp(
            -((yy - peak_rc[0]) ** 2 + (xx - peak_rc[1]) ** 2) / (2 * sigma**2)
        )

    def test_known_subpixel_peak(self):
        d = 32
        maps = np.stack(
            [
                self._gauss_map(d, (16.3, 15.6)),
                self._gauss_map(d, (10.0, 20.75)),
                self._gauss_map(d, (16.0, 16.0)),
            ]
        ).astype(np.float32)
        u, v, inval = correlation_to_displacement(jnp.asarray(maps), validate=True)
        u, v = np.asarray(u), np.asarray(v)
        # Gaussian fit recovers a true Gaussian peak almost exactly.
        np.testing.assert_allclose(u, [15.6 - 16, 20.75 - 16, 0.0], atol=2e-2)
        np.testing.assert_allclose(v, [16.3 - 16, 10.0 - 16, 0.0], atol=2e-2)
        inval = np.asarray(inval)
        assert not inval[0] and not inval[1]

    def test_matches_golden_on_random_maps(self, rng):
        maps = rng.random((40, 32, 32)).astype(np.float32) ** 2
        maps = maps - maps.min(axis=(-2, -1), keepdims=True)
        u, v, inval = correlation_to_displacement(jnp.asarray(maps), validate=True)
        gu, gv, ginval = golden.correlation_to_displacement(
            maps.astype(np.float64), 40, 1, validate=True
        )
        np.testing.assert_allclose(np.asarray(u), gu.ravel(), atol=5e-3)
        np.testing.assert_allclose(np.asarray(v), gv.ravel(), atol=5e-3)
        np.testing.assert_array_equal(np.asarray(inval), ginval.ravel())

    def test_peak_at_edge_does_not_crash(self):
        d = 16
        maps = np.stack(
            [
                self._gauss_map(d, (0, 0)),
                self._gauss_map(d, (15, 15)),
                self._gauss_map(d, (0, 8)),
            ]
        ).astype(np.float32)
        u, v, inval = correlation_to_displacement(jnp.asarray(maps), validate=True)
        assert np.isfinite(np.asarray(u)).all()
        assert np.isfinite(np.asarray(v)).all()
        gu, gv, gi = golden.correlation_to_displacement(
            maps.astype(np.float64), 3, 1, validate=True
        )
        np.testing.assert_allclose(np.asarray(u), gu.ravel(), atol=5e-3)
        np.testing.assert_allclose(np.asarray(v), gv.ravel(), atol=5e-3)
        np.testing.assert_array_equal(np.asarray(inval), gi.ravel())


@pytest.mark.parametrize("mode", ["cws", "dws"])
def test_shifts_match_golden(rng, mode):
    shape, win, ov = (128, 160), 32, 16
    frame = rng.integers(0, 255, shape, dtype=np.uint8)
    n_rows, n_cols = golden.get_field_shape(shape, win, ov)
    n = n_rows * n_cols
    grid = golden._flat_window_grid(shape, win, ov)
    row0w, col0w = per_window_origins(shape, win, ov)

    if mode == "cws":
        vx = rng.uniform(-5, 5, n).astype(np.float32)
        vy = rng.uniform(-5, 5, n).astype(np.float32)
        # include exact-integer and half-integer shifts
        vx[:5] = [0.0, 1.0, -3.0, 2.5, -0.5]
        vy[:5] = [0.0, -2.0, 1.0, 0.5, 2.5]
        ours = np.asarray(
            cws_shift(jnp.asarray(frame), jnp.asarray(row0w), jnp.asarray(col0w),
                      win, jnp.asarray(vx), jnp.asarray(vy))
        )
        theirs = golden.bilinear_cws(
            frame, grid, vx[:, None, None], vy[:, None, None]
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-3)
    else:
        vx = rng.integers(-5, 6, n).astype(np.int64)
        vy = rng.integers(-5, 6, n).astype(np.int64)
        ours = np.asarray(
            dws_shift(jnp.asarray(frame), jnp.asarray(row0w), jnp.asarray(col0w),
                      win, jnp.asarray(vx.astype(np.int32)), jnp.asarray(vy.astype(np.int32)))
        )
        theirs = golden.nearest_dws(frame, grid, vx[:, None, None], vy[:, None, None])
        np.testing.assert_array_equal(ours, theirs)


class TestSpline:
    def test_matrix_matches_scipy_rbs(self, rng):
        from scipy.interpolate import RectBivariateSpline

        y0 = np.arange(7) * 32.0 + 16
        x0 = np.arange(9) * 32.0 + 16
        y1 = np.arange(15) * 16.0 + 8  # finer, extends past the coarse range
        x1 = np.arange(19) * 16.0 + 8
        Ay = spline_matrix(y0, y1)
        Ax = spline_matrix(x0, x1)
        U = rng.normal(0, 3, (7, 9))
        ours = Ay @ U @ Ax.T
        theirs = RectBivariateSpline(y0, x0, U)(y1, x1)
        np.testing.assert_allclose(ours, theirs, atol=1e-9)

    def test_small_grid_degree_drop(self):
        y0 = np.array([0.0, 10.0, 20.0])
        A = spline_matrix(y0, np.array([5.0, 15.0]))
        # quadratic through 3 points, still interpolates the nodes
        np.testing.assert_allclose(spline_matrix(y0, y0), np.eye(3), atol=1e-12)
        assert A.shape == (2, 3)


def test_correlate_matmul_matches_fft(rng):
    from torchpiv_tpu.ops.correlate import correlate_matmul

    for n in (16, 32, 64):
        a = rng.normal(1.0, 0.2, (9, n, n)).astype(np.float32)
        b = rng.normal(1.0, 0.2, (9, n, n)).astype(np.float32)
        ours = np.asarray(correlate_matmul(jnp.asarray(a), jnp.asarray(b)))
        theirs = golden.correlate_fft(a.astype(np.float64), b.astype(np.float64))
        scale = np.abs(theirs).max()
        np.testing.assert_allclose(ours / scale, theirs / scale, atol=2e-5)


def test_correlate_matmul_complex_mm_variants(rng):
    """The explicit-real lowerings ("real", "gauss") of the matmul
    correlator compute the same correlation maps as the direct complex
    path, across the plain / dc_normalize / RPC branches (see
    correlate_matmul's docstring; "gauss" reconstructs the imaginary
    plane by cancellation, hence the slightly wider tolerance)."""
    from torchpiv_tpu.ops.correlate import correlate_matmul, rpc_filter

    for n in (16, 32, 64):
        a = rng.normal(1.0, 0.2, (9, n, n)).astype(np.float32)
        b = rng.normal(1.0, 0.2, (9, n, n)).astype(np.float32)
        ja, jb = jnp.asarray(a), jnp.asarray(b)
        pf = rpc_filter(n, 2.8)
        for kwargs, atol in (
            (dict(), 2e-5),
            (dict(dc_normalize=True), 2e-5),
            (dict(phase_filter=pf), 5e-5),
        ):
            base = np.asarray(correlate_matmul(
                ja, jb, precision="highest", **kwargs))
            scale = np.abs(base).max()
            for variant in ("real", "gauss"):
                ours = np.asarray(correlate_matmul(
                    ja, jb, precision="highest", complex_mm=variant,
                    **kwargs))
                np.testing.assert_allclose(
                    ours / scale, base / scale, rtol=0, atol=atol,
                    err_msg=f"n={n} variant={variant} kwargs={kwargs}")


def test_config_rejects_unknown_complex_mm():
    from torchpiv_tpu.models import PIVConfig

    with pytest.raises(ValueError, match="unknown complex_mm"):
        PIVConfig(frame_shape=(128, 128), wind_size=32, overlap=16,
                  complex_mm="karatsuba")


def test_multipass_complex_mm_field_parity(rng):
    """End-to-end engine fields at complex_mm="real"/"gauss" match the
    direct lowering on a real particle pair (CPU, f32 matmuls)."""
    from torchpiv_tpu.models import MultipassPIV, PIVConfig
    from torchpiv_tpu.utils.synthetic import particle_pair

    fa, fb = particle_pair((192, 192), displacement=(2.3, -1.4), seed=11)
    fields = {}
    for variant in ("direct", "real", "gauss"):
        cfg = PIVConfig(frame_shape=(192, 192), wind_size=32, overlap=16,
                        multipass=2, multipass_mode="CWS",
                        correlator="matmul", complex_mm=variant)
        out = MultipassPIV(cfg)(jnp.asarray(fa), jnp.asarray(fb))
        fields[variant] = (np.asarray(out[0]), np.asarray(out[1]))
    for variant in ("real", "gauss"):
        for base_c, var_c in zip(fields["direct"], fields[variant]):
            np.testing.assert_allclose(var_c, base_c, atol=1e-3,
                                       err_msg=f"variant={variant}")


def test_rpc_matches_golden_oracle(rng):
    """Robust phase correlation: both correlator backends vs the float64
    full-spectrum numpy oracle (golden.correlate_rpc) — pins the phase
    normalisation, the spectral filter, and that |.|-normalisation
    preserves the Hermitian symmetry the half-spectrum inverse relies on."""
    from torchpiv_tpu.ops.correlate import correlate_matmul, rpc_filter

    for n in (32, 64):
        a = rng.normal(1.0, 0.2, (7, n, n)).astype(np.float32)
        b = rng.normal(1.0, 0.2, (7, n, n)).astype(np.float32)
        pf = rpc_filter(n, 2.8)
        ref = golden.correlate_rpc(a.astype(np.float64), b.astype(np.float64))
        s = np.abs(ref).max()
        # tolerance note: a spectral bin whose magnitude is below the f32
        # FFT noise floor normalises to a unit phasor whose PHASE is
        # precision-dependent; its worst-case contribution is
        # filter(k)/n^2 per bin (~1e-5 at n=64) — measured worst 9.6e-6
        # over 20 random trials, so 5e-5 pins semantics with headroom.
        ours = np.asarray(correlate_fft(
            jnp.asarray(a), jnp.asarray(b), phase_filter=pf))
        np.testing.assert_allclose(ours / s, ref / s, rtol=0, atol=5e-5)
        ours = np.asarray(correlate_matmul(
            jnp.asarray(a), jnp.asarray(b), precision="highest",
            phase_filter=pf))
        np.testing.assert_allclose(ours / s, ref / s, rtol=0, atol=5e-5)


def test_rpc_scale_invariance(rng):
    """Phase normalisation cancels any per-window intensity scale (the
    property that makes RPC robust to illumination)."""
    from torchpiv_tpu.ops.correlate import rpc_filter

    a = rng.normal(1.0, 0.2, (3, 32, 32)).astype(np.float32)
    b = rng.normal(1.0, 0.2, (3, 32, 32)).astype(np.float32)
    pf = rpc_filter(32, 2.8)
    base = np.asarray(correlate_fft(
        jnp.asarray(a), jnp.asarray(b), phase_filter=pf))
    scaled = np.asarray(correlate_fft(
        jnp.asarray(a * 7.5), jnp.asarray(b * 0.3), phase_filter=pf))
    np.testing.assert_allclose(scaled, base, rtol=0, atol=1e-5)


class TestSAD:
    def test_fast_sad_locates_integer_shift(self):
        rng = np.random.default_rng(6)
        from torchpiv_tpu.ops.sad import fast_sad

        # windows where B is A shifted by (+3, -2): SAD minimum at the shift
        base = rng.random((4, 40, 40)).astype(np.float32)
        a = base[:, 4:36, 4:36]
        b = np.stack([np.roll(np.roll(w, 2, axis=0), 3, axis=1) for w in a])
        sad_x, sad_y = fast_sad(jnp.asarray(a), jnp.asarray(b))
        n = 32
        # placement offset k corresponds to displacement k - n//2
        assert (np.asarray(sad_x).argmin(-1) - n // 2 == -3).all()
        assert (np.asarray(sad_y).argmin(-1) - n // 2 == -2).all()

    def test_sad_fft_minimum_at_shift(self, rng):
        from torchpiv_tpu.ops.sad import sad_fft

        base = rng.random((3, 32, 32)).astype(np.float32)
        b = np.stack([np.roll(np.roll(w, 1, axis=0), -2, axis=1) for w in base])
        out = np.asarray(sad_fft(jnp.asarray(base), jnp.asarray(b)))
        # the maximum of the cos/sin similarity map sits at the displacement
        for m in out:
            r, c = np.unravel_index(m.argmax(), m.shape)
            assert (r - 16, c - 16) == (1, -2)

    def test_batch_normalize(self, rng):
        from torchpiv_tpu.ops.sad import batch_normalize

        w = rng.integers(10, 200, (5, 8, 8)).astype(np.float32)
        out = np.asarray(batch_normalize(jnp.asarray(w)))
        assert np.allclose(out.min(axis=(-2, -1)), 0)
        assert np.allclose(out.max(axis=(-2, -1)), 1)


class TestFusedInfill:
    def test_reproduces_linear_field_exactly(self):
        """Harmonic (Jacobi) infill of holes in a linear field must converge
        back to the plane — linear functions are harmonic."""
        from torchpiv_tpu.ops.infill import fused_infill

        yy, xx = np.mgrid[0:20, 0:24].astype(np.float32)
        field = 2.0 + 0.3 * xx - 0.1 * yy
        invalid = np.zeros_like(field, bool)
        invalid[8:12, 10:15] = True
        invalid[3, 3] = True
        holes = jnp.where(jnp.asarray(invalid), jnp.nan, jnp.asarray(field))
        filled = np.asarray(
            jax.jit(lambda f, m: fused_infill(f, m, iters=400))(
                holes, jnp.asarray(invalid)
            )
        )
        np.testing.assert_allclose(filled, field, atol=1e-3)

    def test_matches_exact_infill_on_smooth_field(self, rng):
        from torchpiv_tpu.ops.infill import (
            fill_missing_values,
            fused_infill,
            interpolate_borders,
        )

        yy, xx = np.mgrid[0:16, 0:16].astype(np.float64)
        field = np.sin(xx / 5) + 0.5 * np.cos(yy / 4)
        invalid = np.zeros_like(field, bool)
        invalid[6:9, 6:10] = True
        withnan = np.where(invalid, np.nan, field)
        exact = fill_missing_values(interpolate_borders(withnan.copy()))
        fused = np.asarray(
            fused_infill(jnp.asarray(withnan, dtype=jnp.float32),
                         jnp.asarray(invalid), iters=300)
        )
        # both are interpolants of the same boundary data; they agree to the
        # field's curvature scale
        d = np.abs(fused - exact)[invalid]
        assert d.max() < 0.08  # harmonic vs Delaunay differ at curvature scale


# ---- gauss2d sub-pixel estimator (beyond the reference) ----

def _gauss_peak_map(n, cy, cx, sy, sx, rho=0.0):
    """Correlation map: tilted 2-D Gaussian at (cy, cx)."""
    y, x = np.mgrid[0:n, 0:n].astype(np.float64)
    dy = (y - cy) / sy
    dx = (x - cx) / sx
    q = (dy**2 - 2 * rho * dy * dx + dx**2) / (1 - rho**2)
    return np.exp(-0.5 * q)


def test_gauss2d_beats_gauss3_on_tilted_peaks():
    from torchpiv_tpu.ops.peakfit import correlation_to_displacement

    n = 32
    rng = np.random.default_rng(0)
    maps, true_u, true_v = [], [], []
    for _ in range(64):
        du = rng.uniform(-0.45, 0.45)
        dv = rng.uniform(-0.45, 0.45)
        # elliptical + tilted peak: the cross term biases axis-only fits
        maps.append(_gauss_peak_map(n, n // 2 + dv, n // 2 + du,
                                    sy=1.4, sx=2.2, rho=0.55))
        true_u.append(du)
        true_v.append(dv)
    corr = jnp.asarray(np.stack(maps), jnp.float32)
    u3, v3, _ = correlation_to_displacement(corr, validate=False)
    u9, v9, _ = correlation_to_displacement(corr, validate=False,
                                            fit="gauss2d")
    e3 = np.hypot(np.asarray(u3) - true_u, np.asarray(v3) - true_v)
    e9 = np.hypot(np.asarray(u9) - true_u, np.asarray(v9) - true_v)
    # the 2-D fit models the cross term the axis fits cannot
    assert np.sqrt((e9**2).mean()) < 0.5 * np.sqrt((e3**2).mean())
    assert np.sqrt((e9**2).mean()) < 0.02


def test_gauss2d_matches_gauss3_on_axis_aligned_peaks():
    """With no cross term both estimators are unbiased; gauss2d must not
    degrade the classic case."""
    from torchpiv_tpu.ops.peakfit import correlation_to_displacement

    n = 32
    rng = np.random.default_rng(1)
    maps, true_u = [], []
    for _ in range(32):
        du = rng.uniform(-0.45, 0.45)
        maps.append(_gauss_peak_map(n, n // 2, n // 2 + du, sy=1.8, sx=1.8))
        true_u.append(du)
    corr = jnp.asarray(np.stack(maps), jnp.float32)
    u9, v9, _ = correlation_to_displacement(corr, validate=False,
                                            fit="gauss2d")
    assert np.abs(np.asarray(u9) - true_u).max() < 1e-3
    assert np.abs(np.asarray(v9)).max() < 1e-3


def test_engine_gauss2d_end_to_end():
    from torchpiv_tpu.models import MultipassPIV, PIVConfig
    from torchpiv_tpu.utils.synthetic import particle_pair

    fa, fb = particle_pair((256, 256), displacement=(3.3, -2.1), seed=4)
    eng = MultipassPIV(PIVConfig(frame_shape=(256, 256), wind_size=64,
                                 overlap=32, multipass=2,
                                 subpixel="gauss2d"))
    u, v, inval = jax.jit(eng)(jnp.asarray(fa), jnp.asarray(fb))
    u, v, inval = map(np.asarray, (u, v, inval))
    sel = ~inval[2:-2, 2:-2]
    assert sel.mean() > 0.9
    assert abs(u[2:-2, 2:-2][sel].mean() - 3.3) < 0.05
    assert abs(v[2:-2, 2:-2][sel].mean() + 2.1) < 0.05
    # invalid combination rejected loudly
    import pytest

    with pytest.raises(ValueError):
        PIVConfig(frame_shape=(256, 256), subpixel="gauss2d",
                  peakfit="pallas")
