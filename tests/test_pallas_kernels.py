"""Parity tests for Pallas kernels vs their XLA reference ops.

On CPU the kernels run in interpreter mode — same program, same semantics,
no Mosaic compile.  The TPU-compiled path is exercised by bench/verify runs
on hardware.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from torchpiv_tpu.kernels import shift_windows_pallas
from torchpiv_tpu.models import MultipassPIV, PIVConfig
from torchpiv_tpu.ops.shifts import cws_shift, dws_shift, per_window_origins
from torchpiv_tpu.utils.synthetic import particle_pair


@pytest.mark.parametrize("shape,w,ov", [((128, 256), 32, 16), ((96, 288), 16, 8)])
def test_shift_kernel_interior_matches_xla(rng, shape, w, ov):
    H, W = shape
    frame = rng.integers(0, 255, (H, W)).astype(np.float32)
    n_rows = (H - w) // (w - ov) + 1
    n_cols = (W - w) // (w - ov) + 1
    N = n_rows * n_cols
    vx = rng.uniform(-w / 4, w / 4, N).astype(np.float32)
    vy = rng.uniform(-w / 4, w / 4, N).astype(np.float32)
    vx[:3] = [0.0, 1.0, -2.5]
    vy[:3] = [0.0, -1.0, 0.5]
    r0, c0 = per_window_origins((H, W), w, ov)
    ref = np.asarray(
        cws_shift(jnp.asarray(frame), jnp.asarray(r0), jnp.asarray(c0), w,
                  jnp.asarray(vx), jnp.asarray(vy))
    ).reshape(n_rows, n_cols, w, w)
    out = np.asarray(
        shift_windows_pallas(
            jnp.asarray(frame), jnp.asarray(vx), jnp.asarray(vy),
            frame_shape=(H, W), wind_size=w, overlap=ov, interpret=True,
        )
    ).reshape(n_rows, n_cols, w, w)
    # flat_wrap padding reproduces the XLA path's flat-index edge semantics
    # on EVERY window (incl. the frame-edge ring), up to per-window-vs-
    # per-pixel f32 frac weights (~1e-4 relative).
    d = np.abs(out - ref)
    assert d.max() < 0.05, d.max()


def test_dws_integer_shifts_exact(rng):
    H, W, w, ov = 128, 256, 32, 16
    frame = rng.integers(0, 255, (H, W)).astype(np.float32)
    n_rows = (H - w) // (w - ov) + 1
    n_cols = (W - w) // (w - ov) + 1
    N = n_rows * n_cols
    vx = rng.integers(-6, 7, N).astype(np.int32)
    vy = rng.integers(-6, 7, N).astype(np.int32)
    r0, c0 = per_window_origins((H, W), w, ov)
    ref = np.asarray(
        dws_shift(jnp.asarray(frame), jnp.asarray(r0), jnp.asarray(c0), w,
                  jnp.asarray(vx), jnp.asarray(vy))
    ).reshape(n_rows, n_cols, w, w)
    out = np.asarray(
        shift_windows_pallas(
            jnp.asarray(frame), jnp.asarray(vx, dtype=jnp.float32),
            jnp.asarray(vy, dtype=jnp.float32),
            frame_shape=(H, W), wind_size=w, overlap=ov, interpret=True,
        )
    ).reshape(n_rows, n_cols, w, w)
    # Integer shifts hit the floor-corner path: bit-exact everywhere
    # (flat-wrap padding covers the frame-edge windows too).
    np.testing.assert_array_equal(out, ref)


def test_engine_with_pallas_interpret_matches_xla_engine():
    fa, fb = particle_pair((256, 256), displacement=(3.3, -2.1), seed=7)
    base = dict(frame_shape=(256, 256), wind_size=64, overlap=32,
                multipass=2, multipass_mode="CWS")
    eng_xla = MultipassPIV(PIVConfig(**base, use_pallas="off"))
    eng_pal = MultipassPIV(
        PIVConfig(**base, use_pallas="off", pallas_interpret=True)
    )
    u0, v0, i0 = jax.jit(eng_xla)(jnp.asarray(fa), jnp.asarray(fb))
    u1, v1, i1 = eng_pal(jnp.asarray(fa), jnp.asarray(fb))
    i0, i1 = np.asarray(i0), np.asarray(i1)
    both = ~(i0 | i1)
    assert np.mean(i0 != i1) < 0.02
    d = np.abs(np.asarray(u0) - np.asarray(u1))[both]
    assert np.sqrt(np.mean(d**2)) < 0.01, d.max()
    d = np.abs(np.asarray(v0) - np.asarray(v1))[both]
    assert np.sqrt(np.mean(d**2)) < 0.01, d.max()


class TestPeakfitPallas:
    def test_matches_xla_exactly(self, rng):
        from torchpiv_tpu.experimental.peakfit_pallas import (
            correlation_to_displacement_pallas,
        )
        from torchpiv_tpu.ops.peakfit import correlation_to_displacement

        maps = (rng.random((150, 32, 32)).astype(np.float32)) ** 2
        maps -= maps.min(axis=(-2, -1), keepdims=True)
        u0, v0, i0 = correlation_to_displacement(jnp.asarray(maps), True)
        u1, v1, i1 = correlation_to_displacement_pallas(
            jnp.asarray(maps), True, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(u0), np.asarray(u1))
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))

    def test_novalidate_and_padding(self, rng):
        from torchpiv_tpu.experimental.peakfit_pallas import (
            correlation_to_displacement_pallas,
        )
        from torchpiv_tpu.ops.peakfit import correlation_to_displacement

        # N=37 forces block padding; validate=False path
        maps = (rng.random((37, 16, 16)).astype(np.float32)) ** 2
        u0, v0, _ = correlation_to_displacement(jnp.asarray(maps), False)
        u1, v1, i1 = correlation_to_displacement_pallas(
            jnp.asarray(maps), False, interpret=True
        )
        assert i1 is None
        np.testing.assert_array_equal(np.asarray(u0), np.asarray(u1))
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))

    def test_engine_end_to_end_interpret(self):
        from torchpiv_tpu.models import MultipassPIV, PIVConfig

        fa, fb = particle_pair((256, 256), displacement=(3.3, -2.1), seed=7)
        base = dict(frame_shape=(256, 256), wind_size=64, overlap=32,
                    multipass=2, multipass_mode="CWS")
        ex = MultipassPIV(PIVConfig(**base, use_pallas="off"))
        ep = MultipassPIV(PIVConfig(**base, use_pallas="off",
                                    pallas_interpret=True))
        u0, v0, i0 = jax.jit(ex)(jnp.asarray(fa), jnp.asarray(fb))
        u1, v1, i1 = ep(jnp.asarray(fa), jnp.asarray(fb))
        both = ~(np.asarray(i0) | np.asarray(i1))
        d = np.abs(np.asarray(u0) - np.asarray(u1))[both]
        assert np.sqrt(np.mean(d**2)) < 0.01


# ---- DEF (deforming-window) kernel (kernels/def_pallas.py) ----

def _def_xla_reference(frame, u2, v2, dudx, dudy, dvdx, dvdy, W, O, shape):
    """The engine's XLA dense-offset DEF resampling (multipass.py branch)."""
    from torchpiv_tpu.ops.shifts import cws_shift, per_window_origins

    n_rows = (shape[0] - W) // (W - O) + 1
    n_cols = (shape[1] - W) // (W - O) + 1
    n = n_rows * n_cols
    off = jnp.arange(W, dtype=jnp.float32) - (W - 1) / 2.0

    def dense(c, gx, gy):
        return (c.reshape(n, 1, 1) + gx.reshape(n, 1, 1) * off[None, None, :]
                + gy.reshape(n, 1, 1) * off[None, :, None])

    du = dense(jnp.asarray(u2), jnp.asarray(dudx), jnp.asarray(dudy))
    dv = dense(jnp.asarray(v2), jnp.asarray(dvdx), jnp.asarray(dvdy))
    r0, c0 = per_window_origins(shape, W, O)
    return cws_shift(frame, jnp.asarray(r0), jnp.asarray(c0), W, du, dv,
                     jnp.float32)


def test_def_kernel_matches_xla_dense():
    from torchpiv_tpu.kernels.def_pallas import def_windows_pallas

    shape = (256, 256)
    W, O = 32, 16
    fa, _ = particle_pair(shape, displacement=(3.3, -2.1), seed=0)
    n = (((shape[0] - W) // (W - O)) + 1) ** 2
    rng = np.random.default_rng(2)
    u2 = rng.uniform(-6, 6, n).astype(np.float32)
    v2 = rng.uniform(-6, 6, n).astype(np.float32)
    g = [rng.uniform(-0.05, 0.05, n).astype(np.float32) for _ in range(4)]
    u2[:15] = np.round(u2[:15])
    g[0][:15] = g[1][:15] = 0  # integer-cell quirk windows
    f = jnp.asarray(fa)
    got = np.asarray(def_windows_pallas(
        f, jnp.asarray(u2), jnp.asarray(v2), *(jnp.asarray(x) for x in g),
        frame_shape=shape, wind_size=W, overlap=O, interpret=True))
    ref = np.asarray(_def_xla_reference(f, u2, v2, *g, W=W, O=O, shape=shape))
    d = np.abs(got - ref)
    # The XLA path floors ABSOLUTE f32 coordinates (precision ~1e-5 px at
    # 256); the kernel floors small residuals (precision ~1e-7) — pixels
    # whose sample position sits within f32 noise of an integer can land in
    # the neighbouring cell.  Rare (data-dependent), so compare by quantile.
    frac_diff = (d > 1e-3).mean()
    assert frac_diff < 0.005, f"{frac_diff:.2%} pixels differ"
    assert np.quantile(d, 0.99) < 1e-3


def test_def_kernel_integer_zero_gradient_is_integer_shift():
    """g == 0 and integer centers: DEF degenerates to the integer shift —
    bit-exact vs the CWS kernel's integer path."""
    from torchpiv_tpu.kernels.def_pallas import def_windows_pallas

    shape = (192, 192)
    W, O = 32, 16
    fa, _ = particle_pair(shape, displacement=(2.0, -1.0), seed=5)
    n = (((shape[0] - W) // (W - O)) + 1) ** 2
    rng = np.random.default_rng(3)
    vx = np.round(rng.uniform(-5, 5, n)).astype(np.float32)
    vy = np.round(rng.uniform(-5, 5, n)).astype(np.float32)
    z = np.zeros(n, np.float32)
    f = jnp.asarray(fa)
    got = np.asarray(def_windows_pallas(
        f, jnp.asarray(vx), jnp.asarray(vy), *(jnp.asarray(z),) * 4,
        frame_shape=shape, wind_size=W, overlap=O, interpret=True))
    ref = np.asarray(shift_windows_pallas(
        f.astype(jnp.float32), jnp.asarray(vx), jnp.asarray(vy),
        frame_shape=shape, wind_size=W, overlap=O, interpret=True))
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("flow", ["uniform", "shear"])
def test_engine_def_pallas_matches_xla(flow):
    from torchpiv_tpu.utils.synthetic import shear_flow

    disp = (3.3, -2.1) if flow == "uniform" else shear_flow(1.0, 0.01)
    fa, fb = particle_pair((512, 512), displacement=disp, seed=11)
    base = dict(frame_shape=(512, 512), wind_size=64, overlap=32,
                multipass=2, multipass_mode="DEF")
    ref = MultipassPIV(PIVConfig(**base, use_pallas="off"))
    pal = MultipassPIV(PIVConfig(**base, use_pallas="off",
                                 pallas_interpret=True))
    ru, rv, ri = map(np.asarray, jax.jit(ref)(jnp.asarray(fa),
                                              jnp.asarray(fb)))
    pu, pv, pi = map(np.asarray, pal(jnp.asarray(fa), jnp.asarray(fb)))
    agree = pi == ri
    assert agree.mean() > 0.99
    both = ~(pi | ri) & agree
    rms = np.sqrt(np.mean((pu[both] - ru[both]) ** 2
                          + (pv[both] - rv[both]) ** 2))
    assert rms < 0.01, f"{flow}: {rms:.4f} px"


# ---- bicubic CWS kernel (shift_pallas interp="bicubic") ----

def test_bicubic_kernel_matches_xla():
    from torchpiv_tpu.ops.shifts import bicubic_cws_shift

    shape = (256, 256)
    W, O = 32, 16
    fa, _ = particle_pair(shape, displacement=(3.3, -2.1), seed=0)
    n = (((shape[0] - W) // (W - O)) + 1) ** 2
    rng = np.random.default_rng(1)
    vx = rng.uniform(-8, 8, n).astype(np.float32)
    vy = rng.uniform(-8, 8, n).astype(np.float32)
    vx[:20] = np.round(vx[:20])
    vy[5:25] = np.round(vy[5:25])
    f = jnp.asarray(fa)
    got = np.asarray(shift_windows_pallas(
        f, jnp.asarray(vx), jnp.asarray(vy), frame_shape=shape, wind_size=W,
        overlap=O, interpret=True, interp="bicubic"))
    r0, c0 = per_window_origins(shape, W, O)
    ref = np.asarray(bicubic_cws_shift(
        f, jnp.asarray(r0), jnp.asarray(c0), W, jnp.asarray(vx),
        jnp.asarray(vy), jnp.float32))
    d = np.abs(got - ref)
    assert np.sqrt((d ** 2).mean()) < 1e-3   # f32 weight op-order noise
    assert d.max() < 1e-2
    # integer shifts: cubic weights collapse to (0,1,0,0) — exact
    per_win = d.reshape(n, -1).max(1)
    iw = (vx == np.round(vx)) & (vy == np.round(vy))
    assert per_win[iw].max() == 0.0


def test_engine_bicubic_pallas_matches_xla():
    fa, fb = particle_pair((256, 256), displacement=(3.3, -2.1), seed=9)
    base = dict(frame_shape=(256, 256), wind_size=64, overlap=32,
                multipass=2, cws_interp="bicubic")
    ref = MultipassPIV(PIVConfig(**base, use_pallas="off"))
    pal = MultipassPIV(PIVConfig(**base, use_pallas="off",
                                 pallas_interpret=True))
    ru, rv, ri = map(np.asarray, jax.jit(ref)(jnp.asarray(fa),
                                              jnp.asarray(fb)))
    pu, pv, pi = map(np.asarray, pal(jnp.asarray(fa), jnp.asarray(fb)))
    agree = pi == ri
    assert agree.mean() > 0.99
    both = ~(pi | ri) & agree
    rms = np.sqrt(np.mean((pu[both] - ru[both]) ** 2
                          + (pv[both] - rv[both]) ** 2))
    assert rms < 0.01


def test_def_kernel_bicubic_matches_xla():
    from torchpiv_tpu.kernels.def_pallas import def_windows_pallas
    from torchpiv_tpu.ops.shifts import bicubic_cws_shift

    shape = (256, 256)
    W, O = 32, 16
    fa, _ = particle_pair(shape, displacement=(3.3, -2.1), seed=0)
    n = (((shape[0] - W) // (W - O)) + 1) ** 2
    rng = np.random.default_rng(2)
    u2 = rng.uniform(-6, 6, n).astype(np.float32)
    v2 = rng.uniform(-6, 6, n).astype(np.float32)
    g = [rng.uniform(-0.05, 0.05, n).astype(np.float32) for _ in range(4)]
    f = jnp.asarray(fa)
    got = np.asarray(def_windows_pallas(
        f, jnp.asarray(u2), jnp.asarray(v2), *(jnp.asarray(x) for x in g),
        frame_shape=shape, wind_size=W, overlap=O, interpret=True,
        interp="bicubic"))
    off = jnp.arange(W, dtype=jnp.float32) - (W - 1) / 2.0

    def dense(c, gx, gy):
        return (c.reshape(n, 1, 1) + gx.reshape(n, 1, 1) * off[None, None, :]
                + gy.reshape(n, 1, 1) * off[None, :, None])

    du = dense(jnp.asarray(u2), jnp.asarray(g[0]), jnp.asarray(g[1]))
    dv = dense(jnp.asarray(v2), jnp.asarray(g[2]), jnp.asarray(g[3]))
    r0, c0 = per_window_origins(shape, W, O)
    ref = np.asarray(bicubic_cws_shift(f, jnp.asarray(r0), jnp.asarray(c0),
                                       W, du, dv, jnp.float32))
    d = np.abs(got - ref)
    assert np.quantile(d, 0.99) < 1e-2 and (d > 1e-2).mean() < 0.005


def test_kernels_at_extreme_shifts():
    """Shifts at the +-max_shift saturation with edge windows: exercises
    the band coverage bounds (aligned origins can sit 7 rows early)."""
    from torchpiv_tpu.kernels.def_pallas import def_windows_pallas
    from torchpiv_tpu.ops.shifts import cws_shift

    shape = (192, 192)
    W, O = 32, 16
    fa, _ = particle_pair(shape, displacement=(1.0, 1.0), seed=8)
    n_axis = (shape[0] - W) // (W - O) + 1
    n = n_axis ** 2
    rng = np.random.default_rng(9)
    S = W // 2
    # all shifts pinned at the saturation corners, both signs
    vx = np.where(rng.random(n) < 0.5, -S, S).astype(np.float32) - 0.25
    vy = np.where(rng.random(n) < 0.5, -S, S).astype(np.float32) + 0.25
    f = jnp.asarray(fa)
    got = np.asarray(shift_windows_pallas(
        f.astype(jnp.float32), jnp.asarray(vx), jnp.asarray(vy),
        frame_shape=shape, wind_size=W, overlap=O, interpret=True))
    # XLA reference with the kernel's clamp applied
    vxc = np.clip(vx, -S, S)
    vyc = np.clip(vy, -S, S)
    r0, c0 = per_window_origins(shape, W, O)
    ref = np.asarray(cws_shift(f, jnp.asarray(r0), jnp.asarray(c0), W,
                               jnp.asarray(vxc), jnp.asarray(vyc),
                               jnp.float32))
    interior = np.ones(n, bool).reshape(n_axis, n_axis)
    interior[0] = interior[-1] = False
    interior[:, 0] = interior[:, -1] = False
    d = np.abs(got - ref).reshape(n, -1).max(1)
    assert d[interior.ravel()].max() < 1e-3
    # DEF kernel at saturated centers, zero gradients — interior windows
    z = np.zeros(n, np.float32)
    gotd = np.asarray(def_windows_pallas(
        f, jnp.asarray(vx), jnp.asarray(vy), *(jnp.asarray(z),) * 4,
        frame_shape=shape, wind_size=W, overlap=O, interpret=True))
    dd = np.abs(gotd - ref).reshape(n, -1).max(1)
    assert dd[interior.ravel()].max() < 1e-3


def test_def_kernel_saturates_extreme_gradients():
    """Gradients far beyond the margin must saturate (clamped residuals),
    never read out of the tile or produce non-finite output — bilinear and
    bicubic."""
    from torchpiv_tpu.kernels.def_pallas import def_windows_pallas

    shape = (192, 192)
    W, O = 32, 16
    fa, _ = particle_pair(shape, displacement=(1.0, 1.0), seed=8)
    n = (((shape[0] - W) // (W - O)) + 1) ** 2
    rng = np.random.default_rng(4)
    u2 = rng.uniform(-20, 20, n).astype(np.float32)  # beyond max_shift too
    v2 = rng.uniform(-20, 20, n).astype(np.float32)
    g = [rng.uniform(-2, 2, n).astype(np.float32) for _ in range(4)]  # huge
    f = jnp.asarray(fa)
    for interp in ("bilinear", "bicubic"):
        out = np.asarray(def_windows_pallas(
            f, jnp.asarray(u2), jnp.asarray(v2),
            *(jnp.asarray(x) for x in g),
            frame_shape=shape, wind_size=W, overlap=O, interpret=True,
            interp=interp))
        assert np.isfinite(out).all(), interp
        assert out.min() >= -64 and out.max() <= 320, interp  # grey-ish range


@pytest.mark.parametrize("variant", ["bf16", "phases", "mxu", "lanephases"])
def test_shift_variant_parity(variant):
    """Experimental shift-kernel variants (all measured slower than 'rolls'
    on v5e — kept as documented reference points, docs/ROADMAP.md) must
    stay numerically faithful: bit-exact on integer shifts, ULP-level on
    fractional (FMA-contraction differences only)."""
    shape = (192, 192)
    W, O = 32, 16
    fa, _ = particle_pair(shape, displacement=(2.0, -1.0), seed=6)
    n = (((shape[0] - W) // (W - O)) + 1) ** 2
    rng = np.random.default_rng(7)
    vx = rng.uniform(-8, 8, n).astype(np.float32)
    vy = rng.uniform(-8, 8, n).astype(np.float32)
    vx[: n // 3] = np.round(vx[: n // 3])
    vy[: n // 3] = np.round(vy[: n // 3])
    f = jnp.asarray(fa)
    kw = dict(frame_shape=shape, wind_size=W, overlap=O, interpret=True)
    ref = np.asarray(shift_windows_pallas(
        f.astype(jnp.float32), jnp.asarray(vx), jnp.asarray(vy), **kw))
    got = np.asarray(shift_windows_pallas(
        f.astype(jnp.float32), jnp.asarray(vx), jnp.asarray(vy),
        variant=variant, **kw))
    d = np.abs(got - ref)
    assert d.max() < 1e-4
    int_win = (vx == np.round(vx)) & (vy == np.round(vy))
    assert d.reshape(n, -1).max(1)[int_win].max() == 0.0


@pytest.mark.parametrize("w,frame", [(64, 256), (128, 384)])
def test_shift_kernel_at_lane_boundary(rng, w, frame):
    """w=64 (production) and w=128 — the LARGEST window the kernel accepts
    (s_col + w + 1 = 127 + 129 = 256 exactly fills the lane block).  A
    silent wrap at the boundary would corrupt the right edge of windows
    whose tx mod 128 is large; parity vs the XLA shift pins it."""
    H = W = frame
    ov = w // 2
    fr = rng.integers(0, 255, (H, W)).astype(np.float32)
    n_rows = (H - w) // (w - ov) + 1
    n_cols = (W - w) // (w - ov) + 1
    N = n_rows * n_cols
    # shift magnitudes chosen to push tx mod 128 through all phases
    vx = rng.uniform(-w / 4, w / 4, N).astype(np.float32)
    vy = rng.uniform(-w / 4, w / 4, N).astype(np.float32)
    r0, c0 = per_window_origins((H, W), w, ov)
    ref = np.asarray(cws_shift(jnp.asarray(fr), jnp.asarray(r0),
                               jnp.asarray(c0), w, jnp.asarray(vx),
                               jnp.asarray(vy)))
    out = np.asarray(shift_windows_pallas(
        jnp.asarray(fr), jnp.asarray(vx), jnp.asarray(vy),
        frame_shape=(H, W), wind_size=w, overlap=ov, interpret=True))
    assert np.abs(out - ref).max() < 0.05


def test_def_kernel_at_tile_limit(rng):
    """DEF at the exact T=129 tile limit (w=124, M=2, bilinear) and the
    bicubic T=128 case (w=120, M=2): the widest tiles the guard admits
    must still match the XLA dense path (no lane wrap)."""
    from torchpiv_tpu.kernels.def_pallas import def_windows_pallas
    from torchpiv_tpu.ops.shifts import bicubic_cws_shift

    H = W = 372
    for w, interp in ((124, "bilinear"), (120, "bicubic")):
        ov = w // 2
        step = w - ov
        fr = rng.integers(0, 255, (H, W)).astype(np.float32)
        n_rows = (H - w) // step + 1
        n_cols = (W - w) // step + 1
        N = n_rows * n_cols
        vx = rng.uniform(-3, 3, N).astype(np.float32)
        vy = rng.uniform(-3, 3, N).astype(np.float32)
        zero = np.zeros(N, np.float32)
        out = np.asarray(def_windows_pallas(
            jnp.asarray(fr), jnp.asarray(vx), jnp.asarray(vy),
            jnp.asarray(zero), jnp.asarray(zero), jnp.asarray(zero),
            jnp.asarray(zero),
            frame_shape=(H, W), wind_size=w, overlap=ov, margin=2,
            interp=interp, interpret=True))
        # zero gradients -> DEF == plain per-window shift
        r0, c0 = per_window_origins((H, W), w, ov)
        resample = (bicubic_cws_shift if interp == "bicubic" else cws_shift)
        ref = np.asarray(resample(jnp.asarray(fr), jnp.asarray(r0),
                                  jnp.asarray(c0), w, jnp.asarray(vx),
                                  jnp.asarray(vy)))
        assert np.abs(out - ref).max() < 0.05, interp
