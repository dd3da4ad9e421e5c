"""Parity tests for Pallas kernels vs their XLA reference ops.

On CPU the kernels run in interpreter mode — same program, same semantics,
no Mosaic compile.  The TPU-compiled path is exercised by bench/verify runs
on hardware.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

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
        from torchpiv_tpu.kernels.peakfit_pallas import (
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
        from torchpiv_tpu.kernels.peakfit_pallas import (
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
