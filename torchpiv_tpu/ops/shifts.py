"""Window shifting for iterative refinement (CWS / DWS).

Each interrogation window is resampled from the full frame at positions
shifted by (half of) the predictor velocity of that window — continuous
(bilinear, CWS) or integer (nearest, DWS).  Both are single structured XLA
gathers from the flattened frame, mirroring the reference's index-shift +
``torch.gather`` trick (/root/reference/src/torchPIV/PIVbackend.py:147-216),
including its quirks:

* indices are clamped on the *flattened* frame (``[0, H*W-1]``), so
  out-of-frame samples wrap to the previous/next image row rather than
  clamping per-axis (reference :177-180, :214);
* windows whose shift is integer in *either* axis fall back to the
  floor-corner sample (reference ``mask`` at :170, :193).

The pixel index grids are built in-graph from tiny static per-window origin
vectors, so no multi-megabyte index constants are baked into the executable.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .geometry import window_origins


def per_window_origins(
    image_size: Tuple[int, int], wind_size: int, overlap: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Flat ``[N]`` top-left (row, col) of every window, row-major."""
    row0, col0 = window_origins(image_size, wind_size, overlap)
    r = np.repeat(row0, len(col0))
    c = np.tile(col0, len(row0))
    return r.astype(np.int32), c.astype(np.int32)


def _window_pixel_grids(row0w, col0w, wind_size, dtype=jnp.int32):
    """In-graph ``[N, w, w]`` per-pixel (row, col) grids from ``[N]`` origins."""
    ar = jnp.arange(wind_size, dtype=dtype)
    gy = row0w[:, None, None].astype(dtype) + ar[None, :, None]
    gx = col0w[:, None, None].astype(dtype) + ar[None, None, :]
    return gy, gx


def cws_shift(
    frame: jnp.ndarray,
    row0w: jnp.ndarray,
    col0w: jnp.ndarray,
    wind_size: int,
    vel_x: jnp.ndarray,
    vel_y: jnp.ndarray,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Continuous window shift: bilinear resample of each window.

    Args:
      frame: 2-D frame (any integer/float dtype).
      row0w, col0w: ``[N]`` static window origins (``per_window_origins``).
      vel_x, vel_y: ``[N]`` per-window shift in pixels (float), or
        ``[N, w, w]`` per-PIXEL shifts (window-deformation mode).

    Returns ``[N, w, w]`` float windows.  Mirrors reference
    ``biliniar_interpolation_CWS`` (PIVbackend.py:147-194).
    """
    H, W = frame.shape[-2], frame.shape[-1]
    numel = H * W
    flat = frame.reshape(-1)

    gy, gx = _window_pixel_grids(row0w, col0w, wind_size)
    if vel_x.ndim == 1:
        vel_x = vel_x[:, None, None]
        vel_y = vel_y[:, None, None]
    new_y = gy.astype(dtype) + vel_y.astype(dtype)
    new_x = gx.astype(dtype) + vel_x.astype(dtype)

    up_x = jnp.ceil(new_x).astype(jnp.int32)
    up_y = jnp.ceil(new_y).astype(jnp.int32)
    down_x = jnp.floor(new_x).astype(jnp.int32)
    down_y = jnp.floor(new_y).astype(jnp.int32)
    # Integer shift in either axis -> degenerate cell -> floor-corner fallback.
    integer_cell = (up_x - down_x) * (up_y - down_y) == 0

    def flat_gather(y, x):
        idx = jnp.clip(y * W + x, 0, numel - 1)
        return jnp.take(flat, idx).astype(dtype)

    f11 = flat_gather(down_y, down_x)
    f21 = flat_gather(down_y, up_x)
    f12 = flat_gather(up_y, down_x)
    f22 = flat_gather(up_y, up_x)

    ux, uy = up_x.astype(dtype), up_y.astype(dtype)
    dx, dy = down_x.astype(dtype), down_y.astype(dtype)
    f = (
        f11 * (ux - new_x) * (uy - new_y)
        + f21 * (new_x - dx) * (uy - new_y)
        + f12 * (ux - new_x) * (new_y - dy)
        + f22 * (new_x - dx) * (new_y - dy)
    )
    return jnp.where(integer_cell, f11, f)


def bicubic_cws_shift(
    frame: jnp.ndarray,
    row0w: jnp.ndarray,
    col0w: jnp.ndarray,
    wind_size: int,
    vel_x: jnp.ndarray,
    vel_y: jnp.ndarray,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Continuous window shift with bicubic (cubic-convolution, a = -0.5)
    resampling — the algorithmic capability of the reference's dead
    ``piv_iteration_CWS_Fast`` (PIVbackend.py:599-675, bicubic
    ``grid_sample``), provided here as a live option
    (``PIVConfig.cws_interp="bicubic"``).

    Same flat-index clamped addressing as ``cws_shift`` at the frame edges;
    integer shifts reduce exactly to the integer sample (the cubic weights
    collapse to (0, 1, 0, 0)).  16 structured gathers — quality mode, not
    the fast path.
    """
    H, W = frame.shape[-2], frame.shape[-1]
    numel = H * W
    flat = frame.reshape(-1)

    gy, gx = _window_pixel_grids(row0w, col0w, wind_size)
    if vel_x.ndim == 1:
        vel_x = vel_x[:, None, None]
        vel_y = vel_y[:, None, None]
    new_y = gy.astype(dtype) + vel_y.astype(dtype)
    new_x = gx.astype(dtype) + vel_x.astype(dtype)
    fy = jnp.floor(new_y)
    fx = jnp.floor(new_x)
    ty = new_y - fy
    tx = new_x - fx
    iy = fy.astype(jnp.int32)
    ix = fx.astype(jnp.int32)

    def cubic_weights(t):
        # cubic convolution kernel, a = -0.5 (Keys / torch grid_sample)
        a = -0.5
        d0 = t + 1.0  # |d| in (1, 2)
        d1 = t        # |d| in [0, 1)
        d2 = 1.0 - t
        d3 = 2.0 - t
        w0 = a * d0**3 - 5 * a * d0**2 + 8 * a * d0 - 4 * a
        w1 = (a + 2) * d1**3 - (a + 3) * d1**2 + 1.0
        w2 = (a + 2) * d2**3 - (a + 3) * d2**2 + 1.0
        w3 = a * d3**3 - 5 * a * d3**2 + 8 * a * d3 - 4 * a
        return (w0, w1, w2, w3)

    wy = cubic_weights(ty)
    wx = cubic_weights(tx)

    out = jnp.zeros(new_x.shape, dtype)
    for j, wyj in enumerate(wy):
        idx_row = (iy + (j - 1)) * W
        acc = jnp.zeros(new_x.shape, dtype)
        for i, wxi in enumerate(wx):
            idx = jnp.clip(idx_row + ix + (i - 1), 0, numel - 1)
            acc = acc + wxi * jnp.take(flat, idx).astype(dtype)
        out = out + wyj * acc
    return out


def dws_shift(
    frame: jnp.ndarray,
    row0w: jnp.ndarray,
    col0w: jnp.ndarray,
    wind_size: int,
    vel_x: jnp.ndarray,
    vel_y: jnp.ndarray,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Discrete (integer) window shift: nearest gather of each window.

    ``vel_x, vel_y``: ``[N]`` integer shifts.  Mirrors reference
    ``interpolation_DWS`` (PIVbackend.py:197-216); output cast to float for
    the FFT (torch promotes uint8 windows to float32 inside ``rfft2``).
    """
    H, W = frame.shape[-2], frame.shape[-1]
    numel = H * W
    flat = frame.reshape(-1)
    gy, gx = _window_pixel_grids(row0w, col0w, wind_size)
    idx = (
        (gy + vel_y[:, None, None].astype(jnp.int32)) * W
        + gx
        + vel_x[:, None, None].astype(jnp.int32)
    )
    idx = jnp.clip(idx, 0, numel - 1)
    return jnp.take(flat, idx).astype(dtype)
