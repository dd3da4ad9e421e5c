"""Interrogation-window extraction.

The reference builds a zero-copy strided view ``[N, win, win]`` over the frame
(torch ``as_strided``, PIVbackend.py:220-247).  JAX/XLA has no strided views;
the TPU-native equivalent is a single structured gather driven by static index
vectors, which XLA lowers to an efficient HBM-bandwidth-bound copy.  When the
stride divides the window (the common 50%-overlap case) we instead assemble
the window tensor from ``overlap_factor**2`` cheap reshapes of contiguous
slices — no gather at all.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .geometry import get_field_shape, window_origins


def window_index_1d(
    image_size: Tuple[int, int], wind_size: int, overlap: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Static per-axis pixel indices of every window.

    Returns ``iy`` of shape ``(n_rows, win)`` and ``ix`` of shape
    ``(n_cols, win)``: ``iy[r, p]`` is the frame row of pixel-row ``p`` of
    window-row ``r``.
    """
    row0, col0 = window_origins(image_size, wind_size, overlap)
    w = np.arange(wind_size, dtype=np.int32)
    return row0[:, None] + w[None, :], col0[:, None] + w[None, :]


def extract_windows(
    frame: jnp.ndarray, wind_size: int, overlap: int, variant: str = "stack"
) -> jnp.ndarray:
    """Extract all interrogation windows from a 2-D frame.

    Equivalent of reference ``moving_window_array`` (PIVbackend.py:220-247):
    returns ``[n_rows * n_cols, win, win]`` in row-major window order.

    ``variant`` (divisible-stride path only; both bit-identical):

    * ``"stack"`` — assemble ``(n_rows, win, n_cols, win)`` from f**2
      contiguous reshapes, then one big transpose of the WINDOW tensor to
      ``(n_rows, n_cols, win, win)`` (~4x the frame bytes at 50% overlap:
      the measured ~0.29 ms/frame pass-1 cost at 4 MP, docs/ROADMAP.md).
    * ``"tilemajor"`` — transpose the FRAME to tile-major
      ``(rows/step, cols/step, step, step)`` first (1x the frame bytes),
      then stack directly into ``(n_rows, n_cols, dr, p, dc, q)`` whose
      row-major reshape IS window order — no window-tensor transpose.
    """
    H, W = frame.shape[-2], frame.shape[-1]
    n_rows, n_cols = get_field_shape((H, W), wind_size, overlap)
    step = wind_size - overlap

    if wind_size % step == 0:
        # Stride divides window: build from contiguous reshapes (no gather).
        f = wind_size // step  # overlap factor (2 for 50% overlap)
        Hc = (n_rows - 1 + f) * step  # pixels actually covered by windows
        Wc = (n_cols - 1 + f) * step
        tiles = frame[..., :Hc, :Wc]
        tiles = tiles.reshape(*frame.shape[:-2], Hc // step, step, Wc // step, step)
        if variant == "tilemajor":
            # (.., Hc/step, Wc/step, step, step): pay the transpose on the
            # frame-sized tile tensor instead of the window tensor
            tm = jnp.swapaxes(tiles, -3, -2)
            parts = []
            for dr in range(f):
                row_parts = [
                    tm[..., dr : dr + n_rows, dc : dc + n_cols, :, :]
                    for dc in range(f)
                ]
                # (.., n_rows, n_cols, step[p], f[dc], step[q])
                parts.append(jnp.stack(row_parts, axis=-2))
            # (.., n_rows, n_cols, f[dr], step[p], f[dc], step[q])
            blk = jnp.stack(parts, axis=-4)
            return blk.reshape(
                *frame.shape[:-2], n_rows * n_cols, wind_size, wind_size)
        # windows[r, c] = tiles[r : r + f, :, c : c + f, :]
        parts = []
        for dr in range(f):
            row_parts = []
            for dc in range(f):
                t = tiles[..., dr : dr + n_rows, :, dc : dc + n_cols, :]
                row_parts.append(t)
            parts.append(jnp.stack(row_parts, axis=-2))  # (.., n_rows, step, n_cols, f, step)
        blk = jnp.stack(parts, axis=-5)  # (.., n_rows, f, step, n_cols, f, step)
        out = blk.reshape(*frame.shape[:-2], n_rows, wind_size, n_cols, wind_size)
        out = jnp.swapaxes(out, -3, -2)  # (.., n_rows, n_cols, win, win)
        return out.reshape(*frame.shape[:-2], n_rows * n_cols, wind_size, wind_size)

    iy, ix = window_index_1d((H, W), wind_size, overlap)
    # One XLA gather: frame[iy[r,p], ix[c,q]] -> (n_rows, n_cols, win, win)
    out = frame[..., iy[:, None, :, None], ix[None, :, None, :]]
    return out.reshape(*frame.shape[:-2], n_rows * n_cols, wind_size, wind_size)


def flat_window_grid(
    image_size: Tuple[int, int], wind_size: int, overlap: int
) -> np.ndarray:
    """Flattened-frame pixel index of each window pixel: ``[N, win, win]`` int32.

    Static equivalent of the reference's precomputed ``idx`` grid
    (PIVbackend.py:684-687) used by the CWS/DWS shift gathers.
    """
    H, W = int(image_size[-2]), int(image_size[-1])
    iy, ix = window_index_1d((H, W), wind_size, overlap)
    n_rows, n_cols = iy.shape[0], ix.shape[0]
    flat = (
        iy[:, None, :, None].astype(np.int64) * W
        + ix[None, :, None, :].astype(np.int64)
    )
    return flat.reshape(n_rows * n_cols, wind_size, wind_size).astype(np.int32)
