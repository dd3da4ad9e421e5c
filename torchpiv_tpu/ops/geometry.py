"""Interrogation-grid geometry.

Host-side (numpy, trace-time) helpers that define where interrogation windows
sit inside a frame.  Semantics mirror the reference engine
(/root/reference/src/torchPIV/PIVbackend.py:425-456 ``get_field_shape`` and
:522-597 ``get_coordinates``): windows of size ``wind_size`` tile the frame
with stride ``wind_size - overlap``; window-center coordinates are shifted by
an integer offset so the margins on both sides of the frame are (as close as
possible to) symmetric.

These run at trace/setup time only — everything they produce is a static
constant baked into the jitted XLA graph.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def get_field_shape(
    image_size: Tuple[int, int], wind_size: int, overlap: int
) -> Tuple[int, int]:
    """Number of interrogation-window rows/cols for a frame.

    ``(image - wind) // (wind - overlap) + 1`` per axis, as in the reference
    (PIVbackend.py:453-456).
    """
    rows = (int(image_size[-2]) - wind_size) // (wind_size - overlap) + 1
    cols = (int(image_size[-1]) - wind_size) // (wind_size - overlap) + 1
    return rows, cols


def get_coordinates(
    image_size: Tuple[int, int], wind_size: int, overlap: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Pixel coordinates of window centers (image coords, origin top-left).

    Returns ``(x, y)`` 2-D meshgrid arrays of shape ``(n_rows, n_cols)``.
    Mirrors reference PIVbackend.py:522-597 including the integer centering
    offset that equalises left/right (top/bottom) margins.
    """
    n_rows, n_cols = get_field_shape(image_size, wind_size, overlap)
    step = wind_size - overlap

    x = np.arange(n_cols, dtype=np.int32) * step + wind_size / 2.0
    y = np.arange(n_rows, dtype=np.int32) * step + wind_size / 2.0

    # Integer shift toward the frame center so extreme windows keep equal
    # distance from the frame edges (reference :582-592).
    x += (image_size[-1] - 1 - ((n_cols - 1) * step + (wind_size - 1))) // 2
    y += (image_size[-2] - 1 - ((n_rows - 1) * step + (wind_size - 1))) // 2

    return np.meshgrid(x, y)


def window_origins(
    image_size: Tuple[int, int], wind_size: int, overlap: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-left pixel (row0, col0) of every window row/col.

    The reference extracts windows starting at multiples of the stride from
    pixel (0, 0) (``moving_window_array``, PIVbackend.py:220-247) — note the
    window *origins* are NOT centered, only the reported coordinates are.
    """
    n_rows, n_cols = get_field_shape(image_size, wind_size, overlap)
    step = wind_size - overlap
    row0 = np.arange(n_rows, dtype=np.int32) * step
    col0 = np.arange(n_cols, dtype=np.int32) * step
    return row0, col0
