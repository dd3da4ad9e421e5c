"""Device-mesh construction helpers.

The reference is strictly single-device (PIVbackend.py:13-18, 845); the only
meaningful parallel axes in PIV are the *pair batch* (embarrassingly
parallel) and the *window grid* of one pair (model/"sequence" axis —
correlation and peak fit are per-window; only the spline predictor upsample
couples windows, handled with one tiny all_gather per pass).  See
``parallel.sharded``.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axes: Optional[Dict[str, int]] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a mesh over the available devices.

    ``axes`` maps axis name -> size (sizes must multiply to the device
    count); default is a 1-D ``{"pairs": n_devices}`` mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axes is None:
        axes = {"pairs": n}
    sizes = list(axes.values())
    need = int(np.prod(sizes))
    if need > n:
        raise ValueError(f"mesh axes {axes} need {need} devices, have {n}")
    dev_array = np.array(devices[:need]).reshape(sizes)
    return Mesh(dev_array, tuple(axes.keys()))


def default_piv_mesh(n_devices: Optional[int] = None) -> Mesh:
    """Two-axis mesh heuristic: mostly pairs-parallel, x2 window-parallel
    when the device count is even and > 2."""
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if n > 2 and n % 2 == 0:
        return make_mesh({"pairs": n // 2, "windows": 2}, devices)
    return make_mesh({"pairs": n}, devices)
