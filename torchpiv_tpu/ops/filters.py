"""Shared separable image filters (full-precision convs).

One implementation for every sub-pixel-sensitive blur in the package —
the particle detector's matched filter and the dense-LK anti-alias /
solve smoothing both use it.  TPU convs default to bf16 accumulation,
which is NOT acceptable upstream of 3-point Gaussian fits or LK
gradients, so the convs force ``precision="highest"``.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from jax import lax


def gaussian_blur(x: jnp.ndarray, sigma: float,
                  truncate: float = 3.0) -> jnp.ndarray:
    """Separable 'SAME' Gaussian blur of a 2-D float frame; the kernel
    extends to ``ceil(truncate * sigma)`` pixels each side."""
    r = max(1, int(math.ceil(truncate * sigma)))
    span = np.arange(-r, r + 1, dtype=np.float32)
    k = np.exp(-(span**2) / (2.0 * sigma * sigma))
    k = jnp.asarray(k / k.sum())
    y = x[None, None]  # NCHW
    y = lax.conv_general_dilated(y, k.reshape(1, 1, 1, -1), (1, 1), "SAME",
                                 precision="highest")
    y = lax.conv_general_dilated(y, k.reshape(1, 1, -1, 1), (1, 1), "SAME",
                                 precision="highest")
    return y[0, 0]
