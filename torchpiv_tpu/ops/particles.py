"""Particle detection for PTV (particle tracking velocimetry).

Beyond the reference (pure correlation PIV): individual particle images
are located to sub-pixel accuracy so scattered per-particle vectors can
be tracked (models/ptv.py).  TPU-native formulation: a separable
Gaussian matched filter (two tiny convs), max-pool non-maximum
suppression, and ``lax.top_k`` — all static shapes (a fixed particle
capacity with a validity mask instead of a data-dependent count), so the
whole detector jits and fuses.

The matched filter (Crocker & Grier, J. Colloid Interface Sci. 179
(1996) use the same structure) is what makes saturated particles
detectable: a clipped plateau becomes a smooth dome with a unique
maximum, and localisation under noise improves at the same time.

Sub-pixel refinement uses the same 3-point log-Gaussian fit as the
correlation peak fit (ops/peakfit.py; reference PIVbackend.py:399-407),
applied to the filtered response — Gaussian (*) Gaussian stays Gaussian,
so the fit remains unbiased for symmetric particles.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _gaussian_blur(f: jnp.ndarray, sigma: float) -> jnp.ndarray:
    from .filters import gaussian_blur

    return gaussian_blur(f, sigma, truncate=3.0)


@partial(jax.jit,
         static_argnames=("max_particles", "min_distance", "smooth_sigma"))
def detect_particles(
    frame: jnp.ndarray,
    max_particles: int = 4096,
    min_distance: int = 3,
    threshold: Optional[jnp.ndarray] = None,
    n_sigma: float = 4.0,
    smooth_sigma: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Locate bright particle images in a 2-D frame.

    Returns ``(xs, ys, response, valid)``, each ``[max_particles]``,
    brightest-response first; ``valid`` marks real detections (False
    entries are padding — static shapes for jit).  ``min_distance``:
    minimum pixel separation between detections (non-maximum-suppression
    window).  ``threshold``: absolute floor on the FILTERED response;
    default ``mean + n_sigma * std`` of the response (robust for sparse
    particles on a dark background).  ``smooth_sigma``: matched-filter
    width in px — set to ~particle_diameter/2.35 for best SNR.
    Positions are sub-pixel (3-point Gaussian fit per axis, clamped to
    the frame interior at the borders).
    """
    f = _gaussian_blur(frame.astype(jnp.float32), smooth_sigma)
    H, W = f.shape
    thr = (f.mean() + n_sigma * f.std()) if threshold is None else threshold

    win = 2 * min_distance + 1
    pooled = lax.reduce_window(f, -jnp.inf, lax.max, (win, win), (1, 1),
                               "SAME")
    # a flat window (constant/blank frame, dead sensor region) ties the
    # max everywhere — require genuine local contrast, not just a tie
    pooled_min = lax.reduce_window(f, jnp.inf, lax.min, (win, win), (1, 1),
                                   "SAME")
    is_peak = (f == pooled) & (f >= thr) & (pooled > pooled_min)

    score = jnp.where(is_peak, f, -jnp.inf).ravel()
    vals, idx = lax.top_k(score, max_particles)
    valid = jnp.isfinite(vals)
    ys = idx // W
    xs = idx % W

    # 3-point log-Gaussian sub-pixel fit per axis (clamped at borders:
    # edge particles fit on the nearest interior 3-pixel stencil).
    yc = jnp.clip(ys, 1, H - 2)
    xc = jnp.clip(xs, 1, W - 2)
    eps = jnp.float32(1e-6)
    lc = jnp.log(jnp.maximum(f[yc, xc], eps))
    ll = jnp.log(jnp.maximum(f[yc, xc - 1], eps))
    lr = jnp.log(jnp.maximum(f[yc, xc + 1], eps))
    lu = jnp.log(jnp.maximum(f[yc - 1, xc], eps))
    ld = jnp.log(jnp.maximum(f[yc + 1, xc], eps))

    def _delta(lo, hi, c):
        den = 2.0 * (lo + hi - 2.0 * c)
        # degenerate (flat) stencils fall back to the integer peak
        return jnp.where(jnp.abs(den) > 1e-12, (lo - hi) / den, 0.0)

    dx = jnp.clip(_delta(ll, lr, lc), -1.0, 1.0)
    dy = jnp.clip(_delta(lu, ld, lc), -1.0, 1.0)
    return (xc + dx, yc + dy, f[yc, xc], valid)
