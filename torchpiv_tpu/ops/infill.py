"""Outlier infill: border interpolation + hole filling.

Two implementations of the reference's invalid-vector infill tail
(/root/reference/src/torchPIV/PIVbackend.py:266-344):

* ``interpolate_borders`` + ``fill_missing_values`` — exact host (numpy/scipy)
  mirror: 1-D linear interpolation along each field border, then Delaunay
  linear interpolation (``LinearNDInterpolator``) fitted only on the valid
  pixels bordering holes (3x3-cross dilation of the NaN mask), aborting when
  more than half the field is invalid.

* ``fused_infill`` — an in-graph XLA equivalent for the fully-fused device
  path: iterative masked 4-neighbour Jacobi fill (converges to the discrete
  Laplace interpolant of the holes).  Differs from Delaunay interpolation at
  the 1e-2 level on filled (already invalid) vectors, which is why the exact
  host version remains the default for parity-sensitive use.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_CROSS = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=bool)


def interpolate_borders(vec: np.ndarray) -> np.ndarray:
    """1-D linear infill of NaNs along the four field borders (host).

    Ensures the hole-fill triangulation has a convex hull covering the field
    edges.  Mirrors reference ``interpolate_boarders`` (PIVbackend.py:328-344);
    a border that is entirely NaN is left untouched.
    """
    if not np.isnan(vec).any():
        return vec
    for row in (vec[0, :], vec[-1, :]):
        nans = np.isnan(row)
        if not nans.all():
            row[nans] = np.interp(np.nonzero(nans)[0], np.nonzero(~nans)[0], row[~nans])
    for col in (vec[:, 0], vec[:, -1]):
        nans = np.isnan(col)
        if not nans.all():
            col[nans] = np.interp(np.nonzero(nans)[0], np.nonzero(~nans)[0], col[~nans])
    return vec


def fill_missing_values(field: np.ndarray) -> Optional[np.ndarray]:
    """Delaunay-linear infill of NaN holes (host). ``None`` if >half invalid.

    Mirrors reference ``fillMissingValues``/``getPixelsForInterp``
    (PIVbackend.py:266-308): fit only on valid pixels adjacent to holes
    (cross-shaped 3x3 dilation — cv2 MORPH_ELLIPSE(3,3) is a cross), keep the
    reference's abort condition verbatim (``points.size < mask.size / 2``
    compares *coordinate count*, i.e. 2x the point count, against half the
    field — a reference quirk preserved for parity).
    """
    from scipy import ndimage
    from scipy.interpolate import LinearNDInterpolator

    invalid = np.isnan(field)
    if not invalid.any():
        # Nothing to fill.  (The reference would feed an empty point set to
        # LinearNDInterpolator here, raise, and silently skip the whole pair
        # — a latent bug never hit on real data, not reproduced.)
        return field
    dilated = ndimage.binary_dilation(invalid, structure=_CROSS)
    border = dilated & ~invalid

    points = np.argwhere(border)
    values = field[border]
    if points.size < border.size / 2:
        try:
            interp = LinearNDInterpolator(points, values)
            field[invalid] = interp(np.argwhere(invalid))
        except Exception:
            return None
    else:
        return None
    return field


def fused_infill(
    field: jnp.ndarray, invalid: jnp.ndarray, iters: Optional[int] = None
) -> jnp.ndarray:
    """In-graph hole fill: masked 4-neighbour Jacobi relaxation.

    ``field``: 2-D values, ``invalid``: bool mask of holes.  Valid values are
    held fixed; holes relax to the harmonic (discrete Laplace) interpolant,
    seeded by a zero-order sweep.  Runs entirely on device under jit.
    """
    rows, cols = field.shape
    if iters is None:
        iters = rows + cols  # enough sweeps for information to cross the field

    valid = ~invalid
    f = jnp.where(valid, field, 0.0)
    w = valid.astype(field.dtype)

    def shift4(x):
        # Up/down/left/right neighbours, zero-padded at the edges.
        return (
            jnp.pad(x, ((1, 0), (0, 0)))[:-1],
            jnp.pad(x, ((0, 1), (0, 0)))[1:],
            jnp.pad(x, ((0, 0), (1, 0)))[:, :-1],
            jnp.pad(x, ((0, 0), (0, 1)))[:, 1:],
        )

    def body(_, carry):
        # Jacobi relaxation on holes with the valid cells as Dirichlet data.
        x, m = carry
        s = sum(shift4(x * m))
        c = sum(shift4(m))
        avg = s / jnp.maximum(c, 1.0)
        upd = (~valid) & (c > 0.0)
        x = jnp.where(valid, f, jnp.where(upd, avg, x))
        m = jnp.where(valid | upd, 1.0, m)
        return x, m

    x, _ = jax.lax.fori_loop(0, iters, body, (f, w))
    return jnp.where(valid, field, x)
