"""Sub-pixel peak location + peak-ratio validation (XLA reference path).

Converts a batch of correlation maps ``[N, d, k]`` into signed sub-pixel
displacements via argmax + 3-point log-Gaussian (log-parabola) fit, and
optionally validates each window by the first-peak/second-peak ratio.

Semantics mirror the reference ``correlation_to_displacement`` and
``peak2peak_secondpeak`` (/root/reference/src/torchPIV/PIVbackend.py:346-422)
including their flat-index edge behaviour:

* neighbour indices are taken on the *flattened* map, so at map edges the
  "left/right" neighbours wrap across rows; indices beyond the ends are
  replaced by the peak index itself (reference :385-392);
* the second-peak search zeroes a ``(2*w+1)**2`` neighbourhood around the
  first peak *by flat index with clamping* (so it too wraps at edges,
  reference :346-358) and the second-peak *value* is read from the un-zeroed
  map at the second-peak index (reference :410-411);
* the peak row is decomposed as ``m // d`` / ``m % k`` — valid because
  correlation maps are always square here (reference :404 relies on this);
* fit NaN/Inf are flushed with ``nan_to_num`` (reference :418-419).

Beyond the reference, ``return_second=True`` additionally fits the SECOND
correlation peak (the argmax over the exclusion-masked map) with the same
estimator — the candidate displacement used by secondary-peak substitution
(``PIVConfig.second_peak_fallback``), a standard production-PIV recovery
step the reference lacks.

A fused Pallas version of this op lives in ``torchpiv_tpu.kernels``; this XLA
version is the semantic reference and the fallback on non-TPU backends.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-7


def correlation_to_displacement(
    corr: jnp.ndarray,
    validate: bool = True,
    val_ratio: float = 1.2,
    validation_window: int = 3,
    min_subtract: bool = False,
    fit: str = "gauss3",
    return_second: bool = False,
):
    """Batched sub-pixel displacement from correlation maps.

    Args:
      corr: ``[N, d, k]`` min-subtracted correlation maps (d == k) — or RAW
        maps with ``min_subtract=True``, in which case the per-window min
        handling happens here on scalars: the argmax is invariant to the
        per-window constant, so the big map tensor makes fewer HBM passes
        than a separate ``ops.min_subtract`` (semantically identical).
      validate: compute the peak-ratio validation mask.
      val_ratio: windows with ``first_peak / second_peak < val_ratio`` are
        flagged invalid (reference default 1.2).
      validation_window: half-width of the neighbourhood excluded around the
        first peak when searching for the second (reference passes 3).
      fit: "gauss3" (reference parity: two independent 3-point log-Gaussian
        axis fits) or "gauss2d" (9-point log-paraboloid least squares —
        models the cross term, reducing the sub-pixel bias on
        elliptical/tilted correlation peaks; beyond the reference).
      return_second: also fit the second peak (requires ``validate=True``,
        which builds the exclusion set) and return its displacement as a
        candidate for secondary-peak substitution.

    Returns:
      ``(u, v, invalid)``: flat ``[N]`` signed displacements in pixels
      (center = fftshift origin) and a ``[N]`` bool mask of *invalid* windows
      (or ``None`` when ``validate`` is False).  With ``return_second``,
      ``(u, v, invalid, (u2, v2))`` where ``(u2, v2)`` is the second-peak
      displacement fit with the same estimator.
    """
    if return_second and not validate:
        raise ValueError("return_second requires validate=True (the second "
                         "peak is located via the validation exclusion set)")
    n, d, k = corr.shape
    kd = k * d
    fdt = corr.dtype

    flat = corr.reshape(n, kd)
    if min_subtract:
        mn = jnp.min(flat, axis=-1)
        shift = jnp.asarray(EPS, fdt) - mn  # value adjustment per window
    else:
        shift = jnp.asarray(EPS, fdt)
    m = jnp.argmax(flat, axis=-1).astype(jnp.int32)

    # Value extraction via one-hot masked sums instead of take_along_axis:
    # a sum whose mask selects exactly one element IS that element (exact in
    # f32 — adding zeros is lossless), and XLA sibling-fuses the five
    # reductions into ONE pass over the map tensor, where five row gathers
    # cost ~0.16 ms each on TPU (trace-attributed; a contiguous 3-element
    # lax.gather patch measured 4x worse still — see docs/ROADMAP.md).
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, kd), 1)

    def take(idx):
        return jnp.sum(jnp.where(pos == idx[:, None], flat, 0), axis=-1) + shift

    def fit_at(mi):
        """Sub-pixel fit around flat argmax index ``mi`` with the
        reference's flat-index edge replacement (:385-392).  Returns
        ``(u, v, cm, edges)`` — peak value and edge-neighbour indices are
        reused by the validation branch for the primary peak."""
        left = jnp.where(mi + 1 >= kd - 1, mi, mi + 1)
        right = jnp.where(mi - 1 <= 0, mi, mi - 1)
        top = jnp.where(mi + k >= kd - 1, mi, mi + k)
        bot = jnp.where(mi - k <= 0, mi, mi - k)

        cm, cl, cr, ct, cb = (take(mi), take(left), take(right), take(top),
                              take(bot))
        lcm, lcl, lcr, lct, lcb = (jnp.log(c)
                                   for c in (cm, cl, cr, ct, cb))

        if fit == "gauss2d":
            # 9-point log-paraboloid least squares (beyond the reference):
            # log I = a + b x + c y + d x^2 + e y^2 + f xy over the 3x3
            # neighbourhood; the peak is the stationary point.  Orthogonal-
            # polynomial closed form on the {-1,0,1}^2 grid:
            #   b = Sx/6, c = Sy/6, f = Sxy/4,
            #   d = (Sxx - 2/3 S)/2, e = (Syy - 2/3 S)/2.
            # Diagonal neighbours reuse the flat-index edge replacement of
            # the axis neighbours (the same clamp-to-peak rule).
            def clampi(idx):
                return jnp.where((idx <= 0) | (idx >= kd - 1), mi, idx)

            ctl = jnp.log(take(clampi(mi - k - 1)))
            ctr = jnp.log(take(clampi(mi - k + 1)))
            cbl = jnp.log(take(clampi(mi + k - 1)))
            cbr = jnp.log(take(clampi(mi + k + 1)))
            # grid orientation: +x = +col = "left" (mi+1), +y = +row =
            # "top" (mi+k) — matching the axis-fit sign conventions below.
            S = lcm + lcl + lcr + lct + lcb + ctl + ctr + cbl + cbr
            Sx = lcl - lcr + cbr - cbl + ctr - ctl
            Sy = lct - lcb + cbl + cbr - ctl - ctr
            Sxy = cbr - cbl - ctr + ctl
            Sxx = lcl + lcr + ctl + ctr + cbl + cbr
            Syy = lct + lcb + ctl + ctr + cbl + cbr
            b = Sx / 6.0
            c_ = Sy / 6.0
            f_ = Sxy / 4.0
            d2 = (Sxx - 2.0 / 3.0 * S) / 2.0
            e2 = (Syy - 2.0 / 3.0 * S) / 2.0
            det = 4.0 * d2 * e2 - f_ * f_
            du = (f_ * c_ - 2.0 * e2 * b) / det
            dv = (f_ * b - 2.0 * d2 * c_) / det
            # fall back to the 3-point fit where the paraboloid is
            # degenerate or the offset leaves the pixel cell (flat/noisy)
            du3 = (lcr - lcl) / (2.0 * (lcl + lcr) - 4.0 * lcm)
            dv3 = (lcb - lct) / (2.0 * (lcb + lct) - 4.0 * lcm)
            bad = (~jnp.isfinite(du)) | (~jnp.isfinite(dv)) \
                | (jnp.abs(du) > 1.0) | (jnp.abs(dv) > 1.0) | (det <= 0)
            du = jnp.where(bad, du3, du)
            dv = jnp.where(bad, dv3, dv)
        else:
            # 3-point Gaussian fit on log intensities (reference :399-407).
            du = (lcr - lcl) / (2.0 * (lcl + lcr) - 4.0 * lcm)
            dv = (lcb - lct) / (2.0 * (lcb + lct) - 4.0 * lcm)

        row = (mi // d).astype(fdt)  # maps are square (d == k), see module
        col = (mi % k).astype(fdt)   # docstring
        u = jnp.nan_to_num(col + du - (k // 2))
        v = jnp.nan_to_num(row + dv - (d // 2))
        return u, v, cm, (left, right, top, bot)

    u, v, cm, (left, right, top, bot) = fit_at(m)

    invalid = None
    second = None
    if validate:
        w = validation_window
        # Second peak = max over the map with the (2w+1)^2 flat-offset
        # neighbourhood of the first peak excluded.  The reference scatters
        # zeros at clamp(m + i + k*j) and re-argmaxes (:346-358); a scatter
        # lowers poorly on TPU, so build the same exclusion set in closed
        # form: flat position p is excluded iff off = p - m decomposes as
        # i + k*j with |i|,|j| <= w, i.e. j = rint(off/k) in range and
        # |off - k*j| <= w.  The clamp in the reference additionally
        # collapses out-of-range offsets onto flat index 0 or kd-1.
        off = pos - m[:, None]
        j = jnp.round(off.astype(fdt) / k).astype(jnp.int32)
        excl = (jnp.abs(j) <= w) & (jnp.abs(off - k * j) <= w)
        # clamp targets: offsets that fall off the ends zero index 0 / kd-1
        lo_clamped = (m - (w + k * w)) < 0
        hi_clamped = (m + (w + k * w)) > kd - 1
        excl = excl.at[:, 0].set(excl[:, 0] | lo_clamped)
        excl = excl.at[:, kd - 1].set(excl[:, kd - 1] | hi_clamped)
        # Map values are >= EPS > 0 everywhere after the shift, so the max
        # over the zeroed map equals the max over the exclusion-masked map
        # (reference reads the value at the second argmax from the un-zeroed
        # map — identical because excluded positions never win the argmax).
        # The floor at 0 reproduces the all-excluded degenerate case.
        masked = jnp.where(excl, -jnp.inf, flat)
        c2 = jnp.maximum(jnp.max(masked, axis=-1) + shift, 0.0)
        invalid = (cm / c2) < val_ratio
        degenerate = (left >= kd - 1) & (right <= 0) & (top >= kd - 1) & (bot <= 0)
        invalid = invalid | degenerate
        if return_second:
            m2 = jnp.argmax(masked, axis=-1).astype(jnp.int32)
            u2, v2, _, _ = fit_at(m2)
            second = (u2, v2)

    if return_second:
        return u, v, invalid, second
    return u, v, invalid
