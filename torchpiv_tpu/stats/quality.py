"""Measurement-quality diagnostics (beyond the reference).

Standard PIV QC metrics the reference lacks entirely (its only quality
signal is the pass/fail peak-ratio mask, PIVbackend.py:408-415):

* **peak-locking degree** — bias of sub-pixel displacements toward integer
  pixel values, the classic symptom of undersized particle images
  (Christensen, Exp. Fluids 36 (2004): the fractional-displacement
  histogram should be uniform; a pile-up at 0/1 means locked vectors).
* **signal-to-noise map** — the per-window first/second correlation-peak
  ratio as a continuous field (the reference computes it only to threshold
  it; the map itself is the standard seeding/illumination diagnostic).

Both are host-side numpy (they run on final fields / small maps — nothing
here is a hot path).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def fractional_histogram(
    u: np.ndarray, bins: int = 20, mask: Optional[np.ndarray] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Histogram of the fractional parts of a displacement component.

    Returns ``(counts, edges)`` over ``frac(u) in [0, 1)``; ``mask`` marks
    vectors to EXCLUDE (e.g. the engine's invalid mask).
    """
    u = np.asarray(u, dtype=np.float64)
    if mask is not None:
        u = u[~np.asarray(mask, dtype=bool)]
    frac = np.mod(u.ravel(), 1.0)
    frac = frac[np.isfinite(frac)]
    return np.histogram(frac, bins=bins, range=(0.0, 1.0))


def peak_locking_degree(
    u: np.ndarray, bins: int = 20, mask: Optional[np.ndarray] = None
) -> float:
    """Degree of peak locking C in [0, 1] for one displacement component.

    ``C = (max(h) - min(h)) / max(h)`` over the fractional-displacement
    histogram h (Christensen 2004, eq. 1).  0 = uniform fractions (no
    locking); values above ~0.3 indicate biased sub-pixel fits (particle
    images too small for the 3-point Gaussian fit).
    """
    counts, _ = fractional_histogram(u, bins=bins, mask=mask)
    total = counts.sum()
    if total == 0:
        return 0.0
    h = counts.astype(np.float64) / total
    hi = float(h.max())
    if hi == 0.0:
        return 0.0
    return (hi - float(h.min())) / hi


def snr_map(
    frame_a,
    frame_b,
    wind_size: int,
    overlap: int,
    validation_window: int = 3,
) -> np.ndarray:
    """First-peak / second-peak correlation ratio per window, ``[R, C]``.

    The continuous form of the reference's validation quantity
    (``peak2peak_secondpeak``, PIVbackend.py:346-358, identical exclusion
    semantics): SNR ~ 1 means no dominant particle-pattern match (poor
    seeding, laser dropout, out-of-plane motion); production rules of
    thumb flag windows below ~1.3-2.
    """
    import jax
    import jax.numpy as jnp

    from ..ops.correlate import correlate_matmul
    from ..ops.geometry import get_field_shape
    from ..ops.peakfit import EPS
    from ..ops.windows import extract_windows

    H, W = np.asarray(frame_a).shape
    n_rows, n_cols = get_field_shape((H, W), wind_size, overlap)

    @jax.jit
    def _ratio(fa, fb):
        aa = extract_windows(fa, wind_size, overlap).astype(jnp.float32)
        bb = extract_windows(fb, wind_size, overlap).astype(jnp.float32)
        corr = correlate_matmul(aa, bb, dc_normalize=True)
        n, d, k = corr.shape
        kd = d * k
        flat = corr.reshape(n, kd)
        shift = EPS - jnp.min(flat, axis=-1)
        m = jnp.argmax(flat, axis=-1).astype(jnp.int32)
        pos = jax.lax.broadcasted_iota(jnp.int32, (n, kd), 1)
        cm = jnp.sum(jnp.where(pos == m[:, None], flat, 0), axis=-1) + shift
        dd = pos - m[:, None]
        j = jnp.round(dd.astype(jnp.float32) / k).astype(jnp.int32)
        w = validation_window
        excl = (jnp.abs(j) <= w) & (jnp.abs(dd - k * j) <= w)
        lo = (m - (w + k * w)) < 0
        hi = (m + (w + k * w)) > kd - 1
        excl = excl.at[:, 0].set(excl[:, 0] | lo)
        excl = excl.at[:, kd - 1].set(excl[:, kd - 1] | hi)
        c2 = jnp.maximum(
            jnp.max(jnp.where(excl, -jnp.inf, flat), axis=-1)
            + shift, EPS)
        return cm / c2

    out = np.asarray(_ratio(jnp.asarray(frame_a), jnp.asarray(frame_b)))
    return out.reshape(n_rows, n_cols)


def peak_width_map(
    frame_a,
    frame_b,
    wind_size: int,
    overlap: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fitted Gaussian half-widths of the correlation peak, ``([R,C] sx,
    [R,C] sy)`` in pixels.

    The 3-point log-Gaussian fit (the engine's sub-pixel estimator) also
    yields the peak's standard deviation per axis:
    ``sigma = sqrt(-1 / (2*c2))`` with ``c2 = (ln c_l - 2 ln c_m +
    ln c_r) / 2`` the log-curvature at the peak.  The correlation peak of
    ideal particle images is the particle-image autocorrelation, so
    ``d_tau ~ 2*sqrt(2)*sigma`` estimates the effective particle-image
    diameter — the quantity that sets sub-pixel accuracy (RMS error is
    minimal for d_tau ~ 2-3 px; d_tau < 1.5 px produces peak locking,
    see ``peak_locking_degree``; large d_tau = defocus / oversized
    particles).  Windows whose peak sits on the correlation-map border
    (no valid 3-point stencil) return NaN.

    Beyond the reference (which has no quality diagnostics); complements
    ``snr_map`` (detectability) with a resolution/accuracy diagnostic.
    """
    import jax
    import jax.numpy as jnp

    from ..ops.correlate import correlate_matmul
    from ..ops.geometry import get_field_shape
    from ..ops.peakfit import EPS
    from ..ops.windows import extract_windows

    H, W = np.asarray(frame_a).shape
    n_rows, n_cols = get_field_shape((H, W), wind_size, overlap)

    @jax.jit
    def _widths(fa, fb):
        aa = extract_windows(fa, wind_size, overlap).astype(jnp.float32)
        bb = extract_windows(fb, wind_size, overlap).astype(jnp.float32)
        corr = correlate_matmul(aa, bb, dc_normalize=True)
        n, d, k = corr.shape
        kd = d * k
        flat = corr.reshape(n, kd)
        shift = EPS - jnp.min(flat, axis=-1, keepdims=True)
        flat = flat + shift
        m = jnp.argmax(flat, axis=-1).astype(jnp.int32)
        pos = jax.lax.broadcasted_iota(jnp.int32, (n, kd), 1)

        def value_at(idx):
            return jnp.sum(jnp.where(pos == idx[:, None], flat, 0), axis=-1)

        cm = value_at(m)
        row, col = m // k, m % k
        interior = ((row > 0) & (row < d - 1)
                    & (col > 0) & (col < k - 1))

        def sigma(cl, cr):
            c2 = (jnp.log(cl) - 2 * jnp.log(cm) + jnp.log(cr)) / 2.0
            return jnp.where(c2 < 0, jnp.sqrt(-1.0 / (2.0 * c2)), jnp.nan)

        sx = sigma(value_at(m - 1), value_at(m + 1))
        sy = sigma(value_at(m - k), value_at(m + k))
        return (jnp.where(interior, sx, jnp.nan),
                jnp.where(interior, sy, jnp.nan))

    sx, sy = _widths(jnp.asarray(frame_a), jnp.asarray(frame_b))
    return (np.asarray(sx).reshape(n_rows, n_cols),
            np.asarray(sy).reshape(n_rows, n_cols))


def uncertainty_map(
    frame_a,
    frame_b,
    wind_size: int,
    overlap: int,
    exclusion_window: int = 3,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-vector sub-pixel uncertainty estimate ``([R,C] sigma_u,
    [R,C] sigma_v)`` in pixels.

    First-order propagation of the correlation-plane noise floor through
    the engine's 3-point log-Gaussian sub-pixel estimator
    (``correlation_to_displacement``, mirroring reference
    PIVbackend.py:399-407): with ``u = col + N/D``, ``N = ln c_l - ln c_r``,
    ``D = 2 ln c_l + 2 ln c_r - 4 ln c_m``,

        sigma_u^2 = s^2 * [ ((D - 2N) / (c_l D^2))^2
                          + ((D + 2N) / (c_r D^2))^2
                          + ((4N)     / (c_m D^2))^2 ]

    where ``s`` is the per-window noise standard deviation of the
    correlation plane, measured robustly over the plane EXCLUDING a
    ``(2*exclusion_window+1)^2`` region around the primary peak (the same
    exclusion the peak-ratio validator uses).  The floor includes the
    random-particle-correlation background, which is treated as independent
    noise on the three stencil values although it is correlated between
    neighbours — so the estimate is CONSERVATIVE (measured ~3x the actual
    RMS error at low sensor noise, converging toward it as noise dominates;
    see test_stats_io.py::test_uncertainty_map_tracks_noise_and_error).

    Windows whose peak sits on the correlation-map border return NaN.
    Uncertainty quantification is standard in modern PIV tooling
    (cf. Sciacchitano, Meas. Sci. Tech. 30 (2019) review); the reference
    has no counterpart.
    """
    import jax
    import jax.numpy as jnp

    from ..ops.correlate import correlate_matmul
    from ..ops.geometry import get_field_shape
    from ..ops.peakfit import EPS
    from ..ops.windows import extract_windows

    H, W = np.asarray(frame_a).shape
    n_rows, n_cols = get_field_shape((H, W), wind_size, overlap)

    @jax.jit
    def _sigma(fa, fb):
        aa = extract_windows(fa, wind_size, overlap).astype(jnp.float32)
        bb = extract_windows(fb, wind_size, overlap).astype(jnp.float32)
        corr = correlate_matmul(aa, bb, dc_normalize=True)
        n, d, k = corr.shape
        kd = d * k
        flat = corr.reshape(n, kd)
        shift = EPS - jnp.min(flat, axis=-1, keepdims=True)
        flat = flat + shift
        m = jnp.argmax(flat, axis=-1).astype(jnp.int32)
        pos = jax.lax.broadcasted_iota(jnp.int32, (n, kd), 1)

        def value_at(idx):
            return jnp.sum(jnp.where(pos == idx[:, None], flat, 0), axis=-1)

        cm = value_at(m)
        row, col = m // k, m % k
        interior = ((row > 0) & (row < d - 1)
                    & (col > 0) & (col < k - 1))

        # noise floor: std over the plane excluding the peak neighbourhood
        w = exclusion_window
        dd = pos - m[:, None]
        j = jnp.round(dd.astype(jnp.float32) / k).astype(jnp.int32)
        excl = (jnp.abs(j) <= w) & (jnp.abs(dd - k * j) <= w)
        cnt = jnp.sum(~excl, axis=-1).astype(jnp.float32)
        mean = jnp.sum(jnp.where(excl, 0.0, flat), axis=-1) / cnt
        var = (jnp.sum(jnp.where(excl, 0.0,
                                 (flat - mean[:, None]) ** 2), axis=-1)
               / jnp.maximum(cnt - 1.0, 1.0))
        s = jnp.sqrt(var)

        def axis_sigma(cl, cr):
            L, R, M = jnp.log(cl), jnp.log(cr), jnp.log(cm)
            N = L - R
            D = 2.0 * L + 2.0 * R - 4.0 * M
            D2 = D * D
            g2 = (((D - 2.0 * N) / (cl * D2)) ** 2
                  + ((D + 2.0 * N) / (cr * D2)) ** 2
                  + ((4.0 * N) / (cm * D2)) ** 2)
            return jnp.where(D < 0, s * jnp.sqrt(g2), jnp.nan)

        su = axis_sigma(value_at(m - 1), value_at(m + 1))
        sv = axis_sigma(value_at(m - k), value_at(m + k))
        return (jnp.where(interior, su, jnp.nan),
                jnp.where(interior, sv, jnp.nan))

    su, sv = _sigma(jnp.asarray(frame_a), jnp.asarray(frame_b))
    return (np.asarray(su).reshape(n_rows, n_cols),
            np.asarray(sv).reshape(n_rows, n_cols))
