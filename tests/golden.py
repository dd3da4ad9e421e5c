"""Golden reference: independent numpy/scipy mirror of the TorchPIV algorithm.

This module re-implements, from the algorithm spec (not the code), the exact
behaviour of /root/reference/src/torchPIV/PIVbackend.py so the JAX engine can
be parity-tested without torch: strided window extraction, FFT correlation,
flat-index 3-point log-Gaussian peak fit with peak-ratio validation, CWS/DWS
refinement with RectBivariateSpline predictor upsampling, anti-divergence
guards, and the border-interp + Delaunay NaN-infill tail.  float64 in the
first pass (the reference normalises and fits in f64), float32 window values
in refinement passes (torch's bilinear output dtype).

A separate optional test cross-checks this mirror against the actual torch
reference when it is importable.
"""
from __future__ import annotations

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view
from scipy import ndimage
from scipy.interpolate import LinearNDInterpolator, RectBivariateSpline

EPS = 1e-7


# --- geometry --------------------------------------------------------------
def get_field_shape(image_size, win, ov):
    rows = (image_size[-2] - win) // (win - ov) + 1
    cols = (image_size[-1] - win) // (win - ov) + 1
    return rows, cols


def get_coordinates(image_size, win, ov):
    rows, cols = get_field_shape(image_size, win, ov)
    step = win - ov
    x = np.arange(cols, dtype=np.int32) * step + win / 2.0
    y = np.arange(rows, dtype=np.int32) * step + win / 2.0
    x += (image_size[-1] - 1 - ((cols - 1) * step + (win - 1))) // 2
    y += (image_size[-2] - 1 - ((rows - 1) * step + (win - 1))) // 2
    return np.meshgrid(x, y)


# --- core ops ---------------------------------------------------------------
def moving_window_array(arr, win, ov):
    step = win - ov
    v = sliding_window_view(arr, (win, win))[::step, ::step]
    return v.reshape(-1, win, win)


def correlate_fft(a, b):
    f = np.fft.irfft2(np.conj(np.fft.rfft2(a)) * np.fft.rfft2(b), s=a.shape[-2:])
    return np.fft.fftshift(f, axes=(-2, -1))


def correlate_rpc(a, b, diameter=2.8):
    """Robust phase correlation oracle (Eckstein & Vlachos 2008): phase-
    normalised cross-spectrum weighted by the energy spectrum of an ideal
    Gaussian particle image (float64, full-spectrum FFT)."""
    n = a.shape[-1]
    prod = np.conj(np.fft.fft2(a)) * np.fft.fft2(b)
    mag = np.abs(prod)
    eps = 1e-8 * mag.mean(axis=(-2, -1), keepdims=True) + 1e-30
    kf = np.fft.fftfreq(n) * n  # signed integer frequencies
    k2 = kf[:, None] ** 2 + kf[None, :] ** 2
    w = np.exp(-(np.pi * diameter / n) ** 2 / 4.0 * k2)
    f = np.fft.ifft2(prod / (mag + eps) * w).real
    return np.fft.fftshift(f, axes=(-2, -1))


def _second_peak_index(cor_flat, m, d, k, wind):
    cor = cor_flat.copy()
    n = cor.shape[0]
    rows = np.arange(n)
    for j in range(-wind, wind + 1):
        for i in range(-wind, wind + 1):
            ids = np.clip(m + i + k * j, 0, k * d - 1)
            cor[rows, ids] = 0.0
    return cor.argmax(-1)


def correlation_to_displacement(corr, n_rows, n_cols, validate=True,
                                val_ratio=1.2, validation_window=3):
    c, d, k = corr.shape
    kd = k * d
    corr = corr + EPS
    cor = corr.reshape(c, -1).astype(np.float64)
    m = cor.argmax(-1)
    rows = np.arange(c)

    left = np.where(m + 1 >= kd - 1, m, m + 1)
    right = np.where(m - 1 <= 0, m, m - 1)
    top = np.where(m + k >= kd - 1, m, m + k)
    bot = np.where(m - k <= 0, m, m - k)

    cm, cl, cr = cor[rows, m], cor[rows, left], cor[rows, right]
    ct, cb = cor[rows, top], cor[rows, bot]
    with np.errstate(divide="ignore", invalid="ignore"):
        nom1 = np.log(cr) - np.log(cl)
        den1 = 2 * (np.log(cl) + np.log(cr)) - 4 * np.log(cm)
        nom2 = np.log(cb) - np.log(ct)
        den2 = 2 * (np.log(cb) + np.log(ct)) - 4 * np.log(cm)
        u = (m % k) + nom1 / den1
        v = (m // d) + nom2 / den2

    val_mask = None
    if validate:
        m2 = _second_peak_index(cor, m, d, k, validation_window)
        with np.errstate(divide="ignore", invalid="ignore"):
            val_mask = (cm / cor[rows, m2]) < val_ratio
        degenerate = (left >= kd - 1) & (right <= 0) & (top >= kd - 1) & (bot <= 0)
        val_mask = (val_mask | degenerate).reshape(n_rows, n_cols)

    u = np.nan_to_num(u - k // 2).reshape(n_rows, n_cols)
    v = np.nan_to_num(v - d // 2).reshape(n_rows, n_cols)
    return u, v, val_mask


def first_pass(frame_a, frame_b, win, ov, validate=True, val_ratio=1.2):
    n_rows, n_cols = get_field_shape(frame_a.shape, win, ov)
    x, y = get_coordinates(frame_a.shape, win, ov)
    aa = moving_window_array(frame_a, win, ov).astype(np.float64)
    bb = moving_window_array(frame_b, win, ov).astype(np.float64)
    aa = aa / aa.mean(axis=(-2, -1), keepdims=True)
    bb = bb / bb.mean(axis=(-2, -1), keepdims=True)
    corr = correlate_fft(aa, bb)
    corr = corr - corr.min(axis=(-2, -1), keepdims=True)
    u, v, val = correlation_to_displacement(corr, n_rows, n_cols, validate, val_ratio)
    return u, v, x, y, val


# --- shifts -----------------------------------------------------------------
def _flat_window_grid(frame_shape, win, ov):
    H, W = frame_shape
    rows, cols = get_field_shape((H, W), win, ov)
    step = win - ov
    r0 = np.arange(rows) * step
    c0 = np.arange(cols) * step
    w = np.arange(win)
    gy = (r0[:, None, None, None] + w[None, None, :, None])
    gx = (c0[None, :, None, None] + w[None, None, None, :])
    return (gy * W + gx).reshape(rows * cols, win, win).astype(np.int64)


def bilinear_cws(frame, grid, vel_x, vel_y):
    W = frame.shape[-1]
    numel = frame.size
    gy, gx = grid // W, grid % W
    # torch promotes int64 grid + f32 velocity to f32 — keep that precision
    new_y = (gy + vel_y).astype(np.float32)
    new_x = (gx + vel_x).astype(np.float32)
    up_x = np.ceil(new_x).astype(np.int64)
    up_y = np.ceil(new_y).astype(np.int64)
    down_x = np.floor(new_x).astype(np.int64)
    down_y = np.floor(new_y).astype(np.int64)
    mask = (up_x - down_x) * (up_y - down_y) == 0
    flat = frame.reshape(-1)

    def g(y, x):
        return flat[np.clip(y * W + x, 0, numel - 1)]

    f11, f21 = g(down_y, down_x), g(down_y, up_x)
    f12, f22 = g(up_y, down_x), g(up_y, up_x)
    ux = (up_x - new_x).astype(np.float32)
    uy = (up_y - new_y).astype(np.float32)
    dx = (new_x - down_x).astype(np.float32)
    dy = (new_y - down_y).astype(np.float32)
    f = (f11 * ux * uy + f21 * dx * uy + f12 * ux * dy + f22 * dx * dy).astype(
        np.float32
    )
    f[mask] = f11[mask].astype(np.float32)
    return f


def nearest_dws(frame, grid, vel_x, vel_y):
    W = frame.shape[-1]
    idx = np.clip(grid + vel_y * W + vel_x, 0, frame.size - 1)
    return frame.reshape(-1)[idx].astype(np.float32)


# --- refinement passes -------------------------------------------------------
def cws_iteration(frame_a, frame_b, x0, y0, u0, v0, val_mask, win, ov):
    frame_shape = frame_a.shape
    n_rows, n_cols = get_field_shape(frame_shape, win, ov)
    x, y = get_coordinates(frame_shape, win, ov)
    u0 = RectBivariateSpline(y0[:, 0], x0[0, :], u0)(y[:, 0], x[0, :])
    v0 = RectBivariateSpline(y0[:, 0], x0[0, :], v0)(y[:, 0], x[0, :])
    u2, v2 = u0 / 2, v0 / 2  # half-shift from the PRE-zeroed predictor
    validate = val_mask is not None
    if validate:
        val = RectBivariateSpline(y0[:, 0], x0[0, :], val_mask)(y[:, 0], x[0, :]) >= 0.5
        u0[val] = 0.0
        v0[val] = 0.0
    grid = _flat_window_grid(frame_shape, win, ov)
    uf = u2.reshape(-1)[:, None, None].astype(np.float32)
    vf = v2.reshape(-1)[:, None, None].astype(np.float32)
    aa = bilinear_cws(frame_a, grid, -uf, -vf)
    bb = bilinear_cws(frame_b, grid, uf, vf)
    corr = correlate_fft(aa, bb)
    corr = corr - corr.min(axis=(-2, -1), keepdims=True)
    du, dv, val_new = correlation_to_displacement(corr, n_rows, n_cols, validate)
    u = 2 * u2 + du
    v = 2 * v2 + dv
    mask_u = (du > u0) & (np.rint(u0) > 0)
    mask_v = (dv > v0) & (np.rint(v0) > 0)
    if val_new is not None:
        mask_u |= val_new
        mask_v |= val_new
    u[mask_u] = u0[mask_u]
    v[mask_v] = v0[mask_v]
    return u, v, x, y, val_new


def dws_iteration(frame_a, frame_b, x0, y0, u0, v0, val_mask, win, ov):
    frame_shape = frame_a.shape
    n_rows, n_cols = get_field_shape(frame_shape, win, ov)
    x, y = get_coordinates(frame_shape, win, ov)
    u0 = RectBivariateSpline(y0[:, 0], x0[0, :], u0)(y[:, 0], x[0, :])
    v0 = RectBivariateSpline(y0[:, 0], x0[0, :], v0)(y[:, 0], x[0, :])
    validate = val_mask is not None
    if validate:
        val = RectBivariateSpline(y0[:, 0], x0[0, :], val_mask)(y[:, 0], x[0, :]) >= 0.5
        u0[val] = 0.0
        v0[val] = 0.0
    u2 = np.rint(u0 / 2)  # predictor zeroed BEFORE rounding in DWS
    v2 = np.rint(v0 / 2)
    grid = _flat_window_grid(frame_shape, win, ov)
    ui = u2.reshape(-1)[:, None, None].astype(np.int64)
    vi = v2.reshape(-1)[:, None, None].astype(np.int64)
    aa = nearest_dws(frame_a, grid, -ui, -vi)
    bb = nearest_dws(frame_b, grid, ui, vi)
    corr = correlate_fft(aa, bb)
    corr = corr - corr.min(axis=(-2, -1), keepdims=True)
    du, dv, val_new = correlation_to_displacement(corr, n_rows, n_cols, validate)
    u = 2 * np.rint(u2) + du
    v = 2 * np.rint(v2) + dv
    mask_u = (du > u0) & (np.rint(u0) > 0)
    mask_v = (dv > v0) & (np.rint(v0) > 0)
    if val_new is not None:
        mask_u |= val_new
        mask_v |= val_new
    u[mask_u] = u0[mask_u]
    v[mask_v] = v0[mask_v]
    return u, v, x, y, val_new


# --- infill tail -------------------------------------------------------------
_CROSS = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=bool)


def interpolate_borders(vec):
    if not np.isnan(vec).any():
        return vec
    for sl in ((0, slice(None)), (-1, slice(None))):
        row = vec[sl]
        nans = np.isnan(row)
        if not nans.all():
            row[nans] = np.interp(np.nonzero(nans)[0], np.nonzero(~nans)[0], row[~nans])
    for sl in ((slice(None), 0), (slice(None), -1)):
        col = vec[sl]
        nans = np.isnan(col)
        if not nans.all():
            col[nans] = np.interp(np.nonzero(nans)[0], np.nonzero(~nans)[0], col[~nans])
    return vec


def fill_missing_values(field):
    invalid = np.isnan(field)
    if not invalid.any():
        return field  # see ops/infill.py — empty-holes fast path
    dilated = ndimage.binary_dilation(invalid, structure=_CROSS)
    border = dilated & ~invalid
    points = np.argwhere(border)
    values = field[border]
    if points.size < border.size / 2:
        try:
            field[invalid] = LinearNDInterpolator(points, values)(np.argwhere(invalid))
        except Exception:
            return None
    else:
        return None
    return field


# --- full pipeline ------------------------------------------------------------
def pass_schedule(wind_size, overlap, multipass, scale):
    sched = [(wind_size, overlap)]
    w, o = wind_size, overlap
    for _ in range(multipass - 1):
        w = int(w // scale)
        o = int(o // scale)
        sched.append((w, o))
    return sched


def offline_piv_pair(frame_a, frame_b, wind_size, overlap, multipass=1,
                     multipass_mode="CWS", multipass_scale=2.0,
                     dt=1.0, scale=1.0, validate=True):
    """Full golden pipeline on one uint8 pair -> (x, y, u, v) or None (skip)."""
    frame_a = np.asarray(frame_a)
    frame_b = np.asarray(frame_b)
    u, v, x, y, val = first_pass(frame_a, frame_b, wind_size, overlap, validate)
    it = cws_iteration if multipass_mode == "CWS" else dws_iteration
    for w, o in pass_schedule(wind_size, overlap, multipass, multipass_scale)[1:]:
        u, v, x, y, val = it(frame_a, frame_b, x, y, u, v, val, w, o)
    if val is not None:
        u[val] = np.nan
        v[val] = np.nan
        u = interpolate_borders(u)
        v = interpolate_borders(v)
        u = fill_missing_values(u)
        v = fill_missing_values(v)
        if u is None or v is None:
            return None
    u = np.flip(u, axis=0)
    v = -np.flip(v, axis=0)
    u = u * scale / dt * 1000
    v = v * scale / dt * 1000
    return x * scale, y * scale, u, v
