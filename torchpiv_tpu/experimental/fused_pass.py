"""Fully-fused PIV pass kernel: window shift -> DFT correlation -> sub-pixel
peak fit, one Pallas kernel, correlation maps never touch HBM.

This is the TPU-native replacement for the whole per-pass chain the
reference runs as separate GPU kernels with host glue
(/root/reference/src/torchPIV/PIVbackend.py:690-740: shift gathers, rfft2 /
irfft2, argmax + fit + validation).  The XLA composition of that chain
(ops.shifts -> ops.correlate -> ops.peakfit) is correct but pays ~6 HBM
round-trips over 60+ MB window/spectra/correlation tensors per frame pair,
plus layout copies into the batch-in-lanes form XLA's batched-matmul
emitter wants.  Here one grid step processes one window row end-to-end in
VMEM and writes only the three tiny per-window result fields.

Structure per grid step (window row r):

* two double-buffered band DMAs stream the (flat-wrap padded) frames;
* windows are extracted with the aligned-block + dynamic-roll trick of
  ``shift_pallas`` and packed G = 128/w windows side-by-side along lanes;
* the DFT sandwich ``corr = real(Fs @ (conj(F a Fh) * (F b Fh)) @ Mh)``
  runs on the MXU with NO transposes and NO batch layout copies:
  - right transforms are ONE matmul with a block-diagonal operator
    (``[a0|a1|a2|a3] @ blockdiag(Fh)``),
  - left transforms share the operator across the lane-packed windows
    (``F @ [t0|t1|t2|t3]``),
  - complex arithmetic uses lane-concatenated [re | im] blocks with the
    "multiply by i" shuffle sigma([re|im]) = [-im|re] built from static
    lane slices;
* the peak fit runs lane-packed over the G windows at once: per-window
  reductions are sublane reduces + masked suffix roll-trees within each
  window's lane block, broadcasts are leader propagations, and neighbour
  values come from one-hot sum-extraction — no gathers, no M=1 matmuls
  (which serialize the MXU and miscompiled here), same flat-index edge
  semantics as ``ops.peakfit`` / the reference.

The ``stub`` argument compiles attribution variants ("extract",
"extracta", "extractsep", "corr") used to produce the section cost table
in docs/ROADMAP.md — measurement instrumentation, not a production path.

Zero shifts make the kernel compute a plain first pass (set
``dc_normalize=True`` for the reference's per-window mean normalisation,
folded into the spectrum product); integer shifts give DWS semantics
(the fractional blend degenerates to the floor corner, reference
PIVbackend.py:170,193).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.correlate import _dft_matrices, _dft_matrices_half
from ..kernels.shift_pallas import flat_wrap_pad

EPS = 1e-7


@functools.lru_cache(maxsize=8)
def _operators(w: int):
    """Constant operator matrices for window size w (numpy, f32).

    Returns (FH_bd, Fr, Fi, Fsr, Fsi, MH_bd, G, PW):
      FH_bd  [G*w, G*PW]  block-diagonal stage-1 right operator [Fhr | Fhi]
      Fr, Fi [w, w]       stage-2 left DFT operator (complex parts)
      Fsr, Fsi [w, w]     inverse left operator (fftshift folded in)
      MH_bd  [G*PW, G*w]  block-diagonal final right operator [Mhr; -Mhi]
    """
    h = w // 2 + 1
    G = 128 // w
    PW = 2 * w  # per-window spectra lane budget (>= 2h = w + 2)
    F, Fs = _dft_matrices(w)
    Fh, Mh = _dft_matrices_half(w)
    Fh_cat = np.zeros((w, PW), np.float32)
    Fh_cat[:, :h] = np.real(Fh)
    Fh_cat[:, h:2 * h] = np.imag(Fh)
    Mh_cat = np.zeros((PW, w), np.float32)
    Mh_cat[:h] = np.real(Mh)
    Mh_cat[h:2 * h] = -np.imag(Mh)

    FH_bd = np.zeros((G * w, G * PW), np.float32)
    MH_bd = np.zeros((G * PW, G * w), np.float32)
    for g in range(G):
        FH_bd[g * w:(g + 1) * w, g * PW:(g + 1) * PW] = Fh_cat
        MH_bd[g * PW:(g + 1) * PW, g * w:(g + 1) * w] = Mh_cat

    return (
        FH_bd,
        np.real(F).astype(np.float32).copy(),
        np.imag(F).astype(np.float32).copy(),
        np.real(Fs).astype(np.float32).copy(),
        np.imag(Fs).astype(np.float32).copy(),
        MH_bd,
        G,
        PW,
    )


def make_group_corrfit(w: int, G: int, PW: int, validate: bool,
                       val_ratio: float, vw: int, dc_normalize: bool):
    """Factory for the shared per-group correlate+peakfit computation.

    Returns ``(group_corrfit, pack_leaders)`` where
    ``group_corrfit(WA, WB, ops)`` takes two lane-packed ``(w, G*w)`` window
    groups and the operator tuple ``(fh, fr, fi, fsr, fsi, mh)`` (loaded
    from kernel refs) and returns ``(u, v, invalid)`` as ``(1, G*w)`` rows
    with per-window results resident in each block's leader lane
    (``pack_leaders`` compresses those to ``(1, G)``).

    The correlation is the MXU DFT sandwich
    ``corr = real(Fs @ (conj(F a Fh) * (F b Fh)) @ Mh)`` with block-diagonal
    right operators over the lane-packed windows; the peak fit runs
    lane-packed on the VPU (sublane reduces + masked suffix roll-trees +
    leader propagation — no gathers, no M=1 matmuls).  Semantics are
    identical to ``ops.peakfit.correlation_to_displacement`` /
    the reference's ``correlation_to_displacement`` + ``peak2peak``
    (PIVbackend.py:249-422), including the flat-index edge quirks.
    """
    h = w // 2 + 1
    kd = w * w
    GW = G * w

    def sigma(X):
        # per-window-block multiply-by-i on [re | im | 0pad] lane blocks
        parts = []
        for g in range(G):
            b = g * PW
            parts.append(-X[:, b + h:b + 2 * h])
            parts.append(X[:, b:b + h])
            parts.append(X[:, b + 2 * h:b + PW])
        return jnp.concatenate(parts, axis=1)

    def swap(X):
        # [re | im | pad] -> [im | re | pad] (no negation)
        parts = []
        for g in range(G):
            b = g * PW
            parts.append(X[:, b + h:b + 2 * h])
            parts.append(X[:, b:b + h])
            parts.append(X[:, b + 2 * h:b + PW])
        return jnp.concatenate(parts, axis=1)

    def halves_sum(X):
        parts = []
        zero = jnp.zeros((w, PW - h), jnp.float32)
        for g in range(G):
            b = g * PW
            parts.append(X[:, b:b + h] + X[:, b + h:b + 2 * h])
            parts.append(zero)
        return jnp.concatenate(parts, axis=1)

    def halves_diff(X):
        parts = []
        zero = jnp.zeros((w, PW - h), jnp.float32)
        for g in range(G):
            b = g * PW
            parts.append(X[:, b:b + h] - X[:, b + h:b + 2 * h])
            parts.append(zero)
        return jnp.concatenate(parts, axis=1)

    def interleave(re, im):
        parts = []
        zero = jnp.zeros((w, PW - 2 * h), jnp.float32)
        for g in range(G):
            b = g * PW
            parts.append(re[:, b:b + h])
            parts.append(im[:, b:b + h])
            parts.append(zero)
        return jnp.concatenate(parts, axis=1)

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, GW), 1)
    lane_in_blk = lane % w
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (w, GW), 0)
    col_in_blk = jax.lax.broadcasted_iota(jnp.int32, (w, GW), 1) % w
    flat2f = (row_iota * w + col_in_blk).astype(jnp.float32)

    def _suffix(y, combine, fill):
        s = w // 2
        while s >= 1:
            cand = jnp.where(lane_in_blk + s < w, pltpu.roll(y, GW - s, 1),
                             fill)
            y = combine(y, cand)
            s //= 2
        return y

    def _propagate(y):
        s = 1
        while s < w:
            y = jnp.where(lane_in_blk >= s, pltpu.roll(y, s, 1), y)
            s *= 2
        return y

    def segmax_b(x):
        y = _suffix(jnp.max(x, axis=0, keepdims=True), jnp.maximum,
                    jnp.float32(-jnp.inf))
        return _propagate(y)

    def segmin_b(x):
        y = _suffix(jnp.min(x, axis=0, keepdims=True), jnp.minimum,
                    jnp.float32(jnp.inf))
        return _propagate(y)

    def segmax_lead(x):
        return _suffix(jnp.max(x, axis=0, keepdims=True), jnp.maximum,
                       jnp.float32(-jnp.inf))

    def segsum_lead(x):
        return _suffix(jnp.sum(x, axis=0, keepdims=True), jnp.add,
                       jnp.float32(0.0))

    def pack_leaders(y):
        return jnp.concatenate(
            [y[:, kk * w:kk * w + 1] for kk in range(G)], axis=1)

    def group_corr(WA, WB, ops):
        fh, fr, fi, fsr, fsi, mh = ops
        # ---- correlation: corr = real(Fs (conj(F a Fh) * (F b Fh)) Mh) ----
        A1 = mm(WA, fh)  # (w, G*PW) [re|im|0] blocks
        B1 = mm(WB, fh)
        A = mm(fr, A1) + mm(fi, sigma(A1))  # stage-2 left transform
        B = mm(fr, B1) + mm(fi, sigma(B1))
        P = A * B
        Q = A * swap(B)
        C = interleave(halves_sum(P), halves_diff(Q))  # conj(A) * B
        D = mm(fsr, C) + mm(fsi, sigma(C))  # inverse left (fftshift folded)
        return mm(D, mh)  # (w, G*w) real correlation maps

    def group_corrfit(WA, WB, ops):
        corr = group_corr(WA, WB, ops)
        # ---- lane-packed peak fit over the G windows at once ----
        x = corr
        if dc_normalize:
            norm = (float(w * w) ** 2) / (
                _propagate(segsum_lead(WA)) * _propagate(segsum_lead(WB)))
            x = x * norm
        x = x - segmin_b(x) + EPS
        cm = segmax_b(x)
        m = _propagate(_suffix(
            jnp.min(jnp.where(x >= cm, flat2f, jnp.float32(kd)),
                    axis=0, keepdims=True),
            jnp.minimum, jnp.float32(kd)))  # first-occurrence flat argmax

        def value_at(idx_b):
            return segsum_lead(jnp.where(flat2f == idx_b, x, 0.0))

        left = jnp.where(m + 1 >= kd - 1, m, m + 1)
        right = jnp.where(m - 1 <= 0, m, m - 1)
        top = jnp.where(m + w >= kd - 1, m, m + w)
        bot = jnp.where(m - w <= 0, m, m - w)
        cl = value_at(left)
        cr = value_at(right)
        ct = value_at(top)
        cb = value_at(bot)

        lcm, lcl, lcr, lct, lcb = (
            jnp.log(c_) for c_ in (cm, cl, cr, ct, cb))
        du = (lcr - lcl) / (2.0 * (lcl + lcr) - 4.0 * lcm)
        dv = (lcb - lct) / (2.0 * (lcb + lct) - 4.0 * lcm)
        row = jnp.floor(m / w)
        col = m - row * w
        u = jnp.nan_to_num(col + du - (w // 2))  # leader lanes valid
        v = jnp.nan_to_num(row + dv - (w // 2))

        if validate:
            dd = flat2f - m
            j = jnp.round(dd / w)
            excl = (jnp.abs(j) <= vw) & (jnp.abs(dd - w * j) <= vw)
            lo_b = (m - (vw + w * vw)) < 0
            hi_b = (m + (vw + w * vw)) > kd - 1
            excl = excl | ((flat2f == 0) & lo_b) | ((flat2f == kd - 1) & hi_b)
            c2 = segmax_lead(jnp.where(excl, 0.0, x))
            invalid = (cm / c2) < val_ratio
            degenerate = (
                (left >= kd - 1) & (right <= 0) & (top >= kd - 1) & (bot <= 0)
            )
            invalid = (invalid | degenerate).astype(jnp.float32)
        else:
            invalid = jnp.zeros((1, GW), jnp.float32)
        return u, v, invalid

    return group_corrfit, pack_leaders, group_corr


def _fused_kernel(
    # scalar prefetch (SMEM) — precomputed per-window floor/frac shift
    # parts for each frame (host-side floor keeps the per-window scalar
    # chain in the kernel short):
    dya, dxa, fya, fxa, dyb, dxb, fyb, fxb,
    # inputs:
    frame_a_hbm, frame_b_hbm, FH_bd, Fr, Fi, Fsr, Fsi, MH_bd,
    # outputs:
    u_ref, v_ref, inval_ref,
    # scratch:
    band_a, band_b, sem_a, sem_b,
    *,
    H: int, W: int, Wp: int, w: int, step: int, S: int, n_cols: int,
    OFF: int, G: int, PW: int, validate: bool, val_ratio: float, vw: int,
    dc_normalize: bool, stub: str = "none", extract_mode: str = "rolls",
):
    r = pl.program_id(0)
    n_rows = pl.num_programs(0)
    h = w // 2 + 1
    mxu = extract_mode == "mxu"
    grain = 16 if mxu else 8
    # band spans the aligned origin (<= grain-1 rows early) to the highest
    # tile end (pos0 + S + w + 1)
    BH = (-(-(w + 2 * S + 16) // 16) * 16 if mxu
          else -(-(2 * S + w + 8) // 8) * 8)
    Hp = -(-H // grain) * grain
    BLK_H = w + 8
    BLK_W = 256

    def band_origin(row):
        o = jnp.clip(row * step + OFF - S, 0, Hp - BH)
        return pl.multiple_of((o // grain) * grain, grain)

    def band_dma(frame_hbm, band, sem, slot, row):
        return pltpu.make_async_copy(
            frame_hbm.at[pl.ds(band_origin(row), BH), :],
            band.at[slot, pl.ds(0, BH), :],
            sem.at[slot],
        )

    @pl.when(r == 0)
    def _():
        band_dma(frame_a_hbm, band_a, sem_a, 0, 0).start()
        band_dma(frame_b_hbm, band_b, sem_b, 0, 0).start()

    @pl.when(r + 1 < n_rows)
    def _():
        band_dma(frame_a_hbm, band_a, sem_a, (r + 1) % 2, r + 1).start()
        band_dma(frame_b_hbm, band_b, sem_b, (r + 1) % 2, r + 1).start()

    band_dma(frame_a_hbm, band_a, sem_a, r % 2, r).wait()
    band_dma(frame_b_hbm, band_b, sem_b, r % 2, r).wait()
    slot = r % 2
    by0 = band_origin(r)

    # loop-invariant iotas for the MXU one-hot selectors
    if mxu:
        _rio_x = jax.lax.broadcasted_iota(jnp.int32, (BLK_W, w + 1), 0)
        _cio_x = jax.lax.broadcasted_iota(jnp.int32, (BLK_W, w + 1), 1)
        _rio_y = jax.lax.broadcasted_iota(jnp.int32, (w + 1, BH), 0)
        _cio_y = jax.lax.broadcasted_iota(jnp.int32, (w + 1, BH), 1)

    def extract(band, dy_ref, dx_ref, fy_ref, fx_ref, c):
        """One shifted (w, w) window.  extract_mode="rolls": aligned block
        + two dynamic rolls (VPU) — identical math to
        shift_pallas._shift_kernel.  extract_mode="mxu": two one-hot
        selection matmuls (tile = Wy @ block @ Wx) on a bf16 band — grey
        levels and one-hot operands are bf16-exact, so the f32-accumulated
        tile is bit-exact vs the roll path while the per-window work rides
        the MXU (see shift_pallas._shift_kernel_mxu)."""
        dy = dy_ref[r, c]
        dx = dx_ref[r, c]
        fy = fy_ref[r, c]
        fx = fx_ref[r, c]
        ty = jnp.clip(r * step + OFF + dy, 0, H - (w + 1)) - by0
        tx = jnp.clip(c * step + OFF + dx, 0, W - (w + 1))
        a = pl.multiple_of(jnp.clip((tx // 128) * 128, 0, Wp - BLK_W), 128)
        s_col = tx - a
        if mxu:
            block = band[slot, :, pl.ds(a, BLK_W)]  # (BH, 256) bf16
            Wx = (_rio_x == _cio_x + s_col).astype(jnp.bfloat16)
            t1 = mm(block, Wx)  # (BH, w+1) f32, exact grey levels
            Wy = (_cio_y == _rio_y + ty).astype(jnp.bfloat16)
            tile = mm(Wy, t1.astype(jnp.bfloat16))  # (w+1, w+1) exact
        else:
            t8 = pl.multiple_of((ty // 8) * 8, 8)
            s_row = ty - t8
            block = band[slot, pl.ds(t8, BLK_H), pl.ds(a, BLK_W)]
            block = pltpu.roll(block, BLK_W - s_col, 1)[:, : w + 1]
            block = pltpu.roll(block, BLK_H - s_row, 0)
            tile = block[: w + 1, :]
        f11 = tile[:w, :w]
        f21 = tile[:w, 1:]
        f12 = tile[1:, :w]
        f22 = tile[1:, 1:]
        blend = (
            f11 * ((1.0 - fx) * (1.0 - fy))
            + f21 * (fx * (1.0 - fy))
            + f12 * ((1.0 - fx) * fy)
            + f22 * (fx * fy)
        )
        integer_cell = jnp.logical_or(fy == 0.0, fx == 0.0)
        return jnp.where(integer_cell, f11, blend)

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    ops = (FH_bd[...], Fr[...], Fi[...], Fsr[...], Fsi[...], MH_bd[...])

    n_groups = -(-n_cols // G)

    # shared per-group correlate+peakfit (see make_group_corrfit)
    group_corrfit, pack_leaders, group_corr = make_group_corrfit(
        w, G, PW, validate, val_ratio, vw, dc_normalize)

    if stub == "extracta":  # attribution: ONE frame's extraction only
        for g in range(n_groups):
            acc = None
            for kk in range(G):
                c = min(g * G + kk, n_cols - 1)
                t = extract(band_a, dya, dxa, fya, fxa, c)
                acc = t if acc is None else acc + t
            u_ref[0, 0:1, g * G:g * G + 1] = acc[0:1, 0:1]
            v_ref[0, 0:1, g * G:g * G + 1] = acc[0:1, 1:2]
            inval_ref[0, 0:1, g * G:g * G + 1] = acc[0:1, 2:3]
        return

    for g in range(n_groups):
        if stub == "extractsep":
            # frame-a loop fully before frame-b loop (no interleaving)
            tiles_a = [extract(band_a, dya, dxa, fya, fxa,
                               min(g * G + kk, n_cols - 1))
                       for kk in range(G)]
            tiles_b = [extract(band_b, dyb, dxb, fyb, fxb,
                               min(g * G + kk, n_cols - 1))
                       for kk in range(G)]
            acc = sum(ta * tb for ta, tb in zip(tiles_a, tiles_b))
            u_ref[0, 0:1, g * G:g * G + 1] = acc[0:1, 0:1]
            v_ref[0, 0:1, g * G:g * G + 1] = acc[0:1, 1:2]
            inval_ref[0, 0:1, g * G:g * G + 1] = acc[0:1, 2:3]
            continue
        # per-frame loops (not interleaved): measured 0.6 ms/call faster —
        # Mosaic schedules a single band's extraction chain better
        tiles_a = [extract(band_a, dya, dxa, fya, fxa,
                           min(g * G + kk, n_cols - 1))
                   for kk in range(G)]
        tiles_b = [extract(band_b, dyb, dxb, fyb, fxb,
                           min(g * G + kk, n_cols - 1))
                   for kk in range(G)]

        if stub == "extractnc":  # attribution: extraction without concat
            acc = tiles_a[0] * tiles_b[0]
            for kk in range(1, G):
                acc = acc + tiles_a[kk] * tiles_b[kk]
            u_ref[0, 0:1, g * G:g * G + 1] = acc[0:1, 0:1]
            v_ref[0, 0:1, g * G:g * G + 1] = acc[0:1, 1:2]
            inval_ref[0, 0:1, g * G:g * G + 1] = acc[0:1, 2:3]
            continue

        WA = jnp.concatenate(tiles_a, axis=1)  # (w, G*w) lane-packed
        WB = jnp.concatenate(tiles_b, axis=1)

        if stub == "extract":  # attribution: extraction cost only
            s_ = jnp.sum(WA * WB, axis=0, keepdims=True)
            u_ref[0, 0:1, g * G:g * G + 1] = s_[:, :1]
            v_ref[0, 0:1, g * G:g * G + 1] = s_[:, 1:2]
            inval_ref[0, 0:1, g * G:g * G + 1] = s_[:, 2:3]
            continue

        if stub == "corr":  # attribution: extraction + matmul chain
            corr = group_corr(WA, WB, ops)
            s_ = jnp.sum(corr, axis=0, keepdims=True)
            u_ref[0, 0:1, g * G:g * G + 1] = s_[:, :1]
            v_ref[0, 0:1, g * G:g * G + 1] = s_[:, 1:2]
            inval_ref[0, 0:1, g * G:g * G + 1] = s_[:, 2:3]
            continue

        u, v, invalid = group_corrfit(WA, WB, ops)

        n_keep = min(G, n_cols - g * G)
        base = g * G
        u_ref[0, 0:1, base:base + n_keep] = pack_leaders(u)[:, :n_keep]
        v_ref[0, 0:1, base:base + n_keep] = pack_leaders(v)[:, :n_keep]
        inval_ref[0, 0:1, base:base + n_keep] = (
            pack_leaders(invalid)[:, :n_keep])


def _corrfit_kernel(
    # inputs:
    wa_hbm, wb_hbm, FH_bd, Fr, Fi, Fsr, Fsi, MH_bd,
    # outputs:
    u_ref, v_ref, inval_ref,
    # scratch:
    row_a, row_b, sem_a, sem_b,
    *,
    w: int, n_cols: int, G: int, PW: int, validate: bool, val_ratio: float,
    vw: int, dc_normalize: bool, stub: str = "none",
):
    """Correlate + peak-fit one window row per grid step.

    Inputs are lane-packed window tensors ``(n_rows, w, Lp)`` (window ``c``
    occupies lanes ``[c*w, (c+1)*w)``; ``Lp = ceil(n_cols/G)*128``) as
    written by ``shift_windows_pallas(..., packed=True)`` — each group of
    ``G = 128//w`` windows is one native 128-lane slab, so no repacking,
    no dynamic addressing, and no XLA layout copies anywhere between the
    shift kernel and the result fields.  Correlation maps and spectra
    stay in VMEM/registers for their whole life.
    """
    r = pl.program_id(0)
    n_rows = pl.num_programs(0)
    GW = G * w  # == 128
    n_groups = -(-n_cols // G)

    def row_dma(hbm, row_s, sem, slot, row):
        return pltpu.make_async_copy(hbm.at[row], row_s.at[slot],
                                     sem.at[slot])

    @pl.when(r == 0)
    def _():
        row_dma(wa_hbm, row_a, sem_a, 0, 0).start()
        row_dma(wb_hbm, row_b, sem_b, 0, 0).start()

    @pl.when(r + 1 < n_rows)
    def _():
        row_dma(wa_hbm, row_a, sem_a, (r + 1) % 2, r + 1).start()
        row_dma(wb_hbm, row_b, sem_b, (r + 1) % 2, r + 1).start()

    row_dma(wa_hbm, row_a, sem_a, r % 2, r).wait()
    row_dma(wb_hbm, row_b, sem_b, r % 2, r).wait()
    slot = r % 2

    ops = (FH_bd[...], Fr[...], Fi[...], Fsr[...], Fsi[...], MH_bd[...])
    group_corrfit, pack_leaders, _ = make_group_corrfit(
        w, G, PW, validate, val_ratio, vw, dc_normalize)

    _, _, group_corr = make_group_corrfit(
        w, G, PW, validate, val_ratio, vw, dc_normalize)
    for g in range(n_groups):
        n_keep = min(G, n_cols - g * G)
        base = g * G
        if stub == "store":  # measurement stub: grid + DMA + store floor
            z = (row_a[slot, 0:1, 0:G] + row_b[slot, 0:1, 0:G])
            u_ref[0, 0:1, base:base + n_keep] = z[:, :n_keep]
            v_ref[0, 0:1, base:base + n_keep] = z[:, :n_keep]
            inval_ref[0, 0:1, base:base + n_keep] = z[:, :n_keep]
            continue
        WA = row_a[slot, :, g * GW:(g + 1) * GW]
        WB = row_b[slot, :, g * GW:(g + 1) * GW]
        if stub == "corr":  # measurement stub: no peak fit
            s_ = jnp.sum(group_corr(WA, WB, ops), axis=0, keepdims=True)
            u_ref[0, 0:1, base:base + n_keep] = s_[:, :n_keep]
            v_ref[0, 0:1, base:base + n_keep] = s_[:, :n_keep]
            inval_ref[0, 0:1, base:base + n_keep] = s_[:, :n_keep]
            continue
        u, v, invalid = group_corrfit(WA, WB, ops)
        u_ref[0, 0:1, base:base + n_keep] = pack_leaders(u)[:, :n_keep]
        v_ref[0, 0:1, base:base + n_keep] = pack_leaders(v)[:, :n_keep]
        inval_ref[0, 0:1, base:base + n_keep] = (
            pack_leaders(invalid)[:, :n_keep])


@functools.partial(
    jax.jit,
    static_argnames=(
        "wind_size", "n_cols", "validate", "val_ratio", "validation_window",
        "dc_normalize", "interpret", "stub",
    ),
)
def correlate_peakfit_pallas(
    windows_a: jnp.ndarray,
    windows_b: jnp.ndarray,
    *,
    wind_size: int,
    n_cols: int,
    validate: bool = True,
    val_ratio: float = 1.2,
    validation_window: int = 3,
    dc_normalize: bool = False,
    interpret: bool = False,
    stub: str = "none",
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Fused correlation + sub-pixel peak fit over lane-packed windows.

    Args:
      windows_a, windows_b: ``(n_rows, w, Lp)`` lane-packed f32 window
        tensors (see ``pack_windows`` / ``shift_windows_pallas(packed=True)``).
      n_cols: real windows per row (tail lanes beyond ``n_cols*w`` are
        padding — they duplicate the last window or hold garbage; their
        results are never stored).

    Returns flat ``(u, v, invalid)`` of length ``n_rows*n_cols`` with the
    exact ``ops.peakfit.correlation_to_displacement`` semantics
    (min-subtract + log-Gaussian fit + peak2peak validation; reference
    PIVbackend.py:346-422).
    """
    w = wind_size
    FH_bd, Fr, Fi, Fsr, Fsi, MH_bd, G, PW = _operators(w)
    n_rows = windows_a.shape[0]
    n_groups = -(-n_cols // G)
    Lp = n_groups * G * w
    assert windows_a.shape == (n_rows, w, Lp), (windows_a.shape, Lp)

    kernel = functools.partial(
        _corrfit_kernel,
        w=w, n_cols=n_cols, G=G, PW=PW, validate=validate,
        val_ratio=val_ratio, vw=validation_window,
        dc_normalize=dc_normalize, stub=stub,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_rows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=[
            pl.BlockSpec((1, 1, n_cols), lambda r, *_: (r, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 3,
        scratch_shapes=[
            pltpu.VMEM((2, w, Lp), jnp.float32),
            pltpu.VMEM((2, w, Lp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_sds = jax.ShapeDtypeStruct((n_rows, 1, n_cols), jnp.float32)
    u, v, inval = pl.pallas_call(
        kernel,
        out_shape=[out_sds] * 3,
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(n_rows * n_cols * 10 * w * w * 2 * w),
            bytes_accessed=int(2 * n_rows * w * Lp * 4),
            transcendentals=int(5 * n_rows * n_cols),
        ),
    )(
        windows_a.astype(jnp.float32), windows_b.astype(jnp.float32),
        jnp.asarray(FH_bd), jnp.asarray(Fr), jnp.asarray(Fi),
        jnp.asarray(Fsr), jnp.asarray(Fsi), jnp.asarray(MH_bd),
    )
    u = u.reshape(-1)
    v = v.reshape(-1)
    return u, v, (inval.reshape(-1) > 0.5) if validate else None


def pack_windows(windows: jnp.ndarray, n_rows: int, n_cols: int,
                 wind_size: int) -> jnp.ndarray:
    """Repack ``[N, w, w]`` windows into the lane-packed ``(n_rows, w, Lp)``
    layout ``correlate_peakfit_pallas`` consumes (XLA transpose; used for
    window sources that don't come from the packed shift kernel)."""
    w = wind_size
    G = 128 // w
    n_groups = -(-n_cols // G)
    Lp = n_groups * G * w
    x = windows.reshape(n_rows, n_cols, w, w).transpose(0, 2, 1, 3)
    x = x.reshape(n_rows, w, n_cols * w)
    if Lp != n_cols * w:
        # pad lanes duplicate the last window (keeps the kernel NaN-free)
        pad = jnp.tile(x[:, :, -w:], (1, 1, (Lp - n_cols * w) // w))
        x = jnp.concatenate([x, pad], axis=2)
    return x


@functools.partial(
    jax.jit,
    static_argnames=(
        "frame_shape", "wind_size", "overlap", "validate", "val_ratio",
        "validation_window", "max_shift", "dc_normalize", "interpret",
        "stub", "extract_mode",
    ),
)
def fused_piv_pass(
    frame_a: jnp.ndarray,
    frame_b: jnp.ndarray,
    vxa: jnp.ndarray,
    vya: jnp.ndarray,
    vxb: jnp.ndarray,
    vyb: jnp.ndarray,
    *,
    frame_shape: Tuple[int, int],
    wind_size: int,
    overlap: int,
    validate: bool = True,
    val_ratio: float = 1.2,
    validation_window: int = 3,
    max_shift: Optional[int] = None,
    dc_normalize: bool = False,
    interpret: bool = False,
    stub: str = "none",
    extract_mode: str = "rolls",
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """One full PIV pass (shifted windows -> correlation -> peak fit).

    Args:
      frame_a, frame_b: [H, W] frames (any real dtype; cast to f32).
      vxa, vya / vxb, vyb: [N] per-window shifts for each frame (CWS passes
        pass -u/2 / +u/2; pass 1 passes zeros; DWS passes integers).

    Returns flat ``(u, v, invalid)`` of length n_rows*n_cols (invalid None
    when ``validate`` is False).
    """
    H0, W0 = frame_shape
    w = wind_size
    step = wind_size - overlap
    n_rows = (H0 - w) // step + 1
    n_cols = (W0 - w) // step + 1
    S = max_shift if max_shift is not None else max(w // 2, 1)
    FH_bd, Fr, Fi, Fsr, Fsi, MH_bd, G, PW = _operators(w)
    mxu = extract_mode == "mxu"
    grain = 16 if mxu else 8

    def prep(frame):
        f = flat_wrap_pad(frame.astype(jnp.float32), S)
        H, W = H0 + 2 * S, W0 + 2 * S
        Hp = -(-H // grain) * grain
        Wp = -(-max(W, 256) // 128) * 128
        if (Hp, Wp) != (H, W):
            f = jnp.pad(f, ((0, Hp - H), (0, Wp - W)))
        if mxu:
            f = f.astype(jnp.bfloat16)  # exact for 8-bit grey levels
        return f, H, W, Wp

    fa, H, W, Wp = prep(frame_a)
    fb, _, _, _ = prep(frame_b)

    def prep_v(vx, vy):
        vx = jnp.clip(vx.astype(jnp.float32), -S, S).reshape(n_rows, n_cols)
        vy = jnp.clip(vy.astype(jnp.float32), -S, S).reshape(n_rows, n_cols)
        dy = jnp.floor(vy)
        dx = jnp.floor(vx)
        return (dy.astype(jnp.int32), dx.astype(jnp.int32), vy - dy, vx - dx)

    BH = (-(-(w + 2 * S + 16) // 16) * 16 if mxu
          else -(-(2 * S + w + 8) // 8) * 8)
    band_dt = jnp.bfloat16 if mxu else jnp.float32
    band_shape = (2, BH, Wp) if mxu else (2, BH + 8, Wp)
    kernel = functools.partial(
        _fused_kernel,
        H=H, W=W, Wp=Wp, w=w, step=step, S=S, n_cols=n_cols, OFF=S,
        G=G, PW=PW, validate=validate, val_ratio=val_ratio,
        vw=validation_window, dc_normalize=dc_normalize, stub=stub,
        extract_mode=extract_mode,
    )
    # NOTE: whole-array scalar prefetch keeps all 7 per-window maps
    # resident in SMEM — at >=190x190 vector grids that exceeds the 1 MB
    # SMEM budget and the compile fails (the production shift/DEF kernels
    # stream row-blocked maps instead, kernels/shift_pallas.py).  This
    # kernel is a measured dead end kept for the ledger; not worth the
    # same surgery unless it is ever revived.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(n_rows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=[
            # rank-3 (n_rows, 1, n_cols): Mosaic requires the trailing two
            # block dims to be tile-divisible or full — (1, n_cols) as the
            # trailing dims of a rank-3 block satisfies that for any n_cols
            pl.BlockSpec((1, 1, n_cols), lambda r, *_: (r, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 3,
        scratch_shapes=[
            pltpu.VMEM(band_shape, band_dt),
            pltpu.VMEM(band_shape, band_dt),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_sds = jax.ShapeDtypeStruct((n_rows, 1, n_cols), jnp.float32)
    u, v, inval = pl.pallas_call(
        kernel,
        out_shape=[out_sds] * 3,
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(n_rows * n_cols * (10 * w * w * 2 * w + 8 * w * w)),
            bytes_accessed=int(2 * n_rows * BH * Wp * 4),
            transcendentals=int(5 * n_rows * n_cols),
        ),
    )(
        *prep_v(vxa, vya), *prep_v(vxb, vyb),
        fa, fb,
        jnp.asarray(FH_bd), jnp.asarray(Fr), jnp.asarray(Fi),
        jnp.asarray(Fsr), jnp.asarray(Fsi), jnp.asarray(MH_bd),
    )
    u = u.reshape(-1)
    v = v.reshape(-1)
    return u, v, (inval.reshape(-1) > 0.5) if validate else None
