"""Pallas TPU kernel for window-DEFORMATION resampling (DEF mode).

DEF resamples every window with a per-PIXEL displacement field (the
locally-linearised predictor: center + gradient x in-window offset), which
the XLA path expresses as 4 flat gathers of dense ``[N, w, w]`` indices
(``ops.shifts.cws_shift`` with dense offsets — the same gather lowering
that made plain CWS 122 ms/frame before the shift kernel).  Measured at
the 4 MP headline geometry the XLA DEF engine runs at ~1.1 s/pair — two
orders of magnitude off the CWS path.

This kernel keeps the shift kernel's memory structure (band DMA per window
row, aligned block + two dynamic rolls) but extracts a tile with an extra
``M``-pixel margin and evaluates the per-pixel bilinear sample as an EXACT
accumulation over the ``(2M+2)^2`` static integer shifts of the tile:

    out(i,j) = sum_{ky,kx} wy(i,j,ky) * wx(i,j,kx) * tile[i+ky, j+kx]
    wy(i,j,ky) = max(0, 1 - |ry(i,j) - ky|)        (hat function)

The hat weights are exactly zero outside the two integer neighbours of
``ry``, so the sum reproduces the reference's bilinear blend term for term
(adding exact zeros); tile addressing is static, so no gathers and no
per-pixel dynamic addressing anywhere.  The reference's "integer shift in
either axis -> floor corner" quirk (PIVbackend.py:170) is reproduced by
substituting ``floor(r)`` for ``r`` on integer-cell pixels before the
accumulation (one-hot weights then select the floor corner).

Semantics vs the XLA dense path (``models.multipass`` DEF branch):

* identical for per-pixel offsets within ``center +- M`` pixels of the
  window's (clamped) center shift; the per-pixel *residual* (gradient x
  in-window offset + center fraction) saturates at the ``[0, 2M+1)`` tile
  range — deformations steeper than ~``2M / wind_size`` px/px are clamped
  (the XLA path, which saturates only at the frame's flat-index bounds,
  remains available via ``use_pallas="off"``);
* window-center shifts clamp to ``max_shift`` exactly like the CWS kernel;
* frame-edge addressing reproduces the reference's flat-index clamp via
  ``flat_wrap_pad`` with pad ``S + M + 1`` (``S + M + 3`` for the cubic
  stencil) — every sample stays inside the padded frame, so no in-kernel
  bounds clamp ever binds.  With ``flat_wrap=False`` the bounds clamp CAN
  bind at frame edges and shifts the whole tile (clamp-to-rectangle
  behaviour, like the CWS kernel's);
* ``interp="bicubic"`` evaluates per-pixel Keys (a = -0.5) weights over
  the ``(2M+4)^2`` tap table instead of the bilinear hats (the cubic
  weights collapse to (0,1,0,0) at integers on their own, so the
  floor-corner quirk applies to bilinear only — matching
  ``ops.shifts.bicubic_cws_shift``).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .shift_pallas import flat_wrap_pad


def def_pallas_supported(wind_size: int, margin: int = 2,
                         interp: str = "bilinear") -> bool:
    """Whether the DEF band kernel can address a window of this size.

    Tile width ``T = w + 2*margin + (4 bicubic / 1 bilinear)`` must satisfy
    ``s_col + T <= 256`` for any lane phase ``s_col <= 127`` (see the
    ValueError in :func:`def_windows_pallas`); model code uses this
    predicate to fall back to the XLA dense DEF path for larger windows.
    """
    return wind_size + 2 * margin + (4 if interp == "bicubic" else 1) <= 129


def _def_kernel(
    # row0: scalar prefetch (SMEM).  The eight per-window maps (shift
    # int/frac parts + four gradients) are row-blocked SMEM operands when
    # maps_rows (default): one (1, n_cols) row of each arrives per grid
    # step, so SMEM holds 8*n_cols scalars.  Whole-array scalar prefetch
    # (maps_rows=False, legacy) needs 8 * n_rows * n_cols * 4 B resident —
    # 2.08 MB at a 255x255 grid, over the 1 MB SMEM budget (a w16/o8 DEF
    # pass — the second pass of a w32/o16 DEF config — on a 4 MP frame
    # failed to compile).
    row0_ref, dy_ref, dx_ref, fy_ref, fx_ref,
    gyi_ref, gyj_ref, gxi_ref, gxj_ref,
    # inputs:
    frame_hbm,
    # outputs:
    out_ref,
    # scratch:
    band, band_sem,
    *,
    H: int, W: int, Wp: int, w: int, step: int, S: int, n_cols: int,
    OFF: int, M: int, cubic: bool = False, maps_rows: bool = True,
):
    r = pl.program_id(0)
    n_rows = pl.num_programs(0)
    rg0 = row0_ref[0]
    # tile side: bilinear needs rows i + k, k in [0, 2M+1]; the 4-wide
    # cubic stencil reaches one row before / two rows past that
    T = w + 2 * M + (4 if cubic else 1)
    BASE = M + (1 if cubic else 0)  # tile-origin backshift from the window
    # band must span from the 8-aligned origin (up to 7 rows before
    # pos0 - S - BASE) to the highest tile end (pos0 + S - BASE + T)
    BH = -(-(2 * S + T + 7) // 8) * 8
    Hp = -(-H // 8) * 8
    BLK_H = -(-(T + 7) // 8) * 8  # 8-aligned block height covering any t8
    BLK_W = 256

    def band_origin(row):
        o = jnp.clip((rg0 + row) * step + OFF - S - BASE, 0, Hp - BH)
        return pl.multiple_of((o // 8) * 8, 8)

    def start_band_dma(slot, row):
        return pltpu.make_async_copy(
            frame_hbm.at[pl.ds(band_origin(row), BH), :],
            band.at[slot, pl.ds(0, BH), :],
            band_sem.at[slot],
        )

    @pl.when(r == 0)
    def _():
        start_band_dma(0, 0).start()

    @pl.when(r + 1 < n_rows)
    def _():
        start_band_dma((r + 1) % 2, r + 1).start()

    start_band_dma(r % 2, r).wait()
    slot = r % 2
    by0 = band_origin(r)

    # in-window offsets (loop-invariant): ioff along sublanes, joff lanes
    half = (w - 1) / 2.0
    # Mosaic iota must be integer-typed; cast to f32 after
    ioff = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0).astype(
        jnp.float32) - half
    joff = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1).astype(
        jnp.float32) - half
    hi = jnp.float32(2 * M + 1) - 1e-3  # keeps floor(r) <= 2M

    n_k = 2 * M + (4 if cubic else 2)  # stencil taps per axis

    def keys(d):
        # Keys cubic-convolution weight, a = -0.5, |d| support < 2
        # (identical to ops.shifts.bicubic_cws_shift.cubic_weights)
        a_c = -0.5
        ad = jnp.abs(d)
        w_in = (a_c + 2) * ad ** 3 - (a_c + 3) * ad ** 2 + 1.0
        w_out = a_c * ad ** 3 - 5 * a_c * ad ** 2 + 8 * a_c * ad - 4 * a_c
        return jnp.where(ad <= 1.0, w_in, jnp.where(ad < 2.0, w_out, 0.0))

    def mget(ref, c):
        # Row-blocked maps are [n_rows, 1, n_cols] blocked (1, 1, n_cols)
        # (3-D because Mosaic requires the LAST TWO block dims to divide
        # (8, 128) or equal the array dims); the block carries only row r.
        return ref[0, 0, c] if maps_rows else ref[r, c]

    def body(c):
        dy = mget(dy_ref, c)
        dx = mget(dx_ref, c)
        ty = jnp.clip((rg0 + r) * step + OFF + dy - BASE, 0, H - T) - by0
        tx = jnp.clip(c * step + OFF + dx - BASE, 0, W - T)
        t8 = pl.multiple_of((ty // 8) * 8, 8)
        s_row = ty - t8
        a = pl.multiple_of(jnp.clip((tx // 128) * 128, 0, Wp - BLK_W), 128)
        s_col = tx - a
        block = band[slot, pl.ds(t8, BLK_H), pl.ds(a, BLK_W)]
        block = pltpu.roll(block, BLK_W - s_col, 1)[:, :T]
        block = pltpu.roll(block, BLK_H - s_row, 0)
        tile = block[:T, :]

        # per-pixel residual sample positions, in [0, 2M+1) relative to the
        # bilinear tile origin (the cubic tile starts one pixel earlier)
        ry = (M + mget(fy_ref, c)) + mget(gyi_ref, c) * ioff \
            + mget(gyj_ref, c) * joff
        rx = (M + mget(fx_ref, c)) + mget(gxi_ref, c) * ioff \
            + mget(gxj_ref, c) * joff
        ry = jnp.clip(ry, 0.0, hi)
        rx = jnp.clip(rx, 0.0, hi)
        if not cubic:
            # reference quirk (bilinear only): integer sample coordinate in
            # EITHER axis -> floor corner (one-hot weights after the
            # substitution).  The cubic weights collapse to (0,1,0,0) at
            # integers on their own — no quirk in the bicubic XLA path.
            fry = jnp.floor(ry)
            frx = jnp.floor(rx)
            int_cell = jnp.logical_or(ry == fry, rx == frx)
            ry = jnp.where(int_cell, fry, ry)
            rx = jnp.where(int_cell, frx, rx)

        acc = jnp.zeros((w, w), jnp.float32)
        for ky in range(n_k):
            if cubic:
                wy = keys(ry + 1.0 - ky)
            else:
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(ry - ky))
            for kx in range(n_k):
                if cubic:
                    wx = keys(rx + 1.0 - kx)
                else:
                    wx = jnp.maximum(0.0, 1.0 - jnp.abs(rx - kx))
                acc = acc + (wy * wx) * tile[ky:ky + w, kx:kx + w]
        out_ref[0, c] = acc.astype(out_ref.dtype)

    for c in range(n_cols):
        body(c)


@functools.partial(
    jax.jit,
    static_argnames=(
        "wind_size", "overlap", "frame_shape", "max_shift", "margin",
        "interpret", "flat_wrap", "n_rows_local", "interp", "out_dtype",
        "maps",
    ),
)
def def_windows_pallas(
    frame: jnp.ndarray,
    vel_x: jnp.ndarray,
    vel_y: jnp.ndarray,
    dudx: jnp.ndarray,
    dudy: jnp.ndarray,
    dvdx: jnp.ndarray,
    dvdy: jnp.ndarray,
    *,
    frame_shape: Tuple[int, int],
    wind_size: int,
    overlap: int,
    max_shift: int | None = None,
    margin: int = 2,
    interpret: bool = False,
    flat_wrap: bool = True,
    row_start=0,
    n_rows_local: int | None = None,
    interp: str = "bilinear",
    out_dtype=jnp.float32,
    maps: str = "rows",
) -> jnp.ndarray:
    """Deforming-window resampling of all interrogation windows.

    Args:
      frame: ``[H, W]`` frame (cast to f32).
      vel_x, vel_y: ``[N]`` per-window CENTER shifts in pixels.
      dudx, dudy, dvdx, dvdy: ``[N]`` per-window displacement gradients
        (px per px): the per-pixel offset applied is
        ``vel + d/dx * joff + d/dy * ioff`` with ``ioff/joff`` the signed
        in-window pixel offsets from the window center — exactly the
        dense field the XLA DEF branch builds (models/multipass.py).
      margin: M — per-pixel residual saturation (see module docstring).
      maps: "rows" (default) streams the eight per-window maps into SMEM
        one (1, n_cols) row block per grid step, so any vector-grid size
        compiles; "prefetch" is the legacy whole-array scalar prefetch
        (8 maps resident in SMEM — overflows the 1 MB budget at
        >=181x181 grids; kept for A/B timing).

    ``out_dtype``: store element type (see shift_windows_pallas — bf16
    is bit-identical when the consumer is the single-pass bf16 DFT and
    halves the kernel's HBM store traffic).

    Returns ``[N, w, w]`` ``out_dtype`` deformed windows.
    """
    H0, W0 = frame_shape
    w = wind_size
    step = wind_size - overlap
    n_rows = (H0 - w) // step + 1
    n_cols = (W0 - w) // step + 1
    if n_rows_local is not None:
        n_rows = n_rows_local
    S = max_shift if max_shift is not None else max(w // 2, 1)
    M = margin
    cubic = interp == "bicubic"
    if not def_pallas_supported(w, M, interp):
        # lane-wrap hazard (same as shift_pallas): the tile is lanes
        # s_col..s_col+T-1 of a rolled 256-lane block, s_col <= 127 and
        # T = w + 2M + (4 cubic / 1 bilinear).  s_col + T > 256 silently
        # wraps to the wrong frame columns — reject; model code routes
        # larger windows to the XLA dense-gather DEF path.
        raise ValueError(
            f"def_windows_pallas: wind_size={w} margin={M} interp={interp!r} "
            f"exceeds the 256-lane block (needs w + 2*margin + "
            f"{4 if cubic else 1} <= 129); use the XLA DEF path")

    frame = frame.astype(jnp.float32)
    # pad so the extreme tile (last window row, +S shift) stays inside the
    # padded frame: base_max + T <= H0 + 2P  =>  P >= S + M + 3 for the
    # cubic stencil (T = w+2M+4, BASE = M+1), S + M + 1 for bilinear
    P = S + M + (3 if cubic else 1)
    if flat_wrap:
        frame = flat_wrap_pad(frame, P)
        OFF = P
        H, W = H0 + 2 * P, W0 + 2 * P
    else:
        OFF = 0
        H, W = H0, W0

    T = w + 2 * M + (4 if cubic else 1)
    BH = -(-(2 * S + T + 7) // 8) * 8
    Hp = -(-H // 8) * 8
    Wp = -(-max(W, 256) // 128) * 128

    def grid2(x):
        return x.astype(jnp.float32).reshape(n_rows, n_cols)

    vx = jnp.clip(grid2(vel_x), -S, S)
    vy = jnp.clip(grid2(vel_y), -S, S)
    dy = jnp.floor(vy)
    dx = jnp.floor(vx)

    if (Hp, Wp) != (H, W):
        frame = jnp.pad(frame, ((0, Hp - H), (0, Wp - W)))

    maps_rows = maps == "rows"
    kernel = functools.partial(
        _def_kernel,
        H=H, W=W, Wp=Wp, w=w, step=step, S=S, n_cols=n_cols, OFF=OFF, M=M,
        cubic=cubic, maps_rows=maps_rows,
    )
    out_spec = pl.BlockSpec(
        (1, n_cols, w, w),
        lambda r, *_: (r, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    scratch = [
        # +16 rows: aligned row-block loads may read past the band tail
        pltpu.VMEM((2, BH + 16, Wp), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if maps_rows:
        # eight row-blocked SMEM map operands (~8 KB/step at a 255-wide
        # grid) + the frame in ANY; only row0 stays scalar-prefetched.
        # 3-D maps: Mosaic requires the last TWO block dims to divide
        # (8, 128) or equal the array dims — see shift_pallas.
        map_spec = pl.BlockSpec((1, 1, n_cols), lambda r, *_: (r, 0, 0),
                                memory_space=pltpu.SMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_rows,),
            in_specs=[map_spec] * 8 + [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_spec,
            scratch_shapes=scratch,
        )
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=9,
            grid=(n_rows,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_spec,
            scratch_shapes=scratch,
        )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, n_cols, w, w), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(n_rows * n_cols
                      * (2 * M + (4 if cubic else 2)) ** 2 * 3 * w * w),
            bytes_accessed=int(n_rows * BH * W * 4
                               + n_rows * n_cols * w * w * 4),
            transcendentals=0,
        ),
    )
    mshape = (n_rows, 1, n_cols) if maps_rows else (n_rows, n_cols)
    out = call(
        jnp.asarray(row_start, jnp.int32).reshape(1),
        dy.astype(jnp.int32).reshape(mshape),
        dx.astype(jnp.int32).reshape(mshape),
        (vy - dy).reshape(mshape),
        (vx - dx).reshape(mshape),
        grid2(dvdy).reshape(mshape),
        grid2(dvdx).reshape(mshape),
        grid2(dudy).reshape(mshape),
        grid2(dudx).reshape(mshape),
        frame,
    )
    return out.reshape(n_rows * n_cols, w, w)
