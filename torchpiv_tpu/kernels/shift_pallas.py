"""Pallas TPU kernel for CWS/DWS window shifting — the engine's hot op.

The XLA path (`ops.shifts`) expresses the per-window shifted resampling as 4
flat gathers of ``[N, w, w]`` indices into the frame; TPU lowers such random
gathers at ~0.5 Gelem/s, making this >90% of multipass runtime (measured
122 ms per call for a 1 MP frame at 32 px windows).  This kernel restructures
the op around the memory system instead:

* grid = one program per *window row*; each program DMAs a horizontal band of
  the frame (rows ``r0 - S .. r0 + w + S``, all columns) from HBM into VMEM,
  double-buffered across grid steps so the next band streams in while the
  current one is processed;
* per-window integer shift parts arrive as scalar-prefetch arrays (SMEM) and
  select a ``(w+1, w+1)`` tile inside the band with dynamic slices;
* the bilinear blend is 4 shifted static slices of the tile combined with
  scalar weights on the VPU — no gathers anywhere.

Semantics vs the reference (PIVbackend.py:147-216) and the XLA path:

* shifts are clamped to a static ``max_shift`` (default ``wind_size // 2``,
  physically the largest displacement a correlation window can detect);
* with ``flat_wrap`` (the default) the kernel samples a padded frame built by
  ``flat_wrap_pad`` whose borders reproduce the reference's flat-index
  clamped addressing EXACTLY (wrapped columns, clamped corners), so even the
  frame-edge windows match the reference bit-for-bit for integer shifts;
  ``flat_wrap=False`` clamps tiles to the frame rectangle instead;
* fractional weights are per-window scalars (the reference computes them per
  pixel in f32, where they vary only by ~1e-4 rounding; the discrete
  integer-shift fallback — floor corner when either axis shift is integer —
  is preserved per window).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_kernel(
    # row0: scalar prefetch (SMEM).  dy/dx/fy/fx: per-window shift maps —
    # row-blocked SMEM operands (maps_rows=True, the default: block
    # (1, n_cols) of row r arrives per grid step, so SMEM holds 4*n_cols
    # scalars instead of the whole [n_rows, n_cols] maps; whole-array
    # scalar prefetch overflows the 1 MB SMEM at >=255x255 vector grids —
    # 4 x 260 KB — which is exactly a w16/o8 pass on a 4 MP frame, i.e.
    # the second pass of the production w32/o16 2xCWS config) or legacy
    # whole-array scalar prefetch (maps_rows=False).
    row0_ref, dy_ref, dx_ref, fy_ref, fx_ref,
    # inputs:
    frame_hbm,
    # outputs:
    out_ref,
    # scratch:
    band, band_sem,
    *,
    H: int, W: int, Wp: int, w: int, step: int, S: int, n_cols: int,
    OFF: int, packed: bool = False, n_cols_pad: int = 0,
    maps_rows: bool = True,
):
    # H/W are the *kernel-view* frame dims (includes any flat-wrap padding);
    # OFF is the window-origin offset into that view.  packed=True stores
    # window c at lanes [c*w, (c+1)*w) of a (1, w, Lp) block (the layout
    # fused_pass.correlate_peakfit_pallas consumes); pad columns beyond
    # n_cols duplicate the last window.
    r = pl.program_id(0)
    n_rows = pl.num_programs(0)
    rg0 = row0_ref[0]  # global window-row offset (sharded row blocks)
    # Band height rounded to the sublane tile (8) — DMA slices must be
    # tile-aligned in both offset and size; spans from the 8-aligned origin
    # (<= 7 rows before pos0 - S) to the highest tile end (pos0 + S + w + 1).
    BH = -(-(2 * S + w + 8) // 8) * 8
    Hp = -(-H // 8) * 8  # frame rows padded by the wrapper
    BLK_H = w + 8  # aligned row-block height (covers any ty mod 8)
    BLK_W = 256  # aligned col-block width (covers any tx mod 128 + w + 1)

    def band_origin(row):
        o = jnp.clip((rg0 + row) * step + OFF - S, 0, Hp - BH)
        return pl.multiple_of((o // 8) * 8, 8)

    def start_band_dma(slot, row):
        return pltpu.make_async_copy(
            frame_hbm.at[pl.ds(band_origin(row), BH), :],
            band.at[slot, pl.ds(0, BH), :],
            band_sem.at[slot],
        )

    # Double-buffered band pipeline: program r consumes slot r%2, which was
    # started by program r-1 (program 0 primes its own).
    @pl.when(r == 0)
    def _():
        start_band_dma(0, 0).start()

    @pl.when(r + 1 < n_rows)
    def _():
        start_band_dma((r + 1) % 2, r + 1).start()

    start_band_dma(r % 2, r).wait()
    slot = r % 2
    by0 = band_origin(r)

    def mget(ref, c):
        # Row-blocked maps are [n_rows, 1, n_cols] blocked (1, 1, n_cols)
        # (3-D because Mosaic requires the LAST TWO block dims to divide
        # (8, 128) or equal the array dims); the block carries only row r.
        return ref[0, 0, c] if maps_rows else ref[r, c]

    def body(c):
        cc = min(c, n_cols - 1)  # packed pad columns duplicate the last
        dy = mget(dy_ref, cc)
        dx = mget(dx_ref, cc)
        fy = mget(fy_ref, cc)
        fx = mget(fx_ref, cc)
        ty = jnp.clip((rg0 + r) * step + OFF + dy, 0, H - (w + 1)) - by0
        tx = jnp.clip(cc * step + OFF + dx, 0, W - (w + 1))

        # Mosaic needs provably aligned vector-load offsets: load an aligned
        # superset block, then rotate the sub-tile into place (dynamic
        # rotates are cheap VPU ops; unaligned loads are not expressible).
        # Order matters: the lane rotate must run on the full 256-lane block,
        # but cropping columns FIRST makes the row rotate operate on a
        # (w+8, w+1)-lane sliver — a fraction of the register traffic.
        t8 = pl.multiple_of((ty // 8) * 8, 8)
        s_row = ty - t8
        a = pl.multiple_of(jnp.clip((tx // 128) * 128, 0, Wp - BLK_W), 128)
        s_col = tx - a
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
        # Reference fallback: integer shift in EITHER axis -> floor corner.
        integer_cell = jnp.logical_or(fy == 0.0, fx == 0.0)
        res = jnp.where(integer_cell, f11, blend).astype(out_ref.dtype)
        if packed:
            out_ref[0, :, c * w:(c + 1) * w] = res
        else:
            out_ref[0, c] = res

    # The window loop is UNROLLED (python range, static c): measured 35%
    # faster than lax.fori_loop on v5e — static store/SMEM addresses and
    # free cross-window instruction scheduling.  (Multi-window fori_loop
    # bodies measured no better than single-window: it was never the loop
    # bookkeeping, it is the address math + masked stores that static
    # indices shrink.)
    for c in range(n_cols_pad if packed else n_cols):
        body(c)




def _shift_kernel_bicubic(
    # row0: scalar prefetch; dy/dx/fy/fx: row-blocked SMEM maps when
    # maps_rows (default — see _shift_kernel's note on the 1 MB SMEM
    # budget), legacy whole-array scalar prefetch otherwise.
    row0_ref, dy_ref, dx_ref, fy_ref, fx_ref,
    # inputs:
    frame_hbm,
    # outputs:
    out_ref,
    # scratch:
    band, band_sem,
    *,
    H: int, W: int, Wp: int, w: int, step: int, S: int, n_cols: int,
    OFF: int, maps_rows: bool = True,
):
    """Bicubic (cubic-convolution, a = -0.5) per-window shift.

    Mirrors ``ops.shifts.bicubic_cws_shift`` (the capability of the
    reference's dead ``piv_iteration_CWS_Fast``, PIVbackend.py:599-675) —
    16 flat gathers there, which lower catastrophically on TPU.  Here the
    4x4 cubic stencil is an accumulation over the 16 STATIC shifts of a
    ``(w+4)``-tile with per-window SCALAR cubic weights; integer shifts
    collapse exactly to the integer sample (weights become (0,1,0,0)).
    """
    r = pl.program_id(0)
    n_rows = pl.num_programs(0)
    rg0 = row0_ref[0]
    T = w + 4  # stencil rows floor-1 .. floor+2 relative to each pixel
    # band spans from the 8-aligned origin (<= 7 rows before pos0 - S - 1)
    # to the highest tile end (pos0 + S - 1 + T)
    BH = -(-(2 * S + T + 7) // 8) * 8
    Hp = -(-H // 8) * 8
    BLK_H = -(-(T + 7) // 8) * 8
    BLK_W = 256

    def band_origin(row):
        o = jnp.clip((rg0 + row) * step + OFF - S - 1, 0, Hp - BH)
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

    def cubic_weights(t):
        # Keys cubic convolution, a = -0.5 (identical to
        # ops.shifts.bicubic_cws_shift.cubic_weights)
        a = -0.5
        d0 = t + 1.0
        d2 = 1.0 - t
        d3 = 2.0 - t
        w0 = a * d0 ** 3 - 5 * a * d0 ** 2 + 8 * a * d0 - 4 * a
        w1 = (a + 2) * t ** 3 - (a + 3) * t ** 2 + 1.0
        w2 = (a + 2) * d2 ** 3 - (a + 3) * d2 ** 2 + 1.0
        w3 = a * d3 ** 3 - 5 * a * d3 ** 2 + 8 * a * d3 - 4 * a
        return (w0, w1, w2, w3)

    def mget(ref, c):
        # see _shift_kernel.mget: row-blocked maps are [n_rows, 1, n_cols]
        return ref[0, 0, c] if maps_rows else ref[r, c]

    def body(c):
        dy = mget(dy_ref, c)
        dx = mget(dx_ref, c)
        fy = mget(fy_ref, c)
        fx = mget(fx_ref, c)
        # tile origin = window origin + floor(shift) - 1 (stencil margin)
        ty = jnp.clip((rg0 + r) * step + OFF + dy - 1, 0, H - T) - by0
        tx = jnp.clip(c * step + OFF + dx - 1, 0, W - T)
        t8 = pl.multiple_of((ty // 8) * 8, 8)
        s_row = ty - t8
        a_ = pl.multiple_of(jnp.clip((tx // 128) * 128, 0, Wp - BLK_W), 128)
        s_col = tx - a_
        block = band[slot, pl.ds(t8, BLK_H), pl.ds(a_, BLK_W)]
        block = pltpu.roll(block, BLK_W - s_col, 1)[:, :T]
        block = pltpu.roll(block, BLK_H - s_row, 0)
        tile = block[:T, :]

        wy = cubic_weights(fy)
        wx = cubic_weights(fx)
        acc = jnp.zeros((w, w), jnp.float32)
        for ky in range(4):
            row_acc = jnp.zeros((w, w), jnp.float32)
            for kx in range(4):
                row_acc = row_acc + wx[kx] * tile[ky:ky + w, kx:kx + w]
            acc = acc + wy[ky] * row_acc
        out_ref[0, c] = acc.astype(out_ref.dtype)

    for c in range(n_cols):
        body(c)




def flat_wrap_pad(frame: jnp.ndarray, P: int) -> jnp.ndarray:
    """Pad a frame so 2-D sampling of the result reproduces the reference's
    *flat-index-clamped* addressing of the original (PIVbackend.py:177-180):

    * horizontally, out-of-row columns wrap into the adjacent row (flat index
      ``r*W + c`` with ``c`` outside ``[0, W)`` lands in row ``r±1``);
    * row 0's left overhang and the last row's right overhang clamp to the
      first/last pixel (flat clamp to ``[0, H*W-1]``);
    * fully out-of-range rows clamp to the first/last pixel too.
    """
    H, W = frame.shape
    left = jnp.roll(frame, 1, axis=0)[:, W - P:]
    left = left.at[0, :].set(frame[0, 0])
    right = jnp.roll(frame, -1, axis=0)[:, :P]
    right = right.at[-1, :].set(frame[-1, -1])
    mid = jnp.concatenate([left, frame, right], axis=1)
    top = jnp.full((P, W + 2 * P), frame[0, 0], frame.dtype)
    # virtual row -1 with columns >= W wraps forward into row 0's head
    # (flat index -W + x = x - W >= 0); deeper rows clamp entirely.
    top = top.at[-1, W + P:].set(frame[0, :P])
    bot = jnp.full((P, W + 2 * P), frame[-1, -1], frame.dtype)
    # virtual row H with columns < 0 wraps back into the last row's tail
    # (flat index H*W + x < H*W); deeper rows clamp entirely.
    bot = bot.at[0, :P].set(frame[-1, W - P:])
    return jnp.concatenate([top, mid, bot], axis=0)


def shift_pallas_supported(wind_size: int, interp: str = "bilinear") -> bool:
    """Whether the band-DMA shift kernel can address a window of this size.

    The per-window tile is lanes ``s_col..s_col+T-1`` of a rolled 256-lane
    aligned block, with ``s_col = tx mod 128 <= 127`` and ``T = w+1``
    (bilinear) / ``w+4`` (bicubic).  ``s_col + T > 256`` would wrap to the
    wrong frame columns, so the kernel rejects those sizes; model code uses
    this predicate to route larger windows to the XLA shift paths.
    """
    return wind_size <= (125 if interp == "bicubic" else 128)


@functools.partial(
    jax.jit,
    static_argnames=(
        "wind_size", "overlap", "frame_shape", "max_shift", "interpret",
        "flat_wrap", "variant", "n_rows_local", "packed", "interp",
        "out_dtype", "maps",
    ),
)
def shift_windows_pallas(
    frame: jnp.ndarray,
    vel_x: jnp.ndarray,
    vel_y: jnp.ndarray,
    *,
    frame_shape: Tuple[int, int],
    wind_size: int,
    overlap: int,
    max_shift: int | None = None,
    interpret: bool = False,
    flat_wrap: bool = True,
    variant: str = "rolls",
    row_start=0,
    n_rows_local: int | None = None,
    packed: bool = False,
    interp: str = "bilinear",
    out_dtype=jnp.float32,
    maps: str = "rows",
) -> jnp.ndarray:
    """Bilinear (CWS) per-window shift of all interrogation windows.

    Args:
      frame: ``[H, W]`` float32 frame.
      vel_x, vel_y: ``[N]`` per-window shifts in pixels (float32).  Pass
        integer-valued arrays for DWS semantics (the kernel then reduces to a
        pure integer tile copy).
      flat_wrap: reproduce the reference's flat-index edge semantics exactly
        via a padded frame (costs one cheap pad); False clamps tiles to the
        frame rectangle at the edges instead.
      variant: "rolls" (f32 band, two dynamic rotates per window; default)
        or "phases" (bf16 sublane phase-table band + i32-bitcast lane
        rotates — bit-identical output, similar measured speed, half the
        band bandwidth but 16x the band VMEM).
      row_start, n_rows_local: process only window rows
        ``[row_start, row_start + n_rows_local)`` of the full grid
        (``vel_*`` then cover just that block) — the window-sharded path's
        per-shard row block.  ``row_start`` may be a traced value.
      packed: emit the lane-packed ``(n_rows, w, Lp)`` layout consumed by
        ``fused_pass.correlate_peakfit_pallas`` (window ``c`` at lanes
        ``[c*w, (c+1)*w)``, tail lanes duplicating the last window) instead
        of ``[N, w, w]`` — avoids every XLA layout copy between the shift
        and the correlator.  "rolls" variant only.
      maps: how the per-window shift maps reach SMEM.  "rows" (default)
        streams one ``(1, n_cols)`` row block per grid step — SMEM holds
        ``4 * n_cols`` scalars, so any vector-grid size compiles.
        "prefetch" is the legacy whole-array scalar prefetch: all four
        ``[n_rows, n_cols]`` maps resident in SMEM, which EXCEEDS the
        1 MB SMEM budget at >=255x255 grids (a w16/o8 pass on a 4 MP
        frame — the second pass of the w32/o16 2xCWS config — fails to
        compile: 4 x 260 KB + spill).  Kept for A/B timing;
        the experimental variants (phases/bf16/mxu/lanephases) always
        use it (their bodies predate the row-blocked layout).

    ``out_dtype``: element type of the KERNEL's stores (f32 default).
    bfloat16 halves the kernel's HBM store traffic; pass it when the
    consumer is the single-pass bf16 DFT (``dft_precision="default"``) —
    the blend still computes in f32 and only the store rounds, which is
    bit-identical to the downstream bf16 cast it replaces.

    Returns ``[N, w, w]`` ``out_dtype`` shifted windows in row-major window order
    (``N = n_rows_local * n_cols`` when a row block is given), or
    ``(n_rows, w, Lp)`` when ``packed``.
    """
    H0, W0 = frame_shape
    w = wind_size
    step = wind_size - overlap
    n_rows = (H0 - w) // step + 1
    n_cols = (W0 - w) // step + 1
    if n_rows_local is not None:
        n_rows = n_rows_local
    S = max_shift if max_shift is not None else max(w // 2, 1)
    phases = variant == "phases"
    bf16 = variant == "bf16"
    mxu = variant == "mxu"
    lanephases = variant == "lanephases"
    cubic = interp == "bicubic"
    if cubic and (phases or bf16 or mxu or lanephases or packed):
        raise ValueError("bicubic requires the plain 'rolls' variant")
    if out_dtype != jnp.float32 and (phases or bf16 or mxu or lanephases):
        raise ValueError("out_dtype is supported by the 'rolls'/bicubic "
                         "kernels only")
    if not shift_pallas_supported(w, interp):
        # lane-wrap hazard: the per-window tile is read as lanes
        # s_col..s_col+T-1 of a rolled 256-lane block with s_col <= 127 and
        # T = w+1 (bilinear) / w+4 (bicubic).  s_col + T > 256 silently
        # wraps to the wrong frame columns — reject instead; callers route
        # to the XLA shift paths (ops.shifts) for larger windows.
        raise ValueError(
            f"shift_windows_pallas: wind_size={w} with interp={interp!r} "
            f"exceeds the 256-lane block (needs s_col+T <= 256, i.e. "
            f"wind_size <= {125 if cubic else 128}); use the XLA shift path")

    frame = frame.astype(jnp.float32)
    P = S + 2 if cubic else S  # cubic stencil reaches floor-1..floor+2
    if flat_wrap:
        frame = flat_wrap_pad(frame, P)
        OFF = P
        H, W = H0 + 2 * P, W0 + 2 * P
    else:
        OFF = 0
        H, W = H0, W0

    grain = 16 if (phases or bf16 or mxu) else 8  # bf16 sublane tile is 16
    if mxu:
        BH = -(-(w + 2 * S + 16) // 16) * 16
    elif phases or bf16:
        BH = -(-(w + 2 * S + 1) // 16) * 16
    elif cubic:
        BH = -(-(2 * S + (w + 4) + 7) // 8) * 8
    else:
        BH = -(-(2 * S + w + 8) // 8) * 8
    Hp = -(-H // grain) * grain  # row pad so aligned band DMAs stay in bounds
    Wp = -(-max(W, 256) // 128) * 128  # col pad for aligned 256-wide blocks
    if lanephases:
        # the 16-entry lane-phase bank requires s_col < 128, i.e. the
        # aligned-block clip must never bind: pad so floor128(tx) + 256
        # always fits
        Wp += 256

    vx = jnp.clip(vel_x.astype(jnp.float32), -S, S).reshape(n_rows, n_cols)
    vy = jnp.clip(vel_y.astype(jnp.float32), -S, S).reshape(n_rows, n_cols)
    dy = jnp.floor(vy)
    dx = jnp.floor(vx)
    fy = vy - dy
    fx = vx - dx

    if (Hp, Wp) != (H, W):
        frame = jnp.pad(frame, ((0, Hp - H), (0, Wp - W)))
    if phases or bf16 or mxu:
        frame = frame.astype(jnp.bfloat16)  # exact for 8-bit grey levels

    if packed and (phases or bf16 or mxu or lanephases):
        raise ValueError("packed output requires the 'rolls' variant")
    if packed:
        G = 128 // w  # whole windows per vreg (w <= 128 checked above)
        n_groups = -(-n_cols // G)
        Lp = n_groups * G * w
    if phases or bf16 or mxu or lanephases:
        # measured-dead-end variants live in the experimental namespace;
        # the default "rolls"/bicubic paths never import it
        from ..experimental import shift_variants as _sv

        body = (_sv._shift_kernel_lanephases if lanephases
                else (_sv._shift_kernel_phases if phases
                      else (_sv._shift_kernel_bf16 if bf16
                            else _sv._shift_kernel_mxu)))
    else:
        body = _shift_kernel_bicubic if cubic else _shift_kernel
    # Experimental variant bodies predate the row-blocked map layout and
    # index the maps by grid row — force the legacy layout for them.
    maps_rows = maps == "rows" and not (phases or bf16 or mxu or lanephases)
    kernel = functools.partial(
        body,
        H=H, W=W, Wp=Wp, w=w, step=step, S=S, n_cols=n_cols, OFF=OFF,
        **({"packed": True, "n_cols_pad": n_groups * G} if packed else {}),
        **({} if (phases or bf16 or mxu or lanephases)
           else {"maps_rows": maps_rows}),
    )
    if mxu:
        scratch = [
            pltpu.VMEM((2, BH, Wp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    elif lanephases:
        scratch = [
            # 16 lane-phase copies of the band (+8 row-block slack)
            pltpu.VMEM((16, BH + 8, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ]
    elif phases:
        scratch = [
            pltpu.VMEM((16, BH + 16, Wp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ]
    elif bf16:
        scratch = [
            pltpu.VMEM((2, BH + 16, Wp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ]
    else:
        scratch = [
            # +8/+16 rows: aligned row-block loads may read past the band
            # tail (the bicubic block is taller).
            pltpu.VMEM((2, BH + (16 if cubic else 8), Wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    if packed:
        out_spec = pl.BlockSpec((1, w, Lp), lambda r, *_: (r, 0, 0),
                                memory_space=pltpu.VMEM)
        out_sds = jax.ShapeDtypeStruct((n_rows, w, Lp), out_dtype)
    else:
        out_spec = pl.BlockSpec((1, n_cols, w, w), lambda r, *_: (r, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_sds = jax.ShapeDtypeStruct((n_rows, n_cols, w, w), out_dtype)
    if maps_rows:
        # dy/dx/fy/fx as row-blocked SMEM operands: the pipeline stages one
        # (1, 1, n_cols) row of each map into SMEM per grid step (~4 KB at
        # a 255-wide grid), so the kernel compiles for ANY vector-grid
        # size; only row0 (the sharded row-block offset) stays
        # scalar-prefetched.  3-D maps because Mosaic requires the last
        # TWO block dims to divide (8, 128) or equal the array dims — the
        # (1, n_cols) block of a 2-D [n_rows, n_cols] map violates that
        # on the row dim; (1, n_cols) of [1, n_cols] is exact.
        map_spec = pl.BlockSpec((1, 1, n_cols), lambda r, *_: (r, 0, 0),
                                memory_space=pltpu.SMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_rows,),
            in_specs=[map_spec] * 4 + [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_spec,
            scratch_shapes=scratch,
        )
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(n_rows,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_spec,
            scratch_shapes=scratch,
        )
    call = pl.pallas_call(
        kernel,
        out_shape=out_sds,
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * n_rows * n_cols * w * w,
            bytes_accessed=n_rows * BH * W * 4 + n_rows * n_cols * w * w * 4,
            transcendentals=0,
        ),
    )
    mshape = (n_rows, 1, n_cols) if maps_rows else (n_rows, n_cols)
    out = call(
        jnp.asarray(row_start, jnp.int32).reshape(1),
        dy.astype(jnp.int32).reshape(mshape),
        dx.astype(jnp.int32).reshape(mshape),
        fy.reshape(mshape),
        fx.reshape(mshape),
        frame,
    )
    if packed:
        return out
    return out.reshape(n_rows * n_cols, w, w)
