"""Experimental shift-kernel variants — measured dead ends, kept honest.

Alternative formulations of the band-DMA window-shift kernel
(``kernels.shift_pallas``), each BUILT, BIT-EXACT vs the "rolls" kernel,
and MEASURED SLOWER on TPU v5e (ledger: docs/ROADMAP.md):

* ``_shift_kernel_bf16`` — half-width bf16 band, two row phases,
  i32-bitcast lane rotates (same speed: traffic was never the bound);
* ``_shift_kernel_phases`` — 16-entry sublane phase table (same speed,
  16x the band VMEM);
* ``_shift_kernel_lanephases`` — 8-lane-granular pre-rotated bank +
  bounded remainder rolls (5.95 vs 2.66 ms/call: the bank build costs
  more than the select stages it saves);
* ``_shift_kernel_mxu`` — dynamic tile placement as one-hot selection
  matmuls (3.74 vs 2.67 ms/call: building the selector costs as many VPU
  ops as the rolls it replaces).

Selected via ``PIVConfig.shift_variant`` / ``shift_windows_pallas``'s
``variant=`` argument; ``shift_pallas`` imports this module lazily only
when a non-default variant is requested.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _shift_kernel_bf16(
    # scalar prefetch (SMEM):
    row0_ref, dy_ref, dx_ref, fy_ref, fx_ref,
    # inputs:
    frame_hbm,  # bf16 [Hp, Wp]
    # outputs:
    out_ref,  # f32 (1, n_cols, w, w)
    # scratch:
    phases, band_sem,
    *,
    H: int, W: int, Wp: int, w: int, step: int, S: int, n_cols: int,
    OFF: int,
):
    """bf16 band, two row-phases: all per-window data movement runs on
    half-width bf16 registers.  8-bit grey levels are exact in bf16, and the
    TPU packs adjacent bf16 rows into 32-bit sublanes, so an i32-bitcast
    sublane rotate moves rows by two — odd row offsets select the
    pre-shifted phase.  Per-window register traffic is ~4x below the f32
    two-rotate kernel."""
    r = pl.program_id(0)
    rg0 = row0_ref[0]
    BH = -(-(w + 2 * S + 1) // 16) * 16  # bf16 sublane tile is 16
    BHp = BH + 16
    Hp = -(-H // 16) * 16
    BLK_H = w + 16  # covers ty..ty+w from any 16-aligned start (even offs)
    BLK_W = 256

    o = jnp.clip((rg0 + r) * step + OFF - S, 0, Hp - BH)
    by0 = pl.multiple_of((o // 16) * 16, 16)

    dma = pltpu.make_async_copy(
        frame_hbm.at[pl.ds(by0, BH), :],
        phases.at[0, pl.ds(0, BH), :],
        band_sem,
    )
    dma.start()
    dma.wait()
    # phases[1][i] == band[i + 1] (bf16 cannot rotate by odd rows directly;
    # built once per band via an f32 round-trip, amortised over n_cols).
    base = phases[0, pl.ds(0, BHp), :].astype(jnp.float32)
    phases[1, pl.ds(0, BHp), :] = pltpu.roll(base, BHp - 1, 0).astype(
        jnp.bfloat16
    )

    def body(c, _):
        dy = dy_ref[r, c]
        dx = dx_ref[r, c]
        fy = fy_ref[r, c]
        fx = fx_ref[r, c]
        ty = jnp.clip((rg0 + r) * step + OFF + dy, 0, H - (w + 1)) - by0
        tx = jnp.clip(c * step + OFF + dx, 0, W - (w + 1))

        p2 = jax.lax.rem(ty, 2)
        te = ty - p2  # even row offset into phases[p2]
        t16 = pl.multiple_of((te // 16) * 16, 16)
        s_half = (te - t16) // 2  # row-pair rotate amount
        a = pl.multiple_of(jnp.clip((tx // 128) * 128, 0, Wp - BLK_W), 128)
        s_col = tx - a

        block = phases[p2, pl.ds(t16, BLK_H), pl.ds(a, BLK_W)]
        b32 = pltpu.bitcast(block, jnp.int32)  # (BLK_H//2, BLK_W)
        b32 = pltpu.roll(b32, BLK_W - s_col, 1)[:, : w + 1]
        b32 = pltpu.roll(b32, BLK_H // 2 - s_half, 0)
        tile = pltpu.bitcast(b32, jnp.bfloat16)[: w + 1].astype(jnp.float32)

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
        out_ref[0, c] = jnp.where(integer_cell, f11, blend)
        return 0

    jax.lax.fori_loop(0, n_cols, body, 0)


def _shift_kernel_lanephases(
    # scalar prefetch (SMEM):
    row0_ref, dy_ref, dx_ref, fy_ref, fx_ref,
    # inputs:
    frame_hbm,
    # outputs:
    out_ref,
    # scratch:
    phases, band_sem,
    *,
    H: int, W: int, Wp: int, w: int, step: int, S: int, n_cols: int,
    OFF: int,
):
    """Lane-phase-bank variant: the expensive dynamic LANE rotate (a
    generic ~log2(256)-stage select tree over the whole block) is replaced
    by (a) a 16-entry bank of 8-lane-granular pre-rotated band copies —
    built once per band row with STATIC rolls, amortized over the row's
    windows — and (b) a manual 3-stage bounded roll for the remaining
    0-7 lanes (each stage = one static roll + one scalar select).  The
    row rotate gets the same bounded 3-stage treatment.  Bit-exact vs the
    "rolls" variant."""
    r = pl.program_id(0)
    rg0 = row0_ref[0]
    BH = -(-(2 * S + w + 8) // 8) * 8
    Hp = -(-H // 8) * 8
    BLK_H = w + 8
    BLK_W = 256

    o = jnp.clip((rg0 + r) * step + OFF - S, 0, Hp - BH)
    by0 = pl.multiple_of((o // 8) * 8, 8)

    dma = pltpu.make_async_copy(
        frame_hbm.at[pl.ds(by0, BH), :],
        phases.at[0, pl.ds(0, BH), :],
        band_sem,
    )
    dma.start()
    dma.wait()
    # phases[q][:, l] == band[:, l + 8q]: 15 STATIC lane rolls per band row
    base = phases[0, pl.ds(0, BH), :]
    for q in range(1, 16):
        phases[q, pl.ds(0, BH), :] = pltpu.roll(base, Wp - 8 * q, 1)

    def bounded_roll(x, amt, axis, size):
        # 3-stage select tree for a roll amount known to be in [0, 8)
        for bit in (1, 2, 4):
            rolled = pltpu.roll(x, size - bit, axis)
            x = jnp.where((amt & bit) != 0, rolled, x)
        return x

    def body(c):
        dy = dy_ref[r, c]
        dx = dx_ref[r, c]
        fy = fy_ref[r, c]
        fx = fx_ref[r, c]
        ty = jnp.clip((rg0 + r) * step + OFF + dy, 0, H - (w + 1)) - by0
        tx = jnp.clip(c * step + OFF + dx, 0, W - (w + 1))
        t8 = pl.multiple_of((ty // 8) * 8, 8)
        s_row = ty - t8
        a = pl.multiple_of(jnp.clip((tx // 128) * 128, 0, Wp - BLK_W), 128)
        s_col = tx - a
        q = s_col // 8
        rem = s_col - 8 * q
        block = phases[q, pl.ds(t8, BLK_H), pl.ds(a, BLK_W)]
        block = bounded_roll(block, rem, 1, BLK_W)[:, : w + 1]
        block = bounded_roll(block, s_row, 0, BLK_H)
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
        out_ref[0, c] = jnp.where(integer_cell, f11, blend)

    for c in range(n_cols):
        body(c)

def _shift_kernel_mxu(
    # scalar prefetch (SMEM):
    row0_ref, dy_ref, dx_ref, fy_ref, fx_ref,
    # inputs:
    frame_hbm,  # bf16 [Hp, Wp]
    # outputs:
    out_ref,  # f32 (1, n_cols, w, w)
    # scratch:
    band, band_sem,
    *,
    H: int, W: int, Wp: int, w: int, step: int, S: int, n_cols: int,
    OFF: int,
):
    """MXU-extraction variant: the dynamic 2-D tile placement is two
    one-hot selection matmuls instead of two dynamic rolls.

    ``tile = Wy @ block @ Wx`` with ``Wx[s_col + j, j] = 1`` and
    ``Wy[i, ty + i] = 1`` — built per window from iota compares (VPU-cheap)
    and contracted on the MXU.  The band is stored bf16: 8-bit grey levels
    are exact in bf16 and one-hot operands are exact, so the f32-accumulated
    result is BIT-EXACT vs the f32 roll path while the per-window work moves
    to the otherwise-idle MXU.  Row alignment games disappear entirely (Wy
    absorbs any sublane offset); only the 128-lane block slice remains.
    """
    r = pl.program_id(0)
    n_rows = pl.num_programs(0)
    rg0 = row0_ref[0]
    BH = -(-(w + 2 * S + 16) // 16) * 16  # covers any 16-aligned origin
    Hp = -(-H // 16) * 16
    BLK_W = 256

    def band_origin(row):
        o = jnp.clip((rg0 + row) * step + OFF - S, 0, Hp - BH)
        return pl.multiple_of((o // 16) * 16, 16)

    def start_band_dma(slot, row):
        return pltpu.make_async_copy(
            frame_hbm.at[pl.ds(band_origin(row), BH), :],
            band.at[slot],
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

    # iotas are loop-invariant: build once
    rio_x = jax.lax.broadcasted_iota(jnp.int32, (BLK_W, w + 1), 0)
    cio_x = jax.lax.broadcasted_iota(jnp.int32, (BLK_W, w + 1), 1)
    rio_y = jax.lax.broadcasted_iota(jnp.int32, (w + 1, BH), 0)
    cio_y = jax.lax.broadcasted_iota(jnp.int32, (w + 1, BH), 1)

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def body(c):
        dy = dy_ref[r, c]
        dx = dx_ref[r, c]
        fy = fy_ref[r, c]
        fx = fx_ref[r, c]
        ty = jnp.clip((rg0 + r) * step + OFF + dy, 0, H - (w + 1)) - by0
        tx = jnp.clip(c * step + OFF + dx, 0, W - (w + 1))
        a = pl.multiple_of(jnp.clip((tx // 128) * 128, 0, Wp - BLK_W), 128)
        s_col = tx - a

        block = band[slot, :, pl.ds(a, BLK_W)]  # (BH, 256) bf16
        Wx = (rio_x == cio_x + s_col).astype(jnp.bfloat16)
        t1 = mm(block, Wx)  # (BH, w+1) f32, exact grey levels
        Wy = (cio_y == rio_y + ty).astype(jnp.bfloat16)
        tile = mm(Wy, t1.astype(jnp.bfloat16))  # (w+1, w+1) exact

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
        out_ref[0, c] = jnp.where(integer_cell, f11, blend)

    for c in range(n_cols):
        body(c)


def _shift_kernel_phases(
    # scalar prefetch (SMEM):
    row0_ref, dy_ref, dx_ref, fy_ref, fx_ref,
    # inputs:
    frame_hbm,  # bf16 [Hp, Wp]
    # outputs:
    out_ref,  # f32 (1, n_cols, w, w)
    # scratch:
    phases, band_sem,
    *,
    H: int, W: int, Wp: int, w: int, step: int, S: int, n_cols: int,
    OFF: int,
):
    """Phase-table variant: the band is stored bf16 (uint8 frame values are
    exact in bf16) in 16 pre-rolled sublane phases, so per-window tile
    extraction needs NO row rotate — just an aligned load from the right
    phase plus one lane rotate.  ~4x less per-window register traffic than
    the f32 two-rotate kernel."""
    r = pl.program_id(0)
    rg0 = row0_ref[0]
    BH = -(-(w + 2 * S + 1) // 16) * 16  # bf16 sublane tile is 16
    BHp = BH + 16
    Hp = -(-H // 16) * 16
    BLK_H = -(-(w + 1) // 16) * 16 + 16  # covers ty..ty+w from any t16
    BLK_W = 256

    o = jnp.clip((rg0 + r) * step + OFF - S, 0, Hp - BH)
    by0 = pl.multiple_of((o // 16) * 16, 16)

    dma = pltpu.make_async_copy(
        frame_hbm.at[pl.ds(by0, BH), :],
        phases.at[0, pl.ds(0, BH), :],
        band_sem,
    )
    dma.start()
    dma.wait()
    # Build phases[p][i] == band[i + p].  Mosaic cannot rotate bf16 vectors,
    # so the sublane rolls run on an f32 copy (the values are 8-bit grey
    # levels — exact in both types).
    base = phases[0, pl.ds(0, BHp), :].astype(jnp.float32)
    for p in range(1, 16):
        phases[p, pl.ds(0, BHp), :] = pltpu.roll(base, BHp - p, 0).astype(
            jnp.bfloat16
        )

    def body(c, _):
        dy = dy_ref[r, c]
        dx = dx_ref[r, c]
        fy = fy_ref[r, c]
        fx = fx_ref[r, c]
        ty = jnp.clip((rg0 + r) * step + OFF + dy, 0, H - (w + 1)) - by0
        tx = jnp.clip(c * step + OFF + dx, 0, W - (w + 1))

        p = jax.lax.rem(ty, 16)
        t16 = pl.multiple_of(ty - p, 16)
        a = pl.multiple_of(jnp.clip((tx // 128) * 128, 0, Wp - BLK_W), 128)
        s_col = tx - a
        block = phases[p, pl.ds(t16, BLK_H), pl.ds(a, BLK_W)]
        # Lane rotation is sublane-packing-agnostic: rotate the 32-bit view
        # (Mosaic has no bf16 rotate).
        b32 = pltpu.bitcast(block, jnp.int32)
        b32 = pltpu.roll(b32, BLK_W - s_col, 1)
        block = pltpu.bitcast(b32, jnp.bfloat16)
        tile = block[: w + 1, : w + 1].astype(jnp.float32)

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
        out_ref[0, c] = jnp.where(integer_cell, f11, blend)
        return 0

    jax.lax.fori_loop(0, n_cols, body, 0)
