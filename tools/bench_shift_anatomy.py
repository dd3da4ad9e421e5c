"""Anatomy micro-bench: which part of the shift kernel's inner loop costs?

Builds stripped variants of the production kernel (same band DMA, same
grid, same output writes) that drop parts of the per-window work:

  full      loads + lane roll + row roll + blend       (production)
  norowroll loads + lane roll + blend                  (row roll removed)
  nolaneroll loads + row roll + blend                  (lane roll removed)
  norolls   loads + blend of statically-placed slices  (both rolls removed)
  loadonly  loads + single multiply + store
  storeonly store a constant tile (loop + write floor)

Outputs are WRONG for the stripped variants — this measures cost only.
"""
from __future__ import annotations

import functools
import os
import sys

# Run fine from a fresh checkout with no editable install (tools/ is not
# on sys.path when invoked as `python tools/<name>.py`).
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/torchpiv_jaxcache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from torchpiv_tpu.kernels.shift_pallas import flat_wrap_pad  # noqa: E402
from torchpiv_tpu.utils.synthetic import particle_pair  # noqa: E402

FRAME = (2048, 2048)
W_, O_ = 32, 16
REPS = 32


def make_kernel(mode):
    def kern(dy_ref, dx_ref, fy_ref, fx_ref, frame_hbm, out_ref, band,
             band_sem, *, H, W, Wp, w, step, S, n_cols, OFF):
        r = pl.program_id(0)
        n_rows = pl.num_programs(0)
        BH = -(-(w + 2 * S + 1) // 8) * 8
        Hp = -(-H // 8) * 8
        BLK_H = w + 8
        BLK_W = 256

        def band_origin(row):
            o = jnp.clip(row * step + OFF - S, 0, Hp - BH)
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

        def body(c, _):
            dy = dy_ref[r, c]
            dx = dx_ref[r, c]
            fy = fy_ref[r, c]
            fx = fx_ref[r, c]
            ty = jnp.clip(r * step + OFF + dy, 0, H - (w + 1)) - by0
            tx = jnp.clip(c * step + OFF + dx, 0, W - (w + 1))
            t8 = pl.multiple_of((ty // 8) * 8, 8)
            s_row = ty - t8
            a = pl.multiple_of(jnp.clip((tx // 128) * 128, 0, Wp - BLK_W), 128)
            s_col = tx - a

            if mode == "storeonly":
                out_ref[0, c] = jnp.full((w, w), fy * fx, jnp.float32)
                return 0

            block = band[slot, pl.ds(t8, BLK_H), pl.ds(a, BLK_W)]
            if mode == "loadonly":
                out_ref[0, c] = block[:w, :w] * fy
                return 0
            if mode in ("full", "norowroll", "rowfirst", "unroll"):
                if mode == "rowfirst":
                    block = pltpu.roll(block, BLK_H - s_row, 0)[: w + 1, :]
                    block = pltpu.roll(block, BLK_W - s_col, 1)[:, : w + 1]
                    tile = block
                else:
                    block = pltpu.roll(block, BLK_W - s_col, 1)[:, : w + 1]
                    if mode != "norowroll":
                        block = pltpu.roll(block, BLK_H - s_row, 0)
                    tile = block[: w + 1, :]
            elif mode == "gather":
                lane = jax.lax.broadcasted_iota(jnp.int32, (BLK_H, w + 1), 1)
                idx = lane + s_col
                tile = jnp.take_along_axis(
                    block, idx, axis=1, mode="clip")
                tile = pltpu.roll(tile, BLK_H - s_row, 0)[: w + 1, :]
            else:
                block = block[:, : w + 1]
                if mode == "nolaneroll":
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
            out_ref[0, c] = jnp.where(integer_cell, f11, blend)
            return 0

        if mode in ("unroll", "unrollstore"):
            for c in range(n_cols):
                if mode == "unrollstore":
                    out_ref[0, c] = jnp.full(
                        (w, w), fy_ref[r, c] * fx_ref[r, c], jnp.float32)
                else:
                    body(c, 0)
        else:
            jax.lax.fori_loop(0, n_cols, body, 0)

    return kern


@functools.partial(jax.jit, static_argnames=("mode",))
def run(frame, vx, vy, mode):
    H0, W0 = FRAME
    w, o = W_, O_
    step = w - o
    n_rows = (H0 - w) // step + 1
    n_cols = (W0 - w) // step + 1
    S = w // 2
    frame = flat_wrap_pad(frame.astype(jnp.float32), S)
    OFF = S
    H, W = H0 + 2 * S, W0 + 2 * S
    BH = -(-(w + 2 * S + 1) // 8) * 8
    Hp = -(-H // 8) * 8
    Wp = -(-max(W, 256) // 128) * 128
    vx = jnp.clip(vx, -S, S).reshape(n_rows, n_cols)
    vy = jnp.clip(vy, -S, S).reshape(n_rows, n_cols)
    dy = jnp.floor(vy)
    dx = jnp.floor(vx)
    fy = vy - dy
    fx = vx - dx
    if (Hp, Wp) != (H, W):
        frame = jnp.pad(frame, ((0, Hp - H), (0, Wp - W)))
    kernel = functools.partial(
        make_kernel(mode), H=H, W=W, Wp=Wp, w=w, step=step, S=S,
        n_cols=n_cols, OFF=OFF)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_rows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, n_cols, w, w), lambda r, *_: (r, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, BH + 8, Wp), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, n_cols, w, w), jnp.float32),
        grid_spec=grid_spec,
    )(dy.astype(jnp.int32), dx.astype(jnp.int32), fy, fx, frame)
    return out


def bench(mode, frame, vx, vy):
    def scan_fn(frame, vx, vy):
        def stepf(carry, i):
            out = run(frame, vx + 1e-3 * i, vy, mode)
            return carry + out[0, 0, 0, 0], None
        c, _ = jax.lax.scan(stepf, 0.0, jnp.arange(REPS, dtype=jnp.float32))
        return c

    fn = jax.jit(scan_fn)
    t0 = time.perf_counter()
    fn(frame, vx, vy).block_until_ready()
    comp = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(frame, vx, vy).block_until_ready()
        times.append((time.perf_counter() - t0) / REPS * 1000)
    print(f"{mode:10s} {np.median(times):7.3f} ms/call (compile {comp:.0f}s)",
          flush=True)


def main():
    modes = sys.argv[1:] or ["full", "norowroll", "nolaneroll", "norolls",
                             "loadonly", "storeonly"]
    print(f"devices: {jax.devices()}", file=sys.stderr)
    fa, _ = particle_pair(FRAME, displacement=(3.3, -2.1), density=0.01, seed=0)
    frame = jnp.asarray(fa, jnp.float32)
    n = ((FRAME[0] - W_) // (W_ - O_) + 1) ** 2
    rng = np.random.default_rng(0)
    vx = jnp.asarray(rng.uniform(-3, 3, n), jnp.float32)
    vy = jnp.asarray(rng.uniform(-3, 3, n), jnp.float32)
    for m in modes:
        bench(m, frame, vx, vy)


if __name__ == "__main__":
    main()
