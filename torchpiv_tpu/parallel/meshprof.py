"""Mesh-sharding overhead profile for the window-split axis.

The production sharding (``parallel.sharded.ShardedPIV``) splits the
window-grid rows across a mesh axis; its overheads against a
single-device run are:

* **duplicated tail rows** — clamped contiguous blocks mean the last
  shard recomputes rows already owned by its neighbour whenever the row
  count does not divide the axis size (``_block_layout``);
* **the per-pass all_gather** — the spline predictor upsample needs the
  full coarse field, so each pass gathers tiny ``[R, C]`` f32 fields
  (the ONLY collective in the engine);
* **replicated frame work** — each shard holds the full frame and
  slices its band (cheap: a 4 MP uint8 frame is 4 MB next to the
  sharded window tensors).

:func:`profile` measures 1/2/4/..-way window splits back-to-back in one
process and reports per-split step times plus the analytic overhead
terms.  On a virtual CPU mesh (``xla_force_host_platform_device_count``)
the absolute numbers mean little — all "devices" share the host's cores —
but the RELATIVE cost of the sharded program vs the unsharded one, and
the measured all_gather cost, are the scaling evidence a single-chip
environment permits (SURVEY §2.7; real-ICI numbers need real chips).
"""
from __future__ import annotations

import time
from typing import List, Optional

import numpy as np


def _dup_row_fraction(R: int, nw: int) -> float:
    """Fraction of window rows recomputed by clamped blocks."""
    rloc = min(-(-R // nw), R)
    return (nw * rloc - R) / R


def profile(
    frame_shape=(1024, 1024),
    wind_size: int = 64,
    overlap: int = 32,
    multipass: int = 2,
    splits: Optional[List[int]] = None,
    reps: int = 3,
    log=print,
) -> List[dict]:
    """Window-split overhead table on the current backend's devices.

    Returns one dict per split: ``{nw, ms, vs_1way, dup_rows_pct,
    gather_ms, gather_bytes}``; ``log`` receives aligned table rows.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ..models.multipass import MultipassPIV, PIVConfig
    from ..utils.synthetic import particle_pair
    from .sharded import ShardedPIV
    from . import make_mesh

    devices = jax.devices()
    if splits is None:
        splits = [s for s in (1, 2, 4, 8) if s <= len(devices)]

    cfg = PIVConfig(frame_shape=tuple(frame_shape), wind_size=wind_size,
                    overlap=overlap, multipass=multipass,
                    multipass_mode="CWS")
    engine = MultipassPIV(cfg)
    fa, fb = particle_pair(tuple(frame_shape), displacement=(3.3, -2.1),
                           density=0.008, seed=11)
    fa = jnp.asarray(fa)[None]
    fb = jnp.asarray(fb)[None]

    def timeit(fn, *args):
        out = fn(*args)  # compile + first run
        jax.tree_util.tree_map(
            lambda t: t.block_until_ready() if hasattr(
                t, "block_until_ready") else t, out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.tree_util.tree_map(
                lambda t: t.block_until_ready() if hasattr(
                    t, "block_until_ready") else t, out)
            best = min(best, time.perf_counter() - t0)
        return best * 1000.0

    # per-pass gather payload: u, v, inval as f32 on each pass's grid
    gather_bytes = sum(4 * 3 * r * c for r, c in engine.field_shapes)

    rows = []
    base_ms = None
    log("| windows-split | step ms (best of %d) | vs 1-way | dup rows %% | "
        "all_gather ms | gather bytes/pair |" % reps)
    log("|---|---|---|---|---|---|")
    for nw in splits:
        if nw == 1:
            fn = jax.jit(jax.vmap(engine))
            ms = timeit(fn, fa, fb)
        else:
            mesh = make_mesh({"pairs": 1, "windows": nw}, devices[:nw])
            ms = timeit(ShardedPIV(engine, mesh).jit(), fa, fb)
        if base_ms is None:
            base_ms = ms

        gather_ms = 0.0
        if nw > 1:
            # the collective alone: the engine's exact all_gather pattern
            # (sharded._gather_full — tiled gather of each pass's local
            # [rloc, C] block for u, v and inval) in an otherwise-empty
            # shard_map program
            mesh = make_mesh({"windows": nw}, devices[:nw])
            blocks = []
            for r, c in engine.field_shapes:
                rloc = min(-(-r // nw), r)
                blocks.append(jnp.zeros((3, nw * rloc, c), jnp.float32))

            def gather_all(*fs):
                def local(*fl):
                    return tuple(
                        jax.lax.all_gather(f, "windows", axis=1, tiled=True)
                        for f in fl)

                return jax.shard_map(
                    local, mesh=mesh,
                    in_specs=tuple(P(None, "windows", None) for _ in fs),
                    out_specs=tuple(P() for _ in fs),
                    check_vma=False)(*fs)

            gather_ms = timeit(jax.jit(gather_all), *blocks)

        dup = max((_dup_row_fraction(r, nw)
                   for r, _ in engine.field_shapes)) * 100.0
        rows.append(dict(nw=nw, ms=round(ms, 2),
                         vs_1way=round(ms / base_ms, 3),
                         dup_rows_pct=round(dup, 1),
                         gather_ms=round(gather_ms, 3),
                         gather_bytes=gather_bytes))
        log(f"| {nw} | {ms:.1f} | {ms / base_ms:.2f}x | {dup:.1f} | "
            f"{gather_ms:.2f} | {gather_bytes} |")
    return rows
