"""Per-config engine throughput sweep on the real TPU, one process.

Times the production scan-batched dispatch (as ``OfflinePIV`` runs it)
for a list of analysis configurations back-to-back in ONE process —
the only comparison form that survives the axon tunnel's run-to-run
drift (see CLAUDE.md).  Prints one aligned row per config plus a
markdown table block for docs/ROADMAP.md.

Usage:
  python tools/bench_sweep.py                 # default config set
  BENCH_SWEEP_REPS=5 python tools/bench_sweep.py
"""
from __future__ import annotations

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

from torchpiv_tpu.models import MultipassPIV, PIVConfig  # noqa: E402
from torchpiv_tpu.pipeline import build_packed_scan  # noqa: E402
from torchpiv_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402
from torchpiv_tpu.utils.synthetic import particle_pair  # noqa: E402

enable_compile_cache()

FRAME = (2048, 2048)
BATCH = int(os.environ.get("BENCH_SWEEP_BATCH", 8))
REPS = int(os.environ.get("BENCH_SWEEP_REPS", 3))

# (label, config overrides) — the reference's published config is
# w=64/50%/2-pass CWS (TorchPIV README); w=32 is the high-density final
# grid its README quotes the <10 min figure for after regridding; DEF is
# the deforming-window mode the reference lacks.
CONFIGS = [
    ("w32 o16 2xCWS", dict(wind_size=32, overlap=16, multipass=2,
                           multipass_mode="CWS")),
    ("w64 o32 2xCWS", dict(wind_size=64, overlap=32, multipass=2,
                           multipass_mode="CWS")),
    ("w64 o32 2xDWS", dict(wind_size=64, overlap=32, multipass=2,
                           multipass_mode="DWS")),
    ("w64 o32 2xDEF", dict(wind_size=64, overlap=32, multipass=2,
                           multipass_mode="DEF")),
    ("w128 o64 2xCWS", dict(wind_size=128, overlap=64, multipass=2,
                            multipass_mode="CWS")),
    ("w64 o32 3xCWS", dict(wind_size=64, overlap=32, multipass=3,
                           multipass_mode="CWS")),
]


def build(overrides: dict):
    # THE production executable (shared builder -> same trace -> same
    # persistent-cache entry as OfflinePIV/warmup/bench.py; a tuple-output
    # scan would time a slower non-production graph, see build_packed_scan)
    cfg = PIVConfig(frame_shape=FRAME, **overrides)
    return build_packed_scan(MultipassPIV(cfg))


def main():
    print(f"devices: {jax.devices()}  frame={FRAME} batch={BATCH} "
          f"reps={REPS}", file=sys.stderr, flush=True)
    pairs = [particle_pair(FRAME, displacement=(3.3, -2.1), density=0.01,
                           seed=i) for i in range(4)]
    fa = jnp.asarray(np.stack([pairs[i % 4][0] for i in range(BATCH)]))
    fb = jnp.asarray(np.stack([pairs[i % 4][1] for i in range(BATCH)]))

    rows = []
    for label, overrides in CONFIGS:
        try:
            fn = build(overrides)
            t0 = time.perf_counter()
            out = fn(fa, fb)  # packed [B, 3, R, C]
            jax.block_until_ready(out)
            t_compile = time.perf_counter() - t0
            # force the first result before timing (see CLAUDE.md: the
            # first post-compile call must be materialised or repeated
            # identical dispatches can read falsely as ~0 ms)
            float(np.asarray(out).ravel()[0])
            times = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(fa, fb))
                times.append(time.perf_counter() - t0)
            med = sorted(times)[len(times) // 2]
            grid = out.shape[-2:]
            rows.append((label, 1000 * med / BATCH, BATCH / med,
                         f"{grid[0]}x{grid[1]}", t_compile))
            print(f"{label:16s} {1000 * med / BATCH:7.2f} ms/pair "
                  f"{BATCH / med:7.1f} pairs/s  grid {grid[0]}x{grid[1]} "
                  f"(compile+first {t_compile:.1f}s)", flush=True)
        except Exception as e:  # keep sweeping on a single-config failure
            print(f"{label:16s} FAILED: {e!r}", flush=True)

    print("\n| config | ms/pair | pairs/s | vector grid |")
    print("|---|---|---|---|")
    for label, ms, pps, grid, _ in rows:
        print(f"| {label} | {ms:.2f} | {pps:.1f} | {grid} |")

    # batch sweep on the headline config: how much per-dispatch overhead
    # remains at each scan batch (same engine, same process)
    if os.environ.get("BENCH_SWEEP_BATCHES", "1") != "0":
        fn = build(dict(wind_size=64, overlap=32, multipass=2,
                        multipass_mode="CWS"))
        print("\n| scan batch | ms/pair | pairs/s |")
        print("|---|---|---|")
        for b in (4, 8, 16, 32):
            ba = jnp.asarray(np.stack(
                [pairs[i % 4][0] for i in range(b)]))
            bb = jnp.asarray(np.stack(
                [pairs[i % 4][1] for i in range(b)]))
            out = fn(ba, bb)
            jax.block_until_ready(out)
            float(np.asarray(out).ravel()[0])  # force first result
            times = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(ba, bb))
                times.append(time.perf_counter() - t0)
            med = sorted(times)[len(times) // 2]
            print(f"| {b} | {1000 * med / b:.2f} | {b / med:.1f} |",
                  flush=True)


if __name__ == "__main__":
    main()
