"""One sustained 4,000-pair run at the headline config — the reference's
published workload (TorchPIV README: 4,000 x 4 MP pairs, 64 px windows,
50% overlap, 2 iterations, <10 min on a GTX 1660 Ti) in a single
uninterrupted wall-clock measurement on one TPU chip.

Unlike ``bench.py`` (median of short reps), this cycles a small set of
device-resident input batches through the production packed scan until
4,000 pairs have completed INCLUDING the per-pair host tail
(validation/infill/unit conversion), and reports the single total.
Ingest is excluded for the same reason bench.py pre-stages: this dev
environment reaches the chip over the axon tunnel (~30 MB/s..1.5 GB/s,
shared); bench.py's bound table covers the ingest story.

Prints one JSON line:
  {"metric": "sustained_4000_pairs_s", "value": total_s, "unit": "s",
   "pairs_per_sec": N, "n_pairs": 4000}
"""
from __future__ import annotations

import json
import os
import sys

# Run fine from a fresh checkout with no editable install (tools/ is not
# on sys.path when invoked as `python tools/<name>.py`).
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jaxcache"))

import numpy as np  # noqa: E402

FRAME = (2048, 2048)
# 64 matches bench.py's production scan batch (Aug 19 sweep: 9.89 vs
# 10.33 ms/pair at 32) so the run reuses the repo cache's live executable.
BATCH = int(os.environ.get("SUSTAINED_BATCH", 64))
N_PAIRS = int(os.environ.get("SUSTAINED_PAIRS", 4000))
STAGED_BATCHES = int(os.environ.get("SUSTAINED_STAGED", 6))
# bound the device-side execution queue: dispatching thousands of async
# calls ahead of the drain would buffer thousands of output blocks in HBM
INFLIGHT = int(os.environ.get("SUSTAINED_INFLIGHT", 8))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from torchpiv_tpu.models import MultipassPIV, PIVConfig
    from torchpiv_tpu.pipeline import build_packed_scan, finalize_fields
    from torchpiv_tpu.utils.compile_cache import enable_compile_cache
    from torchpiv_tpu.utils.synthetic import particle_pair

    enable_compile_cache()
    log(f"devices: {jax.devices()}")

    cfg = PIVConfig(frame_shape=FRAME, wind_size=64, overlap=32,
                    multipass=2, multipass_mode="CWS")
    engine = MultipassPIV(cfg)
    fn = build_packed_scan(engine)
    x, y = engine.final_coordinates

    # A small unique set tiled with a per-batch rotation (as bench.py
    # does): the device sees distinct inputs batch to batch (no
    # loop-invariant hoisting) without this 1-core host spending an hour
    # synthesising STAGED_BATCHES*BATCH unique 4 MP pairs.
    n_unique = int(os.environ.get("SUSTAINED_UNIQUE", 8))
    log(f"generating {n_unique} unique pairs, staging "
        f"{STAGED_BATCHES} batches of {BATCH}...")
    t0 = time.perf_counter()
    pairs = [particle_pair(FRAME, displacement=(3.3, -2.1), density=0.01,
                           seed=i) for i in range(n_unique)]
    log(f"generated in {time.perf_counter() - t0:.1f} s")
    t0 = time.perf_counter()
    dev_batches = []
    for b in range(STAGED_BATCHES):
        idx = [(b + i) % n_unique for i in range(BATCH)]
        fa = np.stack([pairs[i][0] for i in idx])
        fb = np.stack([pairs[i][1] for i in idx])
        d = jax.device_put((fa, fb))
        d[0].block_until_ready()
        dev_batches.append(d)
    log(f"staged in {time.perf_counter() - t0:.1f} s")

    # compile + warm (excluded, reported)
    t0 = time.perf_counter()
    arr = np.asarray(fn(jnp.asarray(dev_batches[0][0]),
                        jnp.asarray(dev_batches[0][1])))
    finalize_fields(arr[0, 0], arr[0, 1], arr[0, 2] > 0.5, x, y, 1.0, 1.0)
    log(f"compile+first batch: {time.perf_counter() - t0:.1f} s")

    n_dispatches = -(-N_PAIRS // BATCH)
    log(f"sustained run: {n_dispatches} dispatches x {BATCH} pairs...")
    t0 = time.perf_counter()
    done = 0
    pending = []
    checkpoints = {}
    for i in range(n_dispatches):
        a, b_ = dev_batches[i % STAGED_BATCHES]
        pending.append(fn(a, b_))
        if len(pending) >= INFLIGHT:
            arr = np.asarray(pending.pop(0))
            for j in range(arr.shape[0]):
                finalize_fields(arr[j, 0], arr[j, 1], arr[j, 2] > 0.5,
                                x, y, 1.0, 1.0)
                done += 1
        if done and done % 800 < BATCH:
            el = time.perf_counter() - t0
            if done not in checkpoints:
                checkpoints[done] = el
                log(f"  {done} pairs at {el:.1f} s "
                    f"({done / el:.1f} pairs/s)")
    for out in pending:
        arr = np.asarray(out)
        for j in range(arr.shape[0]):
            finalize_fields(arr[j, 0], arr[j, 1], arr[j, 2] > 0.5,
                            x, y, 1.0, 1.0)
            done += 1
    total = time.perf_counter() - t0
    log(f"TOTAL: {done} pairs in {total:.1f} s = {done / total:.1f} pairs/s "
        f"({1000 * total / done:.2f} ms/pair)")
    print(json.dumps({
        "metric": "sustained_4000_pairs_s",
        "value": round(total, 1),
        "unit": "s",
        "pairs_per_sec": round(done / total, 1),
        "n_pairs": done,
    }))


if __name__ == "__main__":
    main()
