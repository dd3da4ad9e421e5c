"""Fresh-process time-to-first-field on the real TPU.

Measures what a user sees between launching ``tpiv run`` and the first
velocity field landing: process start -> imports -> backend init ->
engine build (persistent-compile-cache deserialization when warm) ->
first batch through the production packed scan -> first host-tail
finalize.  Run once after ``bench.py`` (or ``tpiv warmup``) has
populated ``JAX_COMPILATION_CACHE_DIR`` to get the WARM number; wipe the
cache dir for the cold number (round 2 measured 129.6 s cold over the
tunnel).

Prints one JSON line:
  {"metric": "time_to_first_field_s", "value": N, "unit": "s",
   "first_batch_s": N, "engine_build_s": N, "n_pairs": N, "total_s": N}

The input folder is the same 48-pair 4 MP BMP set ``bench.py``'s
pipeline leg uses (created here if missing; creation time excluded).
"""
from __future__ import annotations

import glob
import json
import os
import sys

# Run fine from a fresh checkout with no editable install (tools/ is not
# on sys.path when invoked as `python tools/<name>.py`).
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))
import time

T_PROC = time.perf_counter()  # before the heavy imports

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/torchpiv_jaxcache")

FRAME = (2048, 2048)
N_PAIRS = int(os.environ.get("COLDSTART_PAIRS", 48))
FOLDER = os.path.join(
    os.environ.get("TMPDIR", "/tmp"), "tpiv_bench_pairs")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def ensure_dataset() -> float:
    """Create the bench BMP folder if missing; returns seconds spent."""
    if len(glob.glob(os.path.join(FOLDER, "*_a.bmp"))) == N_PAIRS:
        return 0.0
    t0 = time.perf_counter()
    import shutil

    import numpy as np  # noqa: F401  (synthetic pulls it anyway)

    from torchpiv_tpu.io.decode import imwrite_gray
    from torchpiv_tpu.utils.synthetic import particle_pair

    shutil.rmtree(FOLDER, ignore_errors=True)
    os.makedirs(FOLDER)
    for i in range(N_PAIRS):
        fa, fb = particle_pair(FRAME, displacement=(3.3, -2.1),
                               density=0.01, seed=i % 4)
        imwrite_gray(os.path.join(FOLDER, f"p{i:04d}_a.bmp"), fa)
        imwrite_gray(os.path.join(FOLDER, f"p{i:04d}_b.bmp"), fb)
    return time.perf_counter() - t0


def main():
    import logging

    # Surface the pipeline's INFO lines (AOT executable readiness etc.) so
    # the first-batch time decomposes into deserialize vs compile vs H2D.
    logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                        format="%(asctime)s %(name)s: %(message)s")
    dt_ds = ensure_dataset()
    if dt_ds:
        log(f"dataset created in {dt_ds:.1f} s (excluded from timing)")
    t_start = T_PROC + dt_ds  # charge everything except dataset creation

    from torchpiv_tpu.pipeline import OfflinePIV

    t0 = time.perf_counter()
    piv = OfflinePIV(FOLDER, file_fmt=".bmp", wind_size=64, overlap=32,
                     multipass=2, multipass_mode="CWS",
                     batch_size=int(os.environ.get("COLDSTART_BATCH", 16)))
    engine_build_s = time.perf_counter() - t0
    log(f"imports+backend+engine build: "
        f"{time.perf_counter() - t_start:.1f} s "
        f"(engine build alone {engine_build_s:.1f} s)")

    gen = piv()
    t0 = time.perf_counter()
    first = next(gen)
    t_first = time.perf_counter()
    assert first is not None
    n = 1 + sum(1 for _ in gen)
    t_all = time.perf_counter()

    ttff = t_first - t_start
    log(f"time-to-first-field {ttff:.1f} s; all {n} pairs "
        f"{t_all - t_start:.1f} s")
    print(json.dumps({
        "metric": "time_to_first_field_s",
        "value": round(ttff, 1),
        "unit": "s",
        "first_batch_s": round(t_first - t0, 1),
        "engine_build_s": round(engine_build_s, 1),
        "n_pairs": n,
        "total_s": round(t_all - t_start, 1),
    }))


if __name__ == "__main__":
    main()
