"""Op-level device-time attribution of the production dispatch.

Runs the headline configuration (4 MP pair, 2-pass CWS, scan-8 batch) under
``jax.profiler.trace`` with a perfetto trace, then aggregates TPU op events
by kind and prints ms/pair per group — the ground truth for the perf ledger
(docs/ARCHITECTURE.md "Performance ledger").

Usage:  python tools/profile_engine.py [--mode cws|def|dws] [--passes 2]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
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

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from torchpiv_tpu.models import MultipassPIV, PIVConfig  # noqa: E402
from torchpiv_tpu.utils.synthetic import particle_pair  # noqa: E402

FRAME = (2048, 2048)
BATCH = 8


def classify(name: str) -> str:
    n = name.lower()
    if "pallas" in n or "shift" in n:
        return "pallas_shift"
    if n.startswith("copy") or ".copy" in n or "transpose" in n:
        return "layout_copy"
    if "dot" in n or "conv" in n:
        return "matmul"
    if "fft" in n:
        return "fft"
    if "dynamic-update" in n or "dynamic-slice" in n:
        return "dynslice"
    if "reduce" in n or "argmax" in n or "sort" in n:
        return "reduce"
    if "fusion" in n:
        return "fusion"
    if "gather" in n or "scatter" in n:
        return "gather_scatter"
    if "infeed" in n or "outfeed" in n or "send" in n or "recv" in n:
        return "transfer"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="CWS")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3, help="traced dispatches")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg = PIVConfig(frame_shape=FRAME, wind_size=64, overlap=32,
                    multipass=args.passes, multipass_mode=args.mode.upper())
    engine = MultipassPIV(cfg)

    def batched(fa, fb):
        def step(carry, ab):
            u, v, inval = engine(ab[0], ab[1])
            if inval is None:
                inval = jnp.zeros(u.shape, bool)
            return carry, (u, v, inval)
        _, out = jax.lax.scan(step, 0, (fa, fb))
        return out

    fn = jax.jit(batched)
    pairs = [particle_pair(FRAME, displacement=(3.3, -2.1), density=0.01,
                           seed=i) for i in range(4)]
    fa = jnp.asarray(np.stack([pairs[i % 4][0] for i in range(BATCH)]))
    fb = jnp.asarray(np.stack([pairs[i % 4][1] for i in range(BATCH)]))

    t0 = time.perf_counter()
    u, v, iv = fn(fa, fb)
    jax.block_until_ready((u, v, iv))
    print(f"compile+first: {time.perf_counter() - t0:.1f} s", file=sys.stderr)

    # steady state timing (no trace)
    for _ in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(fa, fb))
        dt = time.perf_counter() - t0
        print(f"dispatch: {dt * 1000:.1f} ms = {1000 * dt / BATCH:.2f} ms/pair",
              file=sys.stderr)

    logdir = "/tmp/tpiv_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir, create_perfetto_trace=True):
        for _ in range(args.reps):
            jax.block_until_ready(fn(fa, fb))

    traces = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not traces:
        print("NO perfetto trace found", file=sys.stderr)
        sys.exit(1)
    with gzip.open(sorted(traces)[-1], "rt") as f:
        tr = json.load(f)

    # find TPU device-op track events (exclude host threads)
    events = tr["traceEvents"] if isinstance(tr, dict) else tr
    pid_names = {}
    thread_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        elif e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    # The device track carries BOTH per-op events ("XLA Ops" threads) and
    # enclosing module/step span events ("XLA Modules"/"Steps" threads —
    # e.g. one jit_batched(...) span around every dispatch); counting both
    # double-counts every op.  Aggregate the op threads only.
    op_tids = {k for k, n in thread_names.items()
               if k[0] in dev_pids and "XLA Ops" in n}
    print(f"processes: {pid_names}", file=sys.stderr)

    per_op = collections.Counter()
    per_group = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        if op_tids and (e["pid"], e.get("tid")) not in op_tids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        # skip meta rows (run ids, steps)
        if name.startswith("pid") or "XLA Modules" in str(e.get("args", "")):
            continue
        # The scan's while op is a SPAN around its body: the body ops are
        # traced individually, so counting the span double-counts them.
        if name.split(".")[0] == "while":
            continue
        per_op[name] += dur
        per_group[classify(name)] += dur
        total += dur

    npairs = args.reps * BATCH
    print(f"\n== device op time: {total:.1f} ms over {npairs} pairs "
          f"= {total / npairs:.2f} ms/pair ==")
    print("\n-- by group (ms/pair) --")
    for g, ms in per_group.most_common():
        print(f"{ms / npairs:8.3f}  {g}")
    print(f"\n-- top {args.top} ops (ms/pair) --")
    for name, ms in per_op.most_common(args.top):
        print(f"{ms / npairs:8.3f}  {name}")


if __name__ == "__main__":
    main()
