"""Micro-benchmark of the Pallas shift-kernel variants on the real TPU.

Pass-2 geometry of the headline config: 2048x2048 frame, w=32, o=16
(127x127 windows).  Each variant is timed over a lax.scan of REPS calls
with per-iteration-perturbed shifts (defeats loop-invariant hoisting); the
scan carries a scalar consumer.  Reports ms/call (one call = one frame's
window shift; the engine does 2 per pair per refinement pass).

Usage: python tools/bench_shift.py [variants...]
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

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from torchpiv_tpu.kernels.shift_pallas import shift_windows_pallas  # noqa: E402
from torchpiv_tpu.utils.synthetic import particle_pair  # noqa: E402

FRAME = (2048, 2048)
W, O = 32, 16
REPS = 32


def bench_variant(variant, frame, vx, vy):
    def scan_fn(frame, vx, vy):
        def step(carry, i):
            out = shift_windows_pallas(
                frame, vx + 1e-3 * i, vy,
                frame_shape=FRAME, wind_size=W, overlap=O, variant=variant,
            )
            return carry + out[0, 0, 0], None

        c, _ = jax.lax.scan(step, 0.0, jnp.arange(REPS, dtype=jnp.float32))
        return c

    fn = jax.jit(scan_fn)
    t0 = time.perf_counter()
    fn(frame, vx, vy).block_until_ready()
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(frame, vx, vy).block_until_ready()
        times.append((time.perf_counter() - t0) / REPS * 1000)
    ms = float(np.median(times))
    print(f"{variant:8s} {ms:7.3f} ms/call  (compile {compile_s:.0f} s)",
          flush=True)
    return ms


def main():
    variants = sys.argv[1:] or ["rolls", "mw2", "mw4", "mw8"]
    print(f"devices: {jax.devices()}", file=sys.stderr)
    fa, _ = particle_pair(FRAME, displacement=(3.3, -2.1), density=0.01, seed=0)
    frame = jnp.asarray(fa, jnp.float32)
    n = ((FRAME[0] - W) // (W - O) + 1) ** 2
    rng = np.random.default_rng(0)
    vx = jnp.asarray(rng.uniform(-3, 3, n), jnp.float32)
    vy = jnp.asarray(rng.uniform(-3, 3, n), jnp.float32)

    # correctness cross-check once per variant against the reference variant
    ref = np.asarray(shift_windows_pallas(
        frame, vx, vy, frame_shape=FRAME, wind_size=W, overlap=O,
        variant="rolls"))
    for v in variants:
        if v != "rolls":
            got = np.asarray(shift_windows_pallas(
                frame, vx, vy, frame_shape=FRAME, wind_size=W, overlap=O,
                variant=v))
            ok = np.array_equal(got, ref)
            print(f"{v}: bit-exact vs rolls = {ok}", flush=True)
            if not ok:
                bad = np.abs(got - ref)
                print(f"  max |diff| = {bad.max()}, frac = {(bad > 0).mean()}")
    for v in variants:
        bench_variant(v, frame, vx, vy)


if __name__ == "__main__":
    main()
