"""Diagnose the split-mode slowdown: which stage costs what.

Times: engine off | split(full) | split(refine-only) | pack_windows alone
| packed shift alone | corrfit alone, at the headline geometry.
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

from torchpiv_tpu.models import MultipassPIV, PIVConfig  # noqa: E402
from torchpiv_tpu.utils.synthetic import particle_pair  # noqa: E402

FRAME = (2048, 2048)
REPS = 16


def timeit(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    jax.block_until_ready(f(*args))
    c = time.perf_counter() - t0
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:24s} {best * 1e3 / REPS:7.2f} ms/iter (compile {c:.0f}s)",
          flush=True)


def scan_engine(engine):
    def fn(fa, fb, seed):
        def step(carry, i):
            u, v, inval = engine(fa + i.astype(jnp.uint8), fb)
            if inval is None:
                inval = jnp.zeros(u.shape, bool)
            return carry + u[0, 0], None
        c, _ = jax.lax.scan(step, 0.0, jnp.arange(REPS, dtype=jnp.int32))
        return c
    return fn


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    fa, fb = particle_pair(FRAME, displacement=(3.3, -2.1), density=0.01,
                           seed=0)
    fa = jnp.asarray(fa)
    fb = jnp.asarray(fb)

    base = dict(frame_shape=FRAME, wind_size=64, overlap=32, multipass=2)

    eng_off = MultipassPIV(PIVConfig(**base, fused="off"))
    timeit("engine off", scan_engine(eng_off), fa, fb, 0)

    eng_split = MultipassPIV(PIVConfig(**base, fused="split"))
    timeit("engine split", scan_engine(eng_split), fa, fb, 0)

    eng_s2 = MultipassPIV(PIVConfig(**base, fused="split"))
    orig = eng_s2._use_split
    calls = {"n": 0}

    # refine-only: first_pass sees False once (it queries before refine)
    def gated():
        calls["n"] += 1
        return calls["n"] > 1 and orig()

    eng_s2._use_split = gated
    timeit("engine split-refine-only", scan_engine(eng_s2), fa, fb, 0)

    # pieces at pass-1 geometry (w=64)
    from torchpiv_tpu.experimental.fused_pass import (correlate_peakfit_pallas,
                                                 pack_windows)
    from torchpiv_tpu.ops.windows import extract_windows

    n_rows = n_cols = (FRAME[0] - 64) // 32 + 1

    def pack_only(fa):
        def step(carry, i):
            aa = extract_windows(fa + i.astype(jnp.uint8), 64, 32)
            pk = pack_windows(aa.astype(jnp.float32), n_rows, n_cols, 64)
            return carry + pk[0, 0, 0], None
        c, _ = jax.lax.scan(step, 0.0, jnp.arange(REPS, dtype=jnp.int32))
        return c

    timeit("extract+pack w=64", pack_only, fa)

    wa = pack_windows(extract_windows(fa, 64, 32).astype(jnp.float32),
                      n_rows, n_cols, 64)
    wb = pack_windows(extract_windows(fb, 64, 32).astype(jnp.float32),
                      n_rows, n_cols, 64)

    def corrfit_only(wa, wb):
        def step(carry, i):
            u, v, iv = correlate_peakfit_pallas(
                wa + i, wb, wind_size=64, n_cols=n_cols, dc_normalize=True)
            return carry + u[0], None
        c, _ = jax.lax.scan(step, 0.0, jnp.arange(REPS, dtype=jnp.float32))
        return c

    timeit("corrfit w=64", corrfit_only, wa, wb)

    # pieces at pass-2 geometry (w=32)
    from torchpiv_tpu.kernels.shift_pallas import shift_windows_pallas

    n2 = ((FRAME[0] - 32) // 16 + 1)
    n_w2 = n2 * n2
    rng = np.random.default_rng(1)
    vx = jnp.asarray(rng.uniform(-6, 6, n_w2).astype(np.float32))
    vy = jnp.asarray(rng.uniform(-6, 6, n_w2).astype(np.float32))

    def shift_packed_only(fa, vx, vy):
        def step(carry, i):
            wk = shift_windows_pallas(
                fa, vx + 1e-3 * i, vy, frame_shape=FRAME, wind_size=32,
                overlap=16, packed=True)
            return carry + wk[0, 0, 0], None
        c, _ = jax.lax.scan(step, 0.0, jnp.arange(REPS, dtype=jnp.float32))
        return c

    timeit("shift packed w=32", shift_packed_only,
           fa.astype(jnp.float32), vx, vy)

    wa2 = shift_windows_pallas(fa.astype(jnp.float32), vx, vy,
                               frame_shape=FRAME, wind_size=32, overlap=16,
                               packed=True)
    wb2 = shift_windows_pallas(fb.astype(jnp.float32), -vx, -vy,
                               frame_shape=FRAME, wind_size=32, overlap=16,
                               packed=True)

    def corrfit2_only(wa, wb):
        def step(carry, i):
            u, v, iv = correlate_peakfit_pallas(
                wa + i, wb, wind_size=32, n_cols=n2)
            return carry + u[0], None
        c, _ = jax.lax.scan(step, 0.0, jnp.arange(REPS, dtype=jnp.float32))
        return c

    timeit("corrfit w=32", corrfit2_only, wa2, wb2)


if __name__ == "__main__":
    main()
