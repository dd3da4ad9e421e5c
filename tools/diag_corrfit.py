"""Stub attribution of the corrfit kernel at pass-2 geometry (w=32)."""
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

from torchpiv_tpu.experimental.fused_pass import correlate_peakfit_pallas  # noqa: E402
from torchpiv_tpu.kernels.shift_pallas import shift_windows_pallas  # noqa: E402
from torchpiv_tpu.utils.synthetic import particle_pair  # noqa: E402

FRAME = (2048, 2048)
REPS = 16
W = int(os.environ.get("DIAG_W", 32))
O = W // 2


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


def main():
    print(f"devices: {jax.devices()} W={W}", file=sys.stderr, flush=True)
    fa, fb = particle_pair(FRAME, displacement=(3.3, -2.1), density=0.01,
                           seed=0)
    n2 = (FRAME[0] - W) // (W - O) + 1
    n_w2 = n2 * n2
    rng = np.random.default_rng(1)
    vx = jnp.asarray(rng.uniform(-6, 6, n_w2).astype(np.float32))
    vy = jnp.asarray(rng.uniform(-6, 6, n_w2).astype(np.float32))
    kw = dict(frame_shape=FRAME, wind_size=W, overlap=O, packed=True)
    wa = shift_windows_pallas(jnp.asarray(fa).astype(jnp.float32), vx, vy,
                              **kw)
    wb = shift_windows_pallas(jnp.asarray(fb).astype(jnp.float32), -vx, -vy,
                              **kw)

    def run(stub):
        def fn(wa, wb):
            def step(carry, i):
                # perturb one lane-slab only (cheap, defeats hoisting)
                wa_i = wa.at[0, 0, 0].add(i)
                u, v, iv = correlate_peakfit_pallas(
                    wa_i, wb, wind_size=W, n_cols=n2, stub=stub)
                return carry + jnp.sum(u) + jnp.sum(v), None
            c, _ = jax.lax.scan(step, 0.0,
                                jnp.arange(REPS, dtype=jnp.float32))
            return c
        return fn

    for stub in ("store", "corr", "none"):
        timeit(f"corrfit stub={stub}", run(stub), wa, wb)


if __name__ == "__main__":
    main()
