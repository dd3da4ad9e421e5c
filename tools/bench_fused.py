"""Micro-benchmark of the fused whole-pass kernel variants on the real TPU.

Times ``fused_piv_pass`` at the headline pass-2 geometry (2048x2048 frame,
w=32, o=16, 127x127 windows) over a lax.scan with per-iteration-perturbed
shifts (defeats loop-invariant hoisting), carrying a scalar consumer.
Reports ms/pass (one call = one full PIV pass on a frame pair).

Usage: python tools/bench_fused.py [mode[:stub]...]
  mode: rolls | mxu       stub: none | extract | extracta | corr
e.g. python tools/bench_fused.py rolls mxu rolls:extract mxu:extract
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

from torchpiv_tpu.experimental.fused_pass import fused_piv_pass  # noqa: E402
from torchpiv_tpu.utils.synthetic import particle_pair  # noqa: E402

FRAME = (2048, 2048)
W, O = 32, 16
REPS = 16


def _split_pass(fa, fb, vxa, vya, vxb, vyb):
    """Composed pass: packed Pallas shift x2 + fused corrfit kernel."""
    from torchpiv_tpu.experimental.fused_pass import correlate_peakfit_pallas
    from torchpiv_tpu.kernels.shift_pallas import shift_windows_pallas

    n_cols = (FRAME[1] - W) // (W - O) + 1
    kw = dict(frame_shape=FRAME, wind_size=W, overlap=O, packed=True)
    wa = shift_windows_pallas(fa, vxa, vya, **kw)
    wb = shift_windows_pallas(fb, vxb, vyb, **kw)
    return correlate_peakfit_pallas(wa, wb, wind_size=W, n_cols=n_cols)


def _xla_pass(fa, fb, vxa, vya, vxb, vyb):
    """Composed pass: Pallas shift x2 + XLA matmul-DFT chain + peak fit."""
    from torchpiv_tpu.kernels.shift_pallas import shift_windows_pallas
    from torchpiv_tpu.ops.correlate import correlate_matmul
    from torchpiv_tpu.ops.peakfit import correlation_to_displacement

    kw = dict(frame_shape=FRAME, wind_size=W, overlap=O)
    wa = shift_windows_pallas(fa, vxa, vya, **kw)
    wb = shift_windows_pallas(fb, vxb, vyb, **kw)
    corr = correlate_matmul(wa, wb)
    return correlation_to_displacement(corr, True, 1.2, 3, min_subtract=True)


def bench(mode, stub, fa, fb, vx, vy):
    def scan_fn(fa, fb, vx, vy):
        def step(carry, i):
            if mode in ("split", "xlachain"):
                f = _split_pass if mode == "split" else _xla_pass
                u, v, inval = f(
                    fa, fb, -(vx + 1e-3 * i) / 2, -vy / 2,
                    (vx + 1e-3 * i) / 2, vy / 2)
            else:
                u, v, inval = fused_piv_pass(
                    fa, fb, -(vx + 1e-3 * i) / 2, -vy / 2,
                    (vx + 1e-3 * i) / 2, vy / 2,
                    frame_shape=FRAME, wind_size=W, overlap=O,
                    extract_mode=mode, stub=stub,
                )
            return carry + u[0] + v[0], None

        c, _ = jax.lax.scan(step, 0.0, jnp.arange(REPS, dtype=jnp.float32))
        return c

    fn = jax.jit(scan_fn)
    t0 = time.perf_counter()
    fn(fa, fb, vx, vy).block_until_ready()
    compile_s = time.perf_counter() - t0
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        fn(fa, fb, vx, vy).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best * 1e3, compile_s


def main():
    specs = sys.argv[1:] or ["rolls", "mxu"]
    print(f"devices: {jax.devices()}", file=sys.stderr)
    fa, fb = particle_pair(FRAME, displacement=(3.3, -2.1), density=0.01,
                           seed=0)
    n = ((FRAME[0] - W) // (W - O) + 1) ** 2
    rng = np.random.default_rng(1)
    vx = jnp.asarray(rng.uniform(-6, 6, n).astype(np.float32))
    vy = jnp.asarray(rng.uniform(-6, 6, n).astype(np.float32))
    fa = jnp.asarray(fa)
    fb = jnp.asarray(fb)

    # correctness cross-check (full kernel modes only)
    outs = {}
    for spec in specs:
        mode, _, stub = spec.partition(":")
        stub = stub or "none"
        if stub != "none":
            continue
        if mode == "split":
            outs[mode] = jax.jit(_split_pass)(
                fa, fb, -vx / 2, -vy / 2, vx / 2, vy / 2)
        elif mode == "xlachain":
            outs[mode] = jax.jit(_xla_pass)(
                fa, fb, -vx / 2, -vy / 2, vx / 2, vy / 2)
        else:
            outs[mode] = fused_piv_pass(
                fa, fb, -vx / 2, -vy / 2, vx / 2, vy / 2,
                frame_shape=FRAME, wind_size=W, overlap=O,
                extract_mode=mode)
    if len(outs) >= 2:
        names = list(outs)
        (u1, v1, _) = outs[names[0]]
        for nm in names[1:]:
            (u2, v2, _) = outs[nm]
            du = float(jnp.max(jnp.abs(u1 - u2)))
            dv = float(jnp.max(jnp.abs(v1 - v2)))
            print(f"cross-check {names[0]} vs {nm}: "
                  f"max |du|={du:.2e} |dv|={dv:.2e}")

    for spec in specs:
        mode, _, stub = spec.partition(":")
        stub = stub or "none"
        ms, cs = bench(mode, stub, fa, fb, vx, vy)
        print(f"{spec:16s} {ms:7.3f} ms/pass  (compile {cs:.0f} s)")


if __name__ == "__main__":
    main()
