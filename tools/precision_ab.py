"""dft_precision A/B on the real TPU: throughput AND per-vector accuracy.

One process, back-to-back (the only comparison form that survives the axon
tunnel's run-to-run drift — CLAUDE.md).  For each knob setting at the
headline 4 MP / 64 px / 50% / 2-pass-CWS config:

* throughput of the production scan-batched dispatch (ms/pair), and
* accuracy vs the "highest" (bf16_6x, ~f32-exact) chain on the SAME
  frames: worst single vector, RMS over valid vectors, and
  validation-mask flips, swept over ``AB_SEEDS`` synthetic seeds.

Decides VERDICT r4 item 3: the shipped default must be simultaneously the
benched configuration and the <0.01 px WORST-VECTOR configuration.

Usage: python tools/precision_ab.py        (prints one table; ~minutes)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jaxcache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from torchpiv_tpu.models import MultipassPIV, PIVConfig  # noqa: E402
from torchpiv_tpu.pipeline import build_packed_scan  # noqa: E402
from torchpiv_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402
from torchpiv_tpu.utils.synthetic import particle_pair  # noqa: E402

enable_compile_cache()

FRAME = (2048, 2048)
BATCH = int(os.environ.get("AB_BATCH", 8))
REPS = int(os.environ.get("AB_REPS", 3))
SEEDS = int(os.environ.get("AB_SEEDS", 8))
KNOBS = tuple(os.environ.get(
    "AB_KNOBS", "default,high,highest").split(","))


def engine_for(knob: str) -> MultipassPIV:
    """Knob = dft_precision, optionally ':complex_mm' appended
    (e.g. "high:real") — the reference chain stays plain "highest"."""
    precision, _, cmm = knob.partition(":")
    return MultipassPIV(PIVConfig(
        frame_shape=FRAME, wind_size=64, overlap=32, multipass=2,
        multipass_mode="CWS", dft_precision=precision,
        complex_mm=cmm or "direct"))


def main() -> None:
    print(f"devices: {jax.devices()}", flush=True)
    rng_pairs = [particle_pair(FRAME, displacement=(3.3, -2.1),
                               density=0.01, seed=s) for s in range(SEEDS)]
    # extra seeds with a shear flow exercise non-uniform predictors
    def shear(xx, yy):
        return 2.0 + 2.5 * yy / FRAME[0], -1.0 + 2.0 * xx / FRAME[1]

    rng_pairs += [particle_pair(FRAME, displacement=shear, density=0.01,
                                seed=100 + s) for s in range(SEEDS)]
    print(f"{SEEDS} uniform + {SEEDS} shear seeds", flush=True)

    fns = {}
    for k in KNOBS:
        eng = engine_for(k)
        fns[k] = (eng, jax.jit(lambda a, b, e=eng: e(a, b)))

    # --- accuracy vs "highest" on the same frames --------------------------
    ref_fields = []
    eng_hi, fn_hi = fns["highest"]
    for fa, fb in rng_pairs:
        u, v, iv = fn_hi(jnp.asarray(fa), jnp.asarray(fb))
        ref_fields.append((np.asarray(u, np.float64),
                           np.asarray(v, np.float64),
                           np.asarray(iv)))
    print("reference (highest) fields computed", flush=True)

    acc = {}
    for k in KNOBS:
        if k == "highest":
            continue
        _, fn = fns[k]
        worst = 0.0
        sq = 0.0
        n = 0
        flips = 0
        for (fa, fb), (ur, vr, ivr) in zip(rng_pairs, ref_fields):
            u, v, iv = fn(jnp.asarray(fa), jnp.asarray(fb))
            u = np.asarray(u, np.float64)
            v = np.asarray(v, np.float64)
            iv = np.asarray(iv)
            flips += int((iv != ivr).sum())
            valid = ~(iv | ivr)
            du = np.hypot(u - ur, v - vr)[valid]
            worst = max(worst, float(du.max()))
            sq += float((du ** 2).sum())
            n += int(valid.sum())
        acc[k] = (worst, (sq / max(n, 1)) ** 0.5, flips, n)
        print(f"accuracy {k:8s}: worst {worst:.2e} px, "
              f"rms {acc[k][1]:.2e} px, mask flips {flips} "
              f"over {n} valid vectors", flush=True)

    # --- throughput of the production packed scan --------------------------
    fa = jnp.asarray(np.stack(
        [rng_pairs[i % len(rng_pairs)][0] for i in range(BATCH)]))
    fb = jnp.asarray(np.stack(
        [rng_pairs[i % len(rng_pairs)][1] for i in range(BATCH)]))
    perf = {}
    for k in KNOBS:
        eng, _ = fns[k]
        scan = build_packed_scan(eng)
        r = scan(fa, fb)
        float(jnp.sum(r))  # force the first post-compile call (CLAUDE.md)
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(jnp.sum(scan(fa, fb)))
            best = min(best, (time.perf_counter() - t0) / BATCH * 1000)
        perf[k] = best
        print(f"perf {k:8s}: {best:.2f} ms/pair (best of {REPS}, "
              f"batch {BATCH})", flush=True)

    print("\n| knob | ms/pair | worst px vs highest | rms px | mask flips |")
    print("|---|---|---|---|---|")
    for k in KNOBS:
        if k == "highest":
            print(f"| {k} | {perf[k]:.2f} | (reference) | — | — |")
        else:
            w, r, f, _ = acc[k]
            print(f"| {k} | {perf[k]:.2f} | {w:.2e} | {r:.2e} | {f} |")


if __name__ == "__main__":
    main()
