"""A/B the production engine between PIVConfig settings on the TPU.

Times the headline config (4 MP pair, 2-pass CWS, scan batch 8) for each
setting given on the command line, and reports the on-TPU field agreement
between the first two settings.  Each argument is either a bare ``fused``
value (off / split / on — historic usage) or comma-separated
``key=value`` PIVConfig overrides.

Usage:
  python tools/bench_engine_ab.py off split
  python tools/bench_engine_ab.py extract_variant=stack extract_variant=tilemajor
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
BATCH = int(os.environ.get("AB_BATCH", 8))
MODE = os.environ.get("AB_MODE", "CWS")


def parse_setting(s: str) -> dict:
    """Bare word -> {"fused": word}; "k=v,k2=v2" -> override dict."""
    if "=" not in s:
        return {"fused": s}
    out = {}
    for kv in s.split(","):
        k, v = kv.split("=", 1)
        out[k.strip()] = v.strip()
    return out


def build(setting: str):
    cfg = PIVConfig(frame_shape=FRAME, wind_size=64, overlap=32,
                    multipass=2, multipass_mode=MODE,
                    **parse_setting(setting))
    engine = MultipassPIV(cfg)

    def batched(fa, fb):
        def step(carry, ab):
            u, v, inval = engine(ab[0], ab[1])
            if inval is None:
                inval = jnp.zeros(u.shape, bool)
            return carry, (u, v, inval)
        _, out = jax.lax.scan(step, 0, (fa, fb))
        return out

    return jax.jit(batched)


def main():
    settings = sys.argv[1:] or ["off", "split"]
    print(f"devices: {jax.devices()}  mode={MODE}", file=sys.stderr)
    pairs = [particle_pair(FRAME, displacement=(3.3, -2.1), density=0.01,
                           seed=i) for i in range(4)]
    fa = jnp.asarray(np.stack([pairs[i % 4][0] for i in range(BATCH)]))
    fb = jnp.asarray(np.stack([pairs[i % 4][1] for i in range(BATCH)]))

    outs = {}
    for s in settings:
        fn = build(s)
        t0 = time.perf_counter()
        out = fn(fa, fb)
        jax.block_until_ready(out)
        print(f"{s}: compile+first {time.perf_counter() - t0:.1f} s",
              file=sys.stderr)
        outs[s] = [np.asarray(o) for o in out]
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(fa, fb))
            best = min(best, time.perf_counter() - t0)
        print(f"{s:6s} {1000 * best / BATCH:6.2f} ms/pair "
              f"({BATCH / best:.1f} pairs/s at batch {BATCH})")

    if len(outs) >= 2:
        a, b = (outs[s] for s in settings[:2])
        agree = a[2] == b[2]
        both = ~(a[2] | b[2]) & agree
        du = np.abs(a[0] - b[0])[both]
        dv = np.abs(a[1] - b[1])[both]
        print(f"fields {settings[0]} vs {settings[1]}: mask agree "
              f"{agree.mean():.4f}, |du| max {du.max():.2e} "
              f"rms {np.sqrt((du ** 2).mean()):.2e}, "
              f"|dv| max {dv.max():.2e}")


if __name__ == "__main__":
    main()
