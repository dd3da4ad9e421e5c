"""Dump the optimized HLO of the production dispatch for op attribution.

Writes /tmp/tpiv_hlo.txt; grep instruction names from the profiler trace
(fusion.NNN, copy.NNN) to see what they compute.
"""
from __future__ import annotations

import os
import sys

# Run fine from a fresh checkout with no editable install (tools/ is not
# on sys.path when invoked as `python tools/<name>.py`).
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/torchpiv_jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from torchpiv_tpu.models import MultipassPIV, PIVConfig  # noqa: E402

FRAME = (2048, 2048)
BATCH = 8


def main():
    cfg = PIVConfig(frame_shape=FRAME, wind_size=64, overlap=32,
                    multipass=2, multipass_mode="CWS")
    engine = MultipassPIV(cfg)

    def batched(fa, fb):
        def step(carry, ab):
            u, v, inval = engine(ab[0], ab[1])
            if inval is None:
                inval = jnp.zeros(u.shape, bool)
            return carry, (u, v, inval)
        _, out = jax.lax.scan(step, 0, (fa, fb))
        return out

    fa = jax.ShapeDtypeStruct((BATCH,) + FRAME, jnp.uint8)
    lowered = jax.jit(batched).lower(fa, fa)
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpiv_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {out}: {len(txt)} chars")


if __name__ == "__main__":
    main()
