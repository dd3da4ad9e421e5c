"""Diagnose persistent-compile-cache key instability on the axon TPU.

Round-4 finding: every process that compiles THE SAME production packed
scan writes a NEW ``jit_batched-*`` cache entry (5 distinct keys for 2
logical graphs across bench.py / OfflinePIV / coldstart in one morning),
so a fresh ``tpiv run`` never deserializes — it pays the full remote
compile (~60-580 s over the tunnel, dominated by per-process compile-
service setup).  CPU lowering is cross-process deterministic (verified:
identical sha256 of ``lower().as_text()`` in concurrent fresh
processes), so the variance is TPU-path-specific — one of the other
cache-key components (jax._src.cache_key.get):

  computation IR | jaxlib version | backend platform_version |
  XLA flags (env + argv) | serialized CompileOptions | accelerator
  topology | compression | custom_hook

This probe compiles a SMALL production graph (256x256 frame — seconds,
not minutes) while logging each component's digest, in four styles:

  A. plain dispatch (bench.py headline style: uncommitted device args)
  B. feeder style (pre-fix OfflinePIV: inside ``jax.default_device``
     with ``device_put``-committed args)
  C. plain again, fresh jit object (in-process key stability)
  D. AOT: ``.lower(ShapeDtypeStruct).compile()`` (post-fix OfflinePIV)
     + a dispatch of committed arrays through the compiled object

Run it twice in fresh processes and diff the outputs: a component whose
digest changes across runs (or between styles) is a culprit.

FINDINGS (Aug 19): (1) committed args annotate the module with
``sdy.sharding``/``sdy.mesh`` attrs -> B's computation AND
compile_options digests differ from A's, so warmup (plain) never warmed
production (feeder).  (2) the Mosaic custom-call payload embeds source
FILE PATHS, so the same kernel imported via a different sys.path string
(e.g. an unnormalized ``tools/..``) serializes differently -> fresh
processes missed each other's entries.  Fixes: AOT style D in
``OfflinePIV._build_engine`` (same key as A/warmup/bench), and
abspath-normalized tool bootstraps.

Output: one JSON line with the component digests per compile + the
platform_version string; human detail on stderr.
"""
from __future__ import annotations

import hashlib
import json
import logging
import os
import re
import sys

# Run fine from a fresh checkout with no editable install.
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/torchpiv_jaxcache")

FRAME = (256, 256)
BATCH = 2


class _Capture(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.lines: list[str] = []

    def emit(self, record):
        self.lines.append(record.getMessage())


def main() -> None:
    cap = _Capture()
    for name in ("jax._src.cache_key", "jax._src.compilation_cache"):
        lg = logging.getLogger(name)
        lg.setLevel(logging.DEBUG)
        lg.addHandler(cap)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from torchpiv_tpu.models import MultipassPIV, PIVConfig
    from torchpiv_tpu.pipeline import build_packed_scan
    from torchpiv_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    dev = jax.devices()[0]
    pv = getattr(dev.client, "platform_version", "?")
    print(f"device: {dev}  platform_version: {pv!r}", file=sys.stderr)
    print(f"XLA_FLAGS={os.environ.get('XLA_FLAGS')!r} "
          f"LIBTPU_INIT_ARGS={os.environ.get('LIBTPU_INIT_ARGS')!r} "
          f"argv={sys.argv}", file=sys.stderr)

    cfg = PIVConfig(frame_shape=FRAME, wind_size=64, overlap=32,
                    multipass=2, multipass_mode="CWS")
    engine = MultipassPIV(cfg)

    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (BATCH, *FRAME)).astype(np.uint8)

    def lowered_hash(fn, fa, fb):
        return hashlib.sha256(
            fn.lower(fa, fb).as_text().encode()).hexdigest()

    compiles = {}

    def record(tag):
        """Attribute captured component-digest lines to this compile."""
        comp = {}
        for ln in cap.lines:
            m = re.match(r"get_cache_key hash of serialized (.+): (\w+)", ln)
            if m:
                comp[m.group(1)] = m.group(2)[:16]
        comp["cache_events"] = [
            ln[:120] for ln in cap.lines
            if "hit" in ln.lower() or "miss" in ln.lower()
            or "persistent" in ln.lower()]
        compiles[tag] = comp
        cap.lines.clear()

    # A: bench.py headline style
    fn_a = build_packed_scan(engine)
    fa = jnp.asarray(a)
    print(f"lowered(as_text) sha256 A: {lowered_hash(fn_a, fa, fa)[:16]}",
          file=sys.stderr)
    cap.lines.clear()
    np.asarray(fn_a(fa, fa))
    record("A_plain")

    # B: OfflinePIV feeder style (fresh jit object, committed args,
    # default_device context)
    fn_b = build_packed_scan(engine)
    with jax.default_device(dev):
        fb = jax.device_put(a, dev)
        np.asarray(fn_b(fb, fb))
    record("B_feeder")

    # C: plain again with a fresh jit object — in-process key stability
    fn_c = build_packed_scan(engine)
    np.asarray(fn_c(fa, fa))
    record("C_plain_again")

    # D: AOT style (what OfflinePIV._build_engine does since the fix):
    # lower from abstract shapes — no committed args, so no sdy.sharding
    # annotations — and compile explicitly.  Expected: same key as A.
    fn_d = build_packed_scan(engine)
    sds = jax.ShapeDtypeStruct((BATCH, *FRAME), jnp.uint8)
    compiled = fn_d.lower(sds, sds).compile()
    record("D_aot")
    # the compiled object must accept feeder-style committed arrays
    with jax.default_device(dev):
        fb2 = jax.device_put(a, dev)
        np.asarray(compiled(fb2, fb2))
    record("D_aot_dispatch_committed")

    # E: AOT inside a default_device context naming the SAME device —
    # does the context alone change the key?  (OfflinePIV must honor a
    # non-default target device; if E's key == D's we can wrap
    # unconditionally.)
    fn_e = build_packed_scan(engine)
    with jax.default_device(dev):
        fn_e.lower(sds, sds).compile()
    record("E_aot_in_device_ctx")

    # F1: AOT from a bare WORKER THREAD (no ambient config context),
    # same batch as D — the OfflinePIV prewarm arrangement.  D already
    # wrote this key's entry, so a PERSISTENT-CACHE HIT in the events
    # proves thread identity does not leak into the key; a miss (a new
    # entry written) is the bug.
    import threading

    def aot_worker(fn, b):
        s = jax.ShapeDtypeStruct((b, *FRAME), jnp.uint8)
        with jax.default_device(None):
            fn.lower(s, s).compile()

    fn_f1 = build_packed_scan(engine)
    t = threading.Thread(target=aot_worker, args=(fn_f1, BATCH))
    t.start()
    t.join()
    record("F1_aot_bare_thread")

    # F2: two batch sizes CONCURRENTLY on one fresh jit object (what the
    # prewarm does for ramp + full batch).  The BATCH compile must again
    # HIT; a miss means concurrent tracing perturbs the lowered module.
    fn_f2 = build_packed_scan(engine)
    ts = [threading.Thread(target=aot_worker, args=(fn_f2, b))
          for b in (BATCH, 2 * BATCH)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    record("F2_aot_threads_concurrent")

    print(json.dumps({
        "metric": "cachekey_probe",
        "platform_version": pv,
        "jaxlib": jax.__version__,
        "compiles": compiles,
    }))


if __name__ == "__main__":
    main()
