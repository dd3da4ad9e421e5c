"""Environment self-check (``tpiv doctor``): verify a production host is
ready before a long acquisition run — device visibility, persistent
compile cache, native decoder, host->device bandwidth, and an engine
smoke test with known synthetic flow.

The reference has no counterpart (its closest analog is crashing at
import when CUDA enumeration fails, PIVbackend.py:13-18); on a
network-attached dev TPU this check also surfaces tunnel degradation
before it corrupts a benchmark (the link drifts 4 MB/s..1.2 GB/s —
see docs/ROADMAP.md).
"""
from __future__ import annotations

import os
import tempfile
import time
from typing import Callable, Dict, List, Optional


def _check(results: List[dict], name: str, fn: Callable[[], str]):
    """Run one named check, capturing ok/detail/exception."""
    t0 = time.perf_counter()
    try:
        detail = fn()
        results.append(dict(name=name, ok=True, detail=detail,
                            seconds=round(time.perf_counter() - t0, 2)))
    except Exception as e:  # noqa: BLE001 - each check reports, not raises
        results.append(dict(name=name, ok=False, detail=f"{e!r}",
                            seconds=round(time.perf_counter() - t0, 2)))


def run_doctor(device: str = "auto", engine_check: bool = True,
               bandwidth_mb: int = 64,
               cache_roundtrip: bool = False) -> List[dict]:
    """Run all checks; returns a list of
    ``{name, ok, detail, seconds}`` dicts (order = execution order).

    The first device contact is time-bounded (``TPIV_DOCTOR_TIMEOUT``
    seconds, default 120): on a network-attached device whose relay is
    down, backend init blocks ~25 minutes before raising — a diagnostic
    tool must report the outage in bounded time instead.  On timeout the
    device-touching checks are marked failed/skipped; host-side checks
    (cache, native decoder) still run.  The probing thread is left to
    finish naturally (interrupting a mid-setup device connection can
    wedge the remote compile service)."""
    import subprocess
    import sys
    import threading

    results: List[dict] = []
    backend_ok = True

    def jax_devices():
        nonlocal backend_ok
        import jax

        timeout = float(os.environ.get("TPIV_DOCTOR_TIMEOUT", 120))
        box: Dict[str, object] = {}

        def dial():
            try:
                box["devs"] = jax.devices()
            except Exception as e:  # noqa: BLE001 - reported below
                box["err"] = e

        t = threading.Thread(target=dial, name="doctor-backend-dial",
                             daemon=True)
        t.start()
        t.join(timeout)
        if t.is_alive():
            backend_ok = False
            raise RuntimeError(
                f"backend not responding after {timeout:.0f}s — likely a "
                "device-relay outage (init keeps blocking in the "
                "background; a hard-down tunnel raises after ~25 min)")
        if "err" in box:
            backend_ok = False
            raise box["err"]  # type: ignore[misc]
        devs = box["devs"]
        plats = sorted({d.platform for d in devs})  # type: ignore[union-attr]
        return f"{len(devs)} device(s), platform(s) {plats}: {devs[:4]}"  # type: ignore[arg-type]

    _check(results, "jax devices", jax_devices)

    def versions():
        import jax
        import jaxlib
        import numpy

        return (f"jax {jax.__version__}, jaxlib {jaxlib.__version__}, "
                f"numpy {numpy.__version__}")

    _check(results, "versions", versions)

    def cache():
        from .compile_cache import enable_compile_cache

        d = enable_compile_cache()
        if d is None:
            raise RuntimeError("compile cache disabled or directory "
                               "not creatable (TORCHPIV_NO_COMPILE_CACHE?)")
        if not os.path.isdir(d):
            raise RuntimeError(f"cache dir missing: {d}")
        probe = os.path.join(d, ".doctor_probe")
        with open(probe, "w") as f:
            f.write("ok")
        os.remove(probe)
        n = sum(1 for x in os.listdir(d) if not x.startswith("."))
        return f"{d} writable, {n} cached executables"

    _check(results, "compile cache", cache)

    def native():
        import numpy as np

        from ..io.decode import imwrite_gray
        from ..native import loader as fastio

        if not fastio.available():
            raise RuntimeError("native fastio unavailable (C++ toolchain "
                               "missing?) — python decoder fallback active")
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "probe.bmp")
            img = np.arange(64 * 64, dtype=np.uint8).reshape(64, 64)
            imwrite_gray(p, img)
            dims = fastio.probe_gray(p)
            if dims is None:
                raise RuntimeError(f"native probe failed for {p} (library "
                                   "loaded but the BMP header was rejected)")
            frames, status = fastio.read_batch_gray([p], dims, threads=1)
            if status[0] != 0 or not (frames[0] == img).all():
                raise RuntimeError("native decode round-trip mismatch")
        return "C++ decoder round-trip ok"

    _check(results, "native decoder", native)

    def skipped():
        raise RuntimeError("skipped: backend unreachable (see 'jax devices')")

    def bandwidth():
        import jax
        import numpy as np

        blob = np.zeros((bandwidth_mb, 1024, 1024), np.uint8)
        t = time.perf_counter()
        jax.device_put(blob).block_until_ready()
        dt = time.perf_counter() - t
        mbps = blob.nbytes / 2**20 / dt
        frame_mb = 4.0  # 4 MP uint8
        note = ""
        if mbps < 100:
            note = (" — SLOW for sustained 4 MP ingest "
                    f"(~{mbps / (2 * frame_mb):.1f} pairs/s H2D bound); "
                    "fine if frames are staged once")
        return f"host->device {mbps:.0f} MB/s ({bandwidth_mb} MB probe){note}"

    _check(results, "h2d bandwidth", bandwidth if backend_ok else skipped)

    def dispatch():
        import jax
        import jax.numpy as jnp
        import numpy as np

        f = jax.jit(lambda x: x + 1)
        x = jnp.zeros((8, 8))
        np.asarray(f(x))  # compile + force the first result to the host
        t = time.perf_counter()
        reps = 10
        for i in range(reps):
            # pull EVERY result back to the host: block_until_ready alone
            # can read ~0 ms on network-attached devices that cache
            # repeated dispatches (observed on tunneled dev chips); the
            # D2H readback is the per-call overhead a result consumer
            # actually pays
            x = jnp.asarray(np.asarray(f(x)))
        ms = (time.perf_counter() - t) / reps * 1000
        note = " — network-attached device?" if ms > 5 else ""
        return f"{ms:.1f} ms/dispatch+readback round trip{note}"

    _check(results, "dispatch latency", dispatch if backend_ok else skipped)

    if cache_roundtrip:
        def cache_hits():
            # Compile the same tiny graph in TWO fresh subprocesses: the
            # second must deserialize from the persistent cache, proving
            # cross-process key stability end-to-end (round 4 found two
            # silent breakers: committed-arg sdy annotations and
            # import-path-dependent Mosaic payloads — see
            # tools/cachekey_probe.py).  Each subprocess pays backend
            # init, so this check is opt-in (tpiv doctor --cache).
            #
            # Classification is STRUCTURAL, not log-text matching (jax is
            # free to reword its debug messages): each probe counts the
            # cache-dir entries its own compile created.  The probe graph
            # embeds a per-doctor-run salt constant, so process 1 always
            # compiles fresh (>=1 new entry) and process 2 — same salt —
            # must deserialize (0 new entries).
            snippet = r"""
import os, sys
from torchpiv_tpu.utils.compile_cache import enable_compile_cache
cache_dir = enable_compile_cache()
if cache_dir is None:
    print("TPIV_PROBE:DISABLED:0"); sys.exit(0)
import jax
# the env var alone does not switch platforms under pinned profiles
# (see CLAUDE.md); only the config call does
plat = os.environ.get("TPIV_DOCTOR_PLATFORM")
if plat:
    jax.config.update("jax_platforms", plat)
import jax.numpy as jnp, numpy as np
salt = float(os.environ["TPIV_DOCTOR_SALT"])
def doctor_cache_probe(a, b):
    return (a @ b + salt).sum()
f = jax.jit(doctor_cache_probe)
x = jnp.ones((64, 64), jnp.float32)
before = set(os.listdir(cache_dir))
np.asarray(f(x, x))
wrote = len(set(os.listdir(cache_dir)) - before)
print(f"TPIV_PROBE:OK:{wrote}")
"""
            env = os.environ.copy()
            # unique constant per doctor run -> unique graph -> unique key
            env["TPIV_DOCTOR_SALT"] = repr(time.time())
            if device != "auto":
                # the request may be a platform ("cpu", "cpu:0") or a
                # device display string ("TPU_0(...)"); resolve and use
                # the device's platform — string-splitting the display
                # form would feed jax_platforms garbage.  The backend was
                # already contacted by the 'jax devices' check, so
                # resolving here adds no new init risk.
                from ..pipeline import DeviceMap

                env["TPIV_DOCTOR_PLATFORM"] = DeviceMap.resolve(
                    device).platform
            outs = []
            for _ in range(2):
                r = subprocess.run(
                    [sys.executable, "-c", snippet], capture_output=True,
                    text=True, env=env)
                if r.returncode != 0:
                    raise RuntimeError(
                        f"cache probe subprocess failed: {r.stderr[-300:]}")
                toks = [ln for ln in r.stdout.splitlines()
                        if ln.startswith("TPIV_PROBE:")]
                if not toks:
                    raise RuntimeError(
                        "probe subprocess emitted no TPIV_PROBE sentinel "
                        f"(stdout: {r.stdout[-200:]!r})")
                outs.append(toks[-1].split(":"))
            if outs[0][1] == "DISABLED":
                raise RuntimeError(
                    "compile cache disabled (TORCHPIV_NO_COMPILE_CACHE "
                    "set, or the cache directory is not creatable) — "
                    "nothing to round-trip")
            w1, w2 = int(outs[0][2]), int(outs[1][2])
            if w1 < 1:
                raise RuntimeError(
                    "first process wrote no cache entry — the persistent "
                    "cache is not persisting (directory not writable, or "
                    "jax stopped honoring the min-entry overrides)")
            if w2 != 0:
                raise RuntimeError(
                    f"second process recompiled ({w2} new cache entries "
                    "written) — cross-process cache keys unstable; every "
                    "fresh run will pay the full compile (if another "
                    "process writes this cache dir concurrently, re-run)")
            return (f"first: compiled + wrote {w1} entr"
                    f"{'y' if w1 == 1 else 'ies'}, second: deserialized "
                    "(wrote 0)")

        _check(results, "cache round-trip",
               cache_hits if backend_ok else skipped)

    if engine_check:
        def engine():
            import jax
            import jax.numpy as jnp
            import numpy as np

            from ..models import MultipassPIV, PIVConfig
            from ..pipeline import DeviceMap
            from .synthetic import particle_pair

            dev = DeviceMap.resolve(device)
            kw = {} if dev.platform == "tpu" else {"use_pallas": "off"}
            d = (3.3, -2.1)
            fa, fb = particle_pair((256, 256), displacement=d, seed=1)
            cfg = PIVConfig(frame_shape=(256, 256), wind_size=64,
                            overlap=32, multipass=2, **kw)
            with jax.default_device(dev):
                t0 = time.perf_counter()
                u, v, inval = jax.jit(MultipassPIV(cfg))(
                    jnp.asarray(fa), jnp.asarray(fb))
                u = np.asarray(u)
                v = np.asarray(v)
                compile_s = time.perf_counter() - t0
            eu = abs(float(np.median(u)) - d[0])
            ev = abs(float(np.median(v)) - d[1])
            if eu > 0.1 or ev > 0.1:
                raise RuntimeError(
                    f"engine recovered ({np.median(u):.2f}, "
                    f"{np.median(v):.2f}), expected {d}")
            return (f"recovered ({np.median(u):.2f}, {np.median(v):.2f}) "
                    f"= truth {d} on {dev} "
                    f"(compile+run {compile_s:.1f} s)")

        _check(results, "engine smoke", engine if backend_ok else skipped)

    return results


def format_report(results: List[dict]) -> str:
    lines = []
    for r in results:
        mark = "ok " if r["ok"] else "FAIL"
        lines.append(f"[{mark}] {r['name']:16s} {r['detail']}")
    bad = [r for r in results if not r["ok"]]
    lines.append(
        f"{len(results) - len(bad)}/{len(results)} checks passed"
        + ("" if not bad else
           " — FAILED: " + ", ".join(r["name"] for r in bad)))
    return "\n".join(lines)
