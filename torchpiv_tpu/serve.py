"""HTTP serving mode (``tpiv serve``): a long-lived PIV analysis service.

The reference is a desktop app; a production TPU host is typically a
shared resource driven by acquisition machines over the network.  This
module wraps the engine in a small stdlib HTTP server so clients submit
frame pairs (or point the server at files it can read) and get fields
back, with the engine compiled ONCE and kept hot across requests —
amortising the multi-minute XLA compile that makes per-request process
spawning a non-starter.

Endpoints (all responses JSON unless noted):

* ``GET /healthz`` — liveness + device + compiled frame shapes.
* ``GET /config`` — the analysis settings the server applies.
* ``GET /metrics`` — Prometheus-style text: pairs served, error count,
  rolling latency.
* ``POST /piv`` — body: an ``.npz`` with uint8 arrays ``a`` and ``b``
  (same shape).  Response: an ``.npz`` with ``x, y, u, v`` (physical
  units, same contract as ``OfflinePIV``) and ``invalid`` mask.  A
  camera burst may be submitted as stacked ``[B,H,W]`` arrays: the
  response fields gain the leading pair axis plus a ``skipped_pairs``
  mask (per-pair >50%-invalid skips come back as NaN planes rather
  than failing the burst).
* ``POST /piv_files`` — body: JSON ``{"a": path, "b": path}`` naming
  files the SERVER can read (shared filesystem); same ``.npz`` response.

Transport is deliberately dependency-free (``http.server``): no flask /
grpc in the image, and PIV fields are small (a 4 MP pair in -> ~500 kB
out), so a threading stdlib server saturates the engine long before the
transport matters.  Engine dispatch is serialized with a lock — requests
queue; the engine itself batches internally per call.
"""
from __future__ import annotations

import io
import json
import logging
import os
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional, Tuple

import numpy as np

log = logging.getLogger("torchpiv_tpu")


class PIVService:
    """Engine state shared across requests: per-frame-shape compiled
    graphs (lazy, like ``OnlinePIV``), physical-unit finalization, and
    rolling metrics."""

    def __init__(
        self,
        device: str = "auto",
        wind_size: int = 64,
        overlap: int = 32,
        multipass: int = 1,
        multipass_mode: str = "CWS",
        dt: float = 1.0,
        scale: float = 1.0,
        multipass_scale: float = 2.0,
        validate: bool = True,
        engine_options: Optional[dict] = None,
    ):
        from .pipeline import DeviceMap

        self._device_request = device
        self._device = DeviceMap.resolve(device)
        self._dt = dt
        self._scale = scale
        self._settings = dict(
            wind_size=wind_size,
            overlap=overlap,
            multipass=multipass,
            multipass_mode=multipass_mode,
            multipass_scale=multipass_scale,
            validate=validate,
            **(engine_options or {}),
        )
        if self._device.platform != "tpu":
            self._settings.setdefault("use_pallas", "off")
        self._engines: Dict[Tuple[int, int], tuple] = {}
        self._batch_fns: Dict[Tuple[int, int], object] = {}
        # burst dispatch chunk size: one compiled batch graph per frame
        # shape (shorter chunks pad up to it)
        self._scan_b = int(os.environ.get("TPIV_SERVE_SCAN_B", 8))
        self._lock = threading.Lock()  # engine build + dispatch
        self.pairs_served = 0
        self.errors = 0
        self.latencies_ms: deque = deque(maxlen=256)
        self.started = time.time()

    # ---- engine -----------------------------------------------------------
    def _engine_for(self, shape: Tuple[int, int]):
        eng_fn = self._engines.get(shape)
        if eng_fn is None:
            import jax
            import jax.numpy as jnp

            from .models import MultipassPIV, PIVConfig
            from .utils.compile_cache import enable_compile_cache

            enable_compile_cache()
            cfg = PIVConfig(frame_shape=shape, **self._settings)
            engine = MultipassPIV(cfg)

            def single(a, b):
                u, v, iv = engine(a, b)
                if iv is None:
                    iv = jnp.zeros(u.shape, bool)
                return jnp.stack([u, v, iv.astype(jnp.float32)])

            eng_fn = (engine, jax.jit(single))
            self._engines[shape] = eng_fn
            log.info("serve: compiled engine for frame shape %s", shape)
        return eng_fn

    def warmup(self, shape: Tuple[int, int]) -> None:
        """Compile BOTH dispatch graphs for ``shape`` before traffic
        arrives: the single-pair graph (/piv with one pair, /piv_files)
        and the burst packed-scan executable (/piv with stacked pairs) —
        a warmup that only exercised the single path left the first real
        burst paying the full compile."""
        import numpy as np

        z = np.zeros(shape, np.uint8)
        # blank frames may come back as a >50%-invalid "skip" (None) —
        # irrelevant here, the compile is what we came for
        self.analyze(z, z)
        self._batch_fn_for(tuple(shape))

    def _batch_fn_for(self, shape: Tuple[int, int]):
        """The production packed-scan graph for ``[B,3,R,C]`` dispatch
        (shared builder -> same trace -> same persistent-cache entry as
        OfflinePIV/warmup), built lazily per frame shape at the fixed
        ``self._scan_b`` batch; shorter chunks are padded to it."""
        fn = self._batch_fns.get(shape)
        if fn is None:
            from .pipeline import aot_compile_packed, build_packed_scan

            engine, _ = self._engine_for(shape)
            # AOT with the canonical cache key: tracing lazily inside the
            # handler's default_device context would produce a different
            # persistent-cache key than `tpiv warmup` (aot_compile_packed)
            fn = aot_compile_packed(
                build_packed_scan(engine), self._scan_b, shape,
                self._device_request, self._device)
            self._batch_fns[shape] = fn
        return fn

    def _finalize_pair(self, engine, u, v, inval, t0) -> dict:
        """Host tail + metrics for one pair's raw device results."""
        from .pipeline import finalize_fields

        x, y = engine.final_coordinates
        # same tail gate as OfflinePIV: host NaN+infill for infill="host"
        # only ("fused" already filled on device, "none" = raw vectors)
        tail_validates = (self._settings.get("validate", True)
                          and self._settings.get("infill", "host") == "host")
        res = finalize_fields(
            u, v, inval if tail_validates else None,
            x, y, self._scale, self._dt,
            static_mask=engine.window_masked[-1])
        self.latencies_ms.append(1000 * (time.perf_counter() - t0))
        self.pairs_served += 1
        if res is None:  # >50% invalid: the reference's skip quirk
            return {"skipped": True,
                    "reason": "more than half the vectors are invalid"}
        rx, ry, ru, rv = res
        return {"skipped": False, "x": rx, "y": ry, "u": ru, "v": rv,
                "invalid": np.asarray(inval)}

    def analyze(self, frame_a: np.ndarray, frame_b: np.ndarray) -> dict:
        """Run one pair through the (lazily compiled) engine; returns the
        OfflinePIV-contract fields in physical units."""
        import jax
        import jax.numpy as jnp

        if frame_a.shape != frame_b.shape or frame_a.ndim != 2:
            raise ValueError(
                f"expected two matching 2-D frames, got {frame_a.shape} "
                f"vs {frame_b.shape}")
        frame_a = np.asarray(frame_a, dtype=np.uint8)
        frame_b = np.asarray(frame_b, dtype=np.uint8)
        t0 = time.perf_counter()
        with self._lock:
            engine, fn = self._engine_for(frame_a.shape)
            with jax.default_device(self._device):
                arr = np.asarray(fn(jnp.asarray(frame_a),
                                    jnp.asarray(frame_b)))
        return self._finalize_pair(engine, arr[0], arr[1], arr[2] > 0.5, t0)

    def analyze_batch(self, frames_a: np.ndarray,
                      frames_b: np.ndarray) -> dict:
        """Run a stacked burst ``[B,H,W]`` through the production packed
        scan in fixed-size chunks (the last chunk padded by repeating its
        final pair — one compiled batch graph per frame shape, not per
        burst size, and one output buffer per dispatch instead of per
        pair).  Per-pair skips (the >50%-invalid quirk) become NaN planes
        plus a ``skipped_pairs`` mask instead of failing the whole burst."""
        import jax
        import jax.numpy as jnp

        if (frames_a.shape != frames_b.shape or frames_a.ndim != 3
                or frames_a.shape[0] == 0):
            raise ValueError(
                f"expected two matching non-empty [B,H,W] stacks, got "
                f"{frames_a.shape} vs {frames_b.shape}")
        frames_a = np.asarray(frames_a, dtype=np.uint8)
        frames_b = np.asarray(frames_b, dtype=np.uint8)
        us, vs, invs, skipped = [], [], [], []
        x = y = None
        B = self._scan_b
        for start in range(0, frames_a.shape[0], B):
            chunk_a = frames_a[start:start + B]
            chunk_b = frames_b[start:start + B]
            n = chunk_a.shape[0]
            if n < B:  # pad to the fixed jit shape; padded outputs dropped
                pad = np.repeat(chunk_a[-1:], B - n, axis=0)
                chunk_a = np.concatenate([chunk_a, pad])
                chunk_b = np.concatenate(
                    [chunk_b, np.repeat(chunk_b[-1:], B - n, axis=0)])
            t0 = time.perf_counter()
            with self._lock:
                engine, _ = self._engine_for(chunk_a.shape[1:])
                fn = self._batch_fn_for(chunk_a.shape[1:])
                with jax.default_device(self._device):
                    arr = np.asarray(fn(jnp.asarray(chunk_a),
                                        jnp.asarray(chunk_b)))
            for i in range(n):
                res = self._finalize_pair(
                    engine, arr[i, 0], arr[i, 1], arr[i, 2] > 0.5, t0)
                if res["skipped"]:
                    skipped.append(True)
                    us.append(None)  # shape known only from a kept pair
                    vs.append(None)
                    invs.append(None)
                else:
                    skipped.append(False)
                    x, y = res["x"], res["y"]
                    us.append(res["u"])
                    vs.append(res["v"])
                    invs.append(res["invalid"])
        if x is None:  # every pair skipped
            return {"skipped": True,
                    "reason": "every pair in the burst was skipped "
                              "(more than half the vectors invalid)"}
        nan = np.full(x.shape, np.nan)
        allbad = np.ones(x.shape, bool)
        return {
            "skipped": False, "x": x, "y": y,
            "u": np.stack([u if u is not None else nan for u in us]),
            "v": np.stack([v if v is not None else nan for v in vs]),
            "invalid": np.stack(
                [i if i is not None else allbad for i in invs]),
            "skipped_pairs": np.asarray(skipped, bool),
        }

    # ---- views ------------------------------------------------------------
    def health(self) -> dict:
        return {
            "ok": True,
            "device": str(self._device),
            "compiled_shapes": sorted(list(s) for s in self._engines),
            "pairs_served": self.pairs_served,
            "uptime_s": round(time.time() - self.started, 1),
        }

    def config(self) -> dict:
        return {**self._settings, "dt": self._dt, "scale": self._scale,
                "device": str(self._device)}

    def metrics_text(self) -> str:
        lat = list(self.latencies_ms)
        lines = [
            "# TYPE tpiv_pairs_served counter",
            f"tpiv_pairs_served {self.pairs_served}",
            "# TYPE tpiv_errors counter",
            f"tpiv_errors {self.errors}",
            "# TYPE tpiv_latency_ms summary",
            f"tpiv_latency_ms_count {len(lat)}",
        ]
        if lat:
            lines += [
                f"tpiv_latency_ms_last {lat[-1]:.2f}",
                f"tpiv_latency_ms_median {float(np.median(lat)):.2f}",
                f"tpiv_latency_ms_p95 "
                f"{float(np.percentile(lat, 95)):.2f}",
            ]
        return "\n".join(lines) + "\n"


def _npz_bytes(**arrays) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


class _Handler(BaseHTTPRequestHandler):
    service: PIVService  # injected by make_server

    # quiet the default per-request stderr lines; route to logging
    def log_message(self, fmt, *args):
        log.debug("serve: " + fmt, *args)

    def _send(self, code: int, body: bytes, ctype: str) -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _send_json(self, code: int, obj) -> None:
        self._send(code, json.dumps(obj).encode(), "application/json")

    def do_GET(self):  # noqa: N802  (http.server API)
        if self.path == "/healthz":
            self._send_json(200, self.service.health())
        elif self.path == "/config":
            self._send_json(200, self.service.config())
        elif self.path == "/metrics":
            self._send(200, self.service.metrics_text().encode(),
                       "text/plain; version=0.0.4")
        else:
            self._send_json(404, {"error": f"unknown path {self.path}"})

    def _read_body(self) -> bytes:
        n = int(self.headers.get("Content-Length", 0))
        return self.rfile.read(n)

    def do_POST(self):  # noqa: N802
        try:
            if self.path == "/piv":
                with np.load(io.BytesIO(self._read_body())) as z:
                    if "a" not in z.files or "b" not in z.files:
                        raise ValueError("npz must contain arrays 'a', 'b'")
                    fa, fb = z["a"], z["b"]
            elif self.path == "/piv_files":
                req = json.loads(self._read_body() or b"{}")
                from .io.decode import imread_gray

                fa = imread_gray(str(req.get("a", "")))
                fb = imread_gray(str(req.get("b", "")))
                if fa is None or fb is None:
                    raise ValueError(
                        f"unreadable file(s): {req.get('a')!r}, "
                        f"{req.get('b')!r}")
            else:
                self._send_json(404, {"error": f"unknown path {self.path}"})
                return
            if getattr(fa, "ndim", 2) == 3:  # stacked burst [B,H,W]
                res = self.service.analyze_batch(fa, fb)
            else:
                res = self.service.analyze(fa, fb)
            if res["skipped"]:
                self._send_json(422, {"error": res["reason"],
                                      "skipped": True})
                return
            extra = ({"skipped_pairs": res["skipped_pairs"]}
                     if "skipped_pairs" in res else {})
            self._send(200, _npz_bytes(
                x=res["x"], y=res["y"], u=res["u"], v=res["v"],
                invalid=res["invalid"], **extra), "application/octet-stream")
        except ValueError as e:
            self.service.errors += 1
            self._send_json(400, {"error": str(e)})
        except Exception as e:  # noqa: BLE001 - a server must not die
            self.service.errors += 1
            log.exception("serve: request failed")
            self._send_json(500, {"error": f"{type(e).__name__}: {e}"})


def make_server(service: PIVService, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    """Build (but do not start) the HTTP server; ``server.server_address``
    carries the bound port when ``port=0``."""
    handler = type("BoundHandler", (_Handler,), {"service": service})
    return ThreadingHTTPServer((host, port), handler)


def run_server(service: PIVService, host: str, port: int) -> None:
    srv = make_server(service, host, port)
    log.info("serve: listening on %s:%d", *srv.server_address)
    print(f"tpiv serve: listening on http://{srv.server_address[0]}:"
          f"{srv.server_address[1]}  (endpoints: /healthz /config /metrics "
          f"POST /piv POST /piv_files)", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
