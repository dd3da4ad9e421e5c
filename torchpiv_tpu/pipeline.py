"""Pipeline layer (L3/L4): OfflinePIV, OnlinePIV and the headless runner.

``OfflinePIV`` preserves the reference API contract (/root/reference/src/
torchPIV/PIVbackend.py:824-903): same constructor signature
``(folder, device, file_fmt, wind_size, overlap, multipass, multipass_mode,
dt, scale, multipass_scale, folder_mode)``, and calling the instance returns
a generator yielding ``(x, y, u, v)`` numpy fields per image pair, with the
same validation/NaN-infill tail, axis flip and physical-unit conversion.

Differences under the hood (the TPU-native part):

* pairs are processed in device batches via one jitted ``lax.scan`` over the
  fused multipass graph — a single dispatch per batch instead of dozens of
  kernel launches and host syncs per pair;
* decode + host->device transfer run in a thread pool ahead of the device
  (``io.prefetch``), replacing the synchronous ``DataLoader`` loop;
* ``OnlinePIV`` actually works (the reference's is an unfinished stub):
  it consumes a directory watcher and yields fields as a camera writes
  frames.
"""
from __future__ import annotations

import logging
import queue
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Generator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .io.dataset import PIVDataset
from .io.decode import imread_gray
from .io.prefetch import PairPrefetcher
from .io.preprocess import PreprocessedPairs, resolve_preprocess
from .io.watch import StreamingPairSource
from .models.multipass import MultipassPIV, PIVConfig
from .ops.infill import fill_missing_values, interpolate_borders
from .stats.ensemble import EnsembleAccumulator
from .utils.config import PIVParams
from .utils.persistence import save_binary, save_table

log = logging.getLogger("torchpiv_tpu")


class DeviceMap:
    """Device-name string -> jax.Device, built on demand.

    Equivalent of the reference's import-time CUDA enumeration
    (PIVbackend.py:13-18) but lazy and multi-platform: accepts "cpu", "tpu",
    a platform:index like "tpu:1", or a device's display string.
    """

    @staticmethod
    def devices() -> Dict[str, jax.Device]:
        table: Dict[str, jax.Device] = {}
        for platform in ("tpu", "cpu"):
            try:
                devs = jax.devices(platform)
            except RuntimeError:
                continue
            for i, d in enumerate(devs):
                table.setdefault(str(d), d)
                table.setdefault(f"{platform}:{i}", d)
            if devs:
                table.setdefault(platform, devs[0])
        return table

    @staticmethod
    def resolve(name: str) -> jax.Device:
        # default: whatever jax considers the default backend
        if name in ("", "auto", "default", None):
            return jax.devices()[0]
        # a platform name or platform:index touches ONLY that backend —
        # resolving "cpu" must never initialise the TPU runtime (which
        # can block for minutes when the accelerator is remote and down)
        platform, _, idx = str(name).partition(":")
        if platform in ("cpu", "tpu") and (idx == "" or idx.isdigit()):
            try:
                devs = jax.devices(platform)
            except RuntimeError as e:
                raise ValueError(
                    f"unknown device {name!r}: no {platform} backend "
                    f"({e})") from None
            i = int(idx) if idx else 0
            if i < len(devs):
                return devs[i]
            # error without falling through to the full table — that
            # would enumerate OTHER platforms' backends, defeating the
            # touch-only-this-backend guarantee on its own error path
            raise ValueError(
                f"unknown device {name!r}: platform {platform} has "
                f"{len(devs)} device(s)")
        table = DeviceMap.devices()
        if name in table:
            return table[name]
        raise ValueError(
            f"unknown device {name!r}; available: {sorted(table)}"
        )


def finalize_fields(
    u: np.ndarray,
    v: np.ndarray,
    invalid: Optional[np.ndarray],
    x: np.ndarray,
    y: np.ndarray,
    scale: float,
    dt: float,
    static_mask: Optional[np.ndarray] = None,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """The reference's per-pair tail (PIVbackend.py:884-900): NaN the invalid
    vectors, border-interp + Delaunay infill (skip pair if >half invalid),
    flip to physical y-axis, convert to mm and m/s.  Returns None when the
    pair must be skipped.

    ``static_mask`` marks windows excluded by a region-of-interest mask
    (walls): they are reported as ZERO displacement rather than infilled,
    and do not count toward the reference's >50%-invalid skip quirk — a
    large static mask is not a measurement failure."""
    u = np.array(u, dtype=np.float64)
    v = np.array(v, dtype=np.float64)
    if static_mask is not None:
        static_mask = np.asarray(static_mask, dtype=bool)
        u[static_mask] = 0.0
        v[static_mask] = 0.0
        if invalid is not None:
            invalid = np.asarray(invalid) & ~static_mask
    if invalid is not None:
        invalid = np.asarray(invalid)
        u[invalid] = np.nan
        v[invalid] = np.nan
        u = interpolate_borders(u)
        v = interpolate_borders(v)
        u = fill_missing_values(u)
        v = fill_missing_values(v)
        if u is None or v is None:
            return None
    u = np.flip(u, axis=0)
    v = -np.flip(v, axis=0)
    u = u * scale / dt * 1000
    v = v * scale / dt * 1000
    return x * scale, y * scale, u, v


def build_packed_scan(engine: MultipassPIV, background=None):
    """THE production batched dispatch graph: scan the fused per-pair
    engine over ``[B, H, W]`` uint8 batches, packing each pair's results
    into one ``[3, R, C]`` f32 slab -> one ``[B, 3, R, C]`` output buffer
    per dispatch (each output buffer pays a fixed round trip on
    network-attached hosts; packing measured 12.3 -> 10.7 ms/pair).

    Every entry point that wants the production executable MUST build it
    through here — ``OfflinePIV``, ``OnlinePIV`` catch-up, ``tpiv
    warmup``, bench.py — because the persistent compile cache keys on the
    traced graph: a structurally different scan (e.g. tuple outputs)
    compiles and caches a DIFFERENT executable and warms nothing.
    """
    bg = jnp.asarray(background) if background is not None else None

    def batched(fa, fb):
        def step(carry, ab):
            a, b = ab
            if bg is not None:  # saturating uint8 background subtract
                a = jnp.where(a > bg, a - bg, 0)
                b = jnp.where(b > bg, b - bg, 0)
            u, v, inval = engine(a, b)
            if inval is None:
                inval = jnp.zeros(u.shape, dtype=bool)
            return carry, jnp.stack([u, v, inval.astype(jnp.float32)])

        _, out = jax.lax.scan(step, 0, (fa, fb))
        return out

    return jax.jit(batched)


_AOT_COMPILE_LOCK = threading.Lock()


def aot_compile_packed(fn, batch: int, frame_shape, device_request="auto",
                       device=None, dtype=jnp.uint8):
    """Compile the packed scan for one batch size with the CANONICAL
    persistent-cache key.

    Lowers from abstract shapes with the ``default_device`` config RESET
    (``jax.default_device(None)``), because both measured key-changers
    must be absent for the entry points to share cache entries
    (tools/cachekey_probe.py):

    * committed example args annotate the module with sdy.sharding attrs
      (stage B) — hence abstract ``ShapeDtypeStruct`` inputs;
    * a SET ``default_device`` — even one naming the process-default
      device — changes the lowered module (stage E), and dispatch threads
      (OfflinePIV's feeder, OnlinePIV's stream loop, serve's handlers)
      run inside such a context — hence the explicit reset.

    The auto->None rule lives HERE so every entry point shares it: a
    ``device_request`` of ``"auto"`` resolved to the process-default
    device, so the canonical (warmup-matching) default-device compile is
    both correct and cache-shared, and the resolved ``device`` is
    deliberately ignored; an explicit non-"auto" request compiles under
    that ``device``'s context instead (correct executable; the key is
    then intentionally device-specific and self-consistent across
    processes, but distinct from ``tpiv warmup``'s default-device key).
    Deciding from the REQUEST string avoids touching ``jax.devices()``
    here, which would initialise the default (possibly TPU) backend on a
    pipeline explicitly pinned to CPU.

    ``dtype`` follows the frames the caller will dispatch: the decode
    contract is uint8, but a user ``preprocess`` callable may emit any
    dtype, and an AOT executable (unlike jit) hard-rejects argument
    types it was not compiled for.
    """
    sds = jax.ShapeDtypeStruct((batch, *frame_shape), dtype)
    return _aot_compile(fn, (sds, sds), device_request, device)


def _aot_compile(fn, arg_specs, device_request, device):
    """Lock-serialized canonical-key compile (see aot_compile_packed).

    One compile at a time, process-wide: OfflinePIV prewarms two batch
    sizes on background threads and serve's handler threads can race
    _batch_fn_for — an on-chip A/B (docs/ROADMAP.md, Aug 19) showed two
    CONCURRENT compiles of this graph missing the persistent cache that
    the same compiles hit when serialized, turning a 28-40 s warm start
    into a 290 s recompile.  The remote compile service processes
    requests serially anyway, so this costs no wall-clock.
    """
    with _AOT_COMPILE_LOCK:
        with jax.default_device(None if device_request == "auto" else device):
            return fn.lower(*arg_specs).compile()


def resolve_frame_mask(mask):
    """Normalise a region-of-interest mask argument: ``None``, a [H, W]
    bool-like array (True = excluded), or the path of a mask image whose
    non-zero pixels are excluded (beyond the reference — it has no ROI
    support)."""
    if mask is None:
        return None
    if isinstance(mask, str):
        arr = imread_gray(mask)
        if arr is None:
            raise ValueError(f"unreadable mask image: {mask}")
        return arr > 0
    return np.asarray(mask).astype(bool)


class OfflinePIV:
    """Folder -> generator of (x, y, u, v) fields.  The reference API.

    Extra (keyword-only) knobs beyond the reference signature: ``batch_size``
    (pairs per device dispatch), ``validate``/``val_ratio``, and any
    ``PIVConfig`` field via ``engine_options``.  ``engine_options`` also
    accepts ``frame_mask``: a [H, W] bool array (True = excluded region,
    e.g. walls) or the path of a mask image (non-zero = excluded), plus
    ``mask_threshold`` — masked windows are reported with zero displacement
    and excluded from the >50%-invalid skip accounting.
    """

    def __init__(
        self,
        folder: str,
        device: str = "auto",
        file_fmt: str = ".bmp",
        wind_size: int = 64,
        overlap: int = 32,
        multipass: int = 1,
        multipass_mode: str = "CWS",
        dt: float = 1,
        scale: float = 1.0,
        multipass_scale: float = 2.0,
        folder_mode: str = "pairs",
        *,
        batch_size: int = 4,
        validate: bool = True,
        val_ratio: float = 1.2,
        decode_threads: int = 4,
        skip_pairs: int = 0,
        max_pairs: Optional[int] = None,
        mesh=None,
        background="none",
        preprocess="none",
        engine_options: Optional[dict] = None,
    ) -> None:
        self._wind_size = wind_size
        self._overlap = overlap
        self._dt = dt
        self._scale = scale
        self._batch = max(1, batch_size)
        self._device_request = device
        self._device = DeviceMap.resolve(device)
        self._decode_threads = decode_threads
        self._dataset = PIVDataset(folder, file_fmt, folder_mode)
        if skip_pairs:  # resume support: pairs are consumed in sorted order
            self._dataset.img_pairs = self._dataset.img_pairs[skip_pairs:]
        if max_pairs is not None:  # block sharding / previews
            self._dataset.img_pairs = self._dataset.img_pairs[:max_pairs]
        # frame conditioning (CLAHE / percentile stretch, io/preprocess.py)
        # wraps the dataset so it runs in the prefetcher's decode threads;
        # anything downstream (background estimate, engine) sees the
        # conditioned frames
        pp = resolve_preprocess(preprocess)
        if pp is not None:
            self._dataset = PreprocessedPairs(self._dataset, pp)
        engine_options = dict(engine_options or {})
        self._frame_mask = engine_options.pop("frame_mask", None)
        self._mask_threshold = engine_options.pop("mask_threshold", 0.5)
        self._engine_kwargs = dict(
            wind_size=wind_size,
            overlap=overlap,
            multipass=multipass,
            multipass_mode=multipass_mode,
            multipass_scale=multipass_scale,
            validate=validate,
            val_ratio=val_ratio,
            **engine_options,
        )
        # Pallas kernels compile only for TPU; the engine's "auto" checks
        # the GLOBAL default backend, which is tpu even when the user asks
        # for device="cpu" on a TPU host — pin it to the TARGET device.
        if self._device.platform != "tpu":
            self._engine_kwargs.setdefault("use_pallas", "off")
        self._mesh = mesh
        # Background subtraction (beyond the reference): "auto" computes the
        # temporal-minimum image over the first pairs; an array uses it
        # directly; "none" disables.
        if isinstance(background, str):
            if background == "auto":
                from .io.dataset import compute_background

                self._background = compute_background(self._dataset)
            elif background == "none":
                self._background = None
            else:
                raise ValueError(f"unknown background option {background!r}")
        else:
            self._background = np.asarray(background, dtype=np.uint8)
        self._engine: Optional[MultipassPIV] = None
        self._batched_fn = None
        # In-run H2D accounting (``io.prefetch.PairPrefetcher``): set to a
        # list BEFORE calling the instance and each device-placed batch
        # appends ``(t_start, t_end, n_bytes)``.  bench.py uses this for a
        # drift-proof achieved-vs-bound check; None (default) disables.
        self.transfer_log: Optional[list] = None
        # Build the engine from the first *readable* pair (the reference
        # crashes if pair 0 is unreadable, PIVbackend.py:853).  The pair
        # has been through any user preprocess already (PreprocessedPairs
        # wraps the dataset above), so its dtype is what the feeder will
        # dispatch — the AOT executables must be compiled for it.
        self._frame_dtype = np.dtype(np.uint8)
        for i in range(len(self._dataset)):
            frame_a, _ = self._dataset[i]
            if frame_a is not None:
                self._frame_dtype = np.dtype(frame_a.dtype)
                self._build_engine(frame_a.shape)
                break
        # ramp-up: the FIRST dispatch uses a small batch so its H2D (which
        # has nothing to overlap with) exposes less and the first field
        # arrives sooner; jit specialises the same batched fn per shape.
        # Mesh mode keeps uniform batches (they must divide the pair axis)
        # — set AFTER _build_engine, which rounds _batch up to a pair-axis
        # multiple, so the first dispatch matches the mesh too.
        self._first_batch = (self._batch if mesh is not None
                             else min(4, self._batch))

    def _build_engine(self, frame_shape) -> None:
        # persistent XLA compile cache: a fresh process deserializes the
        # (minutes-to-compile) engine executable in seconds on re-runs
        from .utils.compile_cache import enable_compile_cache

        enable_compile_cache()
        # scipy.interpolate costs ~1 s to import and the first drained
        # pair would pay it inline; warm it while the engine compiles
        threading.Thread(
            target=lambda: __import__("scipy.interpolate"),
            name="piv-scipy-warmup", daemon=True).start()
        cfg = PIVConfig(frame_shape=tuple(frame_shape), **self._engine_kwargs)
        self._engine = MultipassPIV(
            cfg, frame_mask=resolve_frame_mask(self._frame_mask),
            mask_threshold=self._mask_threshold)

        if self._mesh is not None:
            # Multi-chip: shard the batch over the mesh (pairs axis, plus
            # window-axis model parallelism when the mesh has one).
            from .parallel.sharded import ShardedPIV

            sharded = ShardedPIV(self._engine, self._mesh)
            npairs = self._mesh.shape[sharded.pair_axis]
            if self._batch % npairs:
                self._batch = -(-self._batch // npairs) * npairs
            # packed single-buffer results, same as the single-device path
            self._batched_fn = sharded.jit_packed()
            return

        # One dispatch per batch: scan the fused per-pair graph, results
        # packed into one [B, 3, R, C] buffer (see build_packed_scan).
        self._batched_fn = build_packed_scan(self._engine, self._background)
        # AOT executables per (batch size, dtype) — ramp + full sizes,
        # compiled from ABSTRACT shapes: calling the jit fn with the
        # prefetcher's device-committed arrays annotates the module with
        # sdy.sharding attrs -> a DIFFERENT persistent-cache key than
        # `tpiv warmup` / bench.py compile (measured: warmup never warmed
        # production).  .lower(ShapeDtypeStruct).compile() produces the
        # same key as the plain-style compile (verified,
        # tools/cachekey_probe.py) and the compiled executable accepts
        # committed arrays at dispatch.  Keying on dtype too: an AOT
        # executable (unlike jit) hard-rejects argument dtypes it was not
        # compiled for, and a user ``preprocess`` callable may emit a
        # different dtype per frame.
        self._aot_futures: dict = {}
        self._aot_lock = threading.Lock()

    def _aot_future(self, batch: int, dtype=None):
        """Start (or join) executable preparation for one (batch size,
        dtype) on a background thread; returns a
        ``concurrent.futures.Future``.

        Executable readiness is expensive even on a persistent-cache HIT
        over the axon tunnel (measured: 34.7 s for the first executable in
        a process, 5.7 s for the second — the first pays the remote
        service contact).  Preparing both dispatch sizes concurrently, and
        starting at generator start rather than first dispatch, overlaps
        that latency with dataset listing, decode and the first H2D.

        A FAILED compile is dropped from the table before its waiters are
        woken, so the next dispatch retries instead of re-raising a stale
        error forever (transient UNAVAILABLE from the tunnel is common).
        """
        from concurrent.futures import Future

        dtype = np.dtype(self._frame_dtype if dtype is None else dtype)
        key = (batch, dtype)
        with self._aot_lock:
            fut = self._aot_futures.get(key)
            if fut is None:
                fut = Future()
                self._aot_futures[key] = fut

                def work():
                    t0 = time.perf_counter()
                    try:
                        ex = aot_compile_packed(
                            self._batched_fn, batch,
                            self._engine.config.frame_shape,
                            self._device_request, self._device,
                            dtype=dtype)
                    except BaseException as e:  # noqa: BLE001 - to waiter
                        with self._aot_lock:  # retry on next dispatch
                            self._aot_futures.pop(key, None)
                        fut.set_exception(e)
                    else:
                        log.info(
                            "engine executable (batch %d, %s) ready in "
                            "%.1f s (seconds = persistent-cache "
                            "deserialization, minutes = fresh compile)",
                            batch, dtype, time.perf_counter() - t0)
                        fut.set_result(ex)

                threading.Thread(target=work, name=f"piv-aot-{batch}",
                                 daemon=True).start()
            return fut

    def _dispatch_fn(self, batch: int, dtype=None):
        """The executable for one padded batch size + frame dtype.

        Single-device mode compiles ahead-of-time from abstract shapes so
        the persistent-cache key matches ``tpiv warmup``'s (see
        ``_build_engine``); mesh mode keeps the sharded jit (its
        in_shardings drive device placement).
        """
        if self._mesh is not None:
            return self._batched_fn
        if not hasattr(self._batched_fn, "lower"):
            return self._batched_fn  # injected plain callable (tests/hooks)
        return self._aot_future(batch, dtype).result()

    @property
    def engine(self) -> Optional[MultipassPIV]:
        return self._engine

    def __len__(self) -> int:
        return len(self._dataset)

    def __call__(self) -> Generator:
        """Three-stage pipeline, each stage on its own thread(s), so the
        only serial cost per pair is the slowest stage (H2D on a tunnel
        host, device compute on a PCIe host):

        * prefetcher threads: disk -> decode -> async ``device_put``;
        * feeder thread: device dispatch with bounded in-flight batches;
        * drainer thread: blocks on results (D2H) and fans the host tail
          (validation infill + unit conversion) over a worker pool.

        The reference serialises all of this in one loop
        (PIVbackend.py:862-903: synchronous DataLoader, per-pair GPU call,
        host scipy infill before the next pair starts).
        """
        if self._engine is None:
            return
        # Prepare BOTH dispatch executables (ramp + full batch) now, on
        # background threads, so cache deserialization / remote-service
        # contact overlaps the prefetcher's decode and first H2D instead
        # of stalling the first dispatch (see _aot_future).  The full
        # batch is prepared only when some dispatch will actually use it
        # (a short dataset only ever pads to the ramp size) — an unused
        # prewarm wastes a full compile and leaves a daemon thread that a
        # fast-exiting process would kill MID-REMOTE-COMPILE, wedging the
        # tunnel's compile service for the next 20-40 min.
        if self._mesh is None and hasattr(self._batched_fn, "lower"):
            ramp_fut = self._aot_future(self._first_batch)
            if (self._batch != self._first_batch
                    and len(self._dataset) > self._first_batch):
                # chain, don't race: compiles serialize on
                # _AOT_COMPILE_LOCK, and the ramp executable must win
                # that lock — the first field waits on it
                ramp_fut.add_done_callback(
                    lambda f: f.exception() is None
                    and self._aot_future(self._batch))
        x, y = self._engine.final_coordinates
        prefetch = PairPrefetcher(
            self._dataset,
            batch_size=self._batch,
            num_threads=self._decode_threads,
            # in mesh mode jit distributes host batches per its in_shardings;
            # pre-committing them to one device would conflict
            device_put=self._mesh is None,
            # three batches in flight keep the H2D link continuously fed
            # across the decode/scheduling seams (the link, not device
            # memory, is the scarce resource on network-attached hosts;
            # 3 x batch x 2 frames is well inside HBM at any sane batch)
            depth=3,
            first_batch_size=self._first_batch,
            transfer_log=(self.transfer_log
                          if self._mesh is None else None),
            # pool threads don't inherit the feeder's default_device
            # context — target the pipeline's device explicitly
            device=self._device if self._mesh is None else None,
        )
        # Host NaN+infill tail runs only for infill="host": "fused" was
        # already filled on device, "none" asks for raw vectors (no NaN,
        # no infill, no >50%-invalid skip).
        tail_validates = (
            self._engine.config.validate
            and self._engine.config.infill == "host"
        )

        stop = threading.Event()
        DONE = object()
        # two dispatched-but-undrained batches bound device memory and give
        # the drainer a full batch of lead time
        pending_q: "queue.Queue" = queue.Queue(maxsize=2)
        result_q: "queue.Queue" = queue.Queue(maxsize=4 * self._batch)
        errors: list = []

        def put_interruptible(q, item):
            """Bounded put that aborts when the pipeline is tearing down;
            returns False if dropped."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def put_final(q, item):
            """Deliver a sentinel no matter how long the consumer stalls
            (e.g. a multi-minute pause with the queue full): keep blocking
            until it fits — dropping the DONE sentinel would leave the
            consumer hung on ``result_q.get()`` forever.  Mid-teardown
            (stop set: error or early close) evict to make room."""
            while True:
                try:
                    q.put(item, timeout=0.05)
                    return
                except queue.Full:
                    if stop.is_set():
                        try:
                            q.get_nowait()
                        except queue.Empty:
                            pass

        def feeder():
            try:
                # thread-local context: re-enter the target device here
                with jax.default_device(self._device):
                    load_t = time.perf_counter()
                    for batch_a, batch_b, ids in prefetch:
                        if stop.is_set():
                            break
                        start = time.perf_counter()
                        log.info("load time %.3f s", start - load_t)
                        if (self._mesh is not None
                                and self._background is not None):
                            # mesh mode keeps batches host-side (jit
                            # distributes them), so the saturating uint8
                            # background subtract runs here instead of
                            # inside the scan graph
                            bgv = self._background
                            batch_a = np.where(
                                batch_a > bgv, batch_a - bgv, 0)
                            batch_b = np.where(
                                batch_b > bgv, batch_b - bgv, 0)
                        B = len(ids)
                        # pad to the nearest jit shape: the small ramp-up
                        # size when the batch fits it (first batch, short
                        # tails), else the full batch size
                        target = (self._first_batch
                                  if B <= self._first_batch else self._batch)
                        if B < target:
                            pad = target - B
                            batch_a = jnp.concatenate(
                                [jnp.asarray(batch_a),
                                 jnp.tile(jnp.asarray(batch_a[-1:]),
                                          (pad, 1, 1))])
                            batch_b = jnp.concatenate(
                                [jnp.asarray(batch_b),
                                 jnp.tile(jnp.asarray(batch_b[-1:]),
                                          (pad, 1, 1))])
                        out = self._dispatch_fn(
                            target, batch_a.dtype)(batch_a, batch_b)
                        if not put_interruptible(pending_q, (ids, out)):
                            break
                        load_t = time.perf_counter()
            except BaseException as e:  # noqa: BLE001 - forwarded to caller
                errors.append(e)
                stop.set()
            finally:
                put_final(pending_q, DONE)

        def drainer():
            try:
                with ThreadPoolExecutor(
                    max_workers=max(2, self._decode_threads)
                ) as pool:
                    while True:
                        item = pending_q.get()
                        if item is DONE:
                            break
                        if stop.is_set():
                            continue  # discard; keep consuming until DONE
                        ids, payload = item
                        t0 = time.perf_counter()
                        # np.asarray blocks on this batch's results while
                        # the feeder's next batches compute/transfer
                        if isinstance(payload, tuple):
                            # defensive: a custom _batched_fn returning the
                            # classic (u, v, inval) triple still drains
                            u_b, v_b, inval_b = map(np.asarray, payload)
                        else:
                            # production paths (single-device AND mesh):
                            # one packed [B, 3, R, C] buffer per dispatch
                            arr = np.asarray(payload)
                            u_b, v_b = arr[:, 0], arr[:, 1]
                            inval_b = arr[:, 2] > 0.5
                        futs = [
                            pool.submit(
                                finalize_fields, u_b[i], v_b[i],
                                inval_b[i] if tail_validates else None,
                                x, y, self._scale, self._dt,
                                self._engine.window_masked[-1])
                            for i in range(len(ids))
                        ]
                        for pid, fut in zip(ids, futs):
                            res = fut.result()
                            if res is None:
                                log.warning(
                                    "pair %d skipped: too many invalid "
                                    "vectors", pid)
                                continue
                            if not put_interruptible(result_q, res):
                                break
                        log.info("batch of %d drained in %.3f s",
                                 len(ids), time.perf_counter() - t0)
            except BaseException as e:  # noqa: BLE001 - forwarded to caller
                errors.append(e)
                stop.set()
            finally:
                put_final(result_q, DONE)

        feeder_t = threading.Thread(
            target=feeder, name="piv-feeder", daemon=True)
        drainer_t = threading.Thread(
            target=drainer, name="piv-drainer", daemon=True)
        feeder_t.start()
        drainer_t.start()
        try:
            while True:
                item = result_q.get()
                if item is DONE:
                    break
                yield item
            if errors:
                raise errors[0]
        finally:
            stop.set()
            feeder_t.join(timeout=30)
            drainer_t.join(timeout=30)


class OnlinePIV:
    """Streaming PIV: process pairs as a camera writes them (working
    implementation of the reference's stub, PIVbackend.py:906-927).

    Iterating yields ``(x, y, u, v)`` per new pair; call ``stop()`` (or let
    ``idle_timeout`` expire) to end the stream.

    Dispatch strategy: a single-pair graph keeps per-pair latency minimal
    while the stream keeps up; when a backlog builds (camera faster than
    per-pair dispatch — over a network-attached device each dispatch pays
    fixed round-trip overhead), pairs are drained in ``catchup_batch``-size
    scan dispatches that amortise that overhead.  ``catchup_batch=1``
    disables batching.

    Pass ``frame_shape`` (the camera geometry, e.g. ``(2048, 2048)``) to
    build the engine and compile both dispatch executables while the
    stream WAITS for its first frame — otherwise the first pair pays the
    engine build + compile/cache-load latency inline.  Frames whose shape
    differs from the hint are skipped with a warning (same rule as a
    mid-stream shape change).
    """

    def __init__(
        self,
        folder: str,
        device: str = "auto",
        file_fmt: str = ".bmp",
        wind_size: int = 64,
        overlap: int = 32,
        multipass: int = 1,
        multipass_mode: str = "CWS",
        dt: float = 1,
        scale: float = 1.0,
        multipass_scale: float = 2.0,
        *,
        validate: bool = True,
        poll_interval: float = 0.2,
        idle_timeout: Optional[float] = None,
        catchup_batch: int = 4,
        preprocess="none",
        frame_shape: Optional[Tuple[int, int]] = None,
        engine_options: Optional[dict] = None,
    ) -> None:
        self._dt = dt
        self._scale = scale
        self._preprocess = resolve_preprocess(preprocess)
        self._device_request = device
        self._device = DeviceMap.resolve(device)
        self._source = StreamingPairSource(
            folder, file_fmt, poll_interval, idle_timeout
        )
        self._catchup = max(1, catchup_batch)
        engine_options = dict(engine_options or {})
        self._frame_mask = engine_options.pop("frame_mask", None)
        self._mask_threshold = engine_options.pop("mask_threshold", 0.5)
        self._engine_kwargs = dict(
            wind_size=wind_size,
            overlap=overlap,
            multipass=multipass,
            multipass_mode=multipass_mode,
            multipass_scale=multipass_scale,
            validate=validate,
            **engine_options,
        )
        if self._device.platform != "tpu":
            self._engine_kwargs.setdefault("use_pallas", "off")
        self._engine: Optional[MultipassPIV] = None
        self._fn = None
        # compile futures keyed by frame dtype (a user preprocess may emit
        # non-uint8; an AOT executable hard-rejects other dtypes).  Futures
        # rather than executables so the table lock is NEVER held across a
        # compile: a first frame landing while the prewarm thread is still
        # compiling the catch-up batch executable must not block the
        # single-pair dispatch on a minutes-long batch compile when the
        # single-pair executable is already ready (compiles themselves
        # still serialize on _AOT_COMPILE_LOCK — see _aot_compile).
        self._single_exec: dict = {}
        self._batch_exec: dict = {}
        self._exec_lock = threading.Lock()
        # threads that may be mid-REMOTE-compile; joined before the
        # generator exits (killing one wedges the tunnel's compile
        # service for 20-40 min — CLAUDE.md)
        self._compile_threads: list = []
        # optional camera-geometry hint: when given, the engine builds and
        # both executables compile while the stream WAITS for the first
        # frame (a camera stream's first pair otherwise pays the full
        # compile/cache-load latency inline)
        self._frame_shape = (tuple(frame_shape)
                             if frame_shape is not None else None)

    def stop(self) -> None:
        self._source.stop()

    def _decode(self, name_a, name_b):
        # A live camera writes files WHILE the watcher polls, so a frame
        # can be listed before its bytes are complete; a one-shot read
        # would then drop the pair permanently (observed: 1 lost frame in
        # a 45-pair 12 Hz soak under host load).  Retry briefly — a
        # mid-write file becomes readable milliseconds later; genuinely
        # corrupt files still skip after ~0.3 s total.
        frame_a = frame_b = None
        for attempt in range(3):
            if attempt:
                time.sleep(0.05 * attempt)
            if frame_a is None:
                frame_a = imread_gray(name_a)
            if frame_b is None:
                frame_b = imread_gray(name_b)
            if frame_a is not None and frame_b is not None:
                break
        else:
            log.warning("online: skipping unreadable pair %s / %s",
                        name_a, name_b)
            return None
        if self._preprocess is not None:
            frame_a = self._preprocess(frame_a)
            frame_b = self._preprocess(frame_b)
        return frame_a, frame_b

    def _ensure_engine(self, frame_shape):
        if self._engine is not None:
            return
        from .utils.compile_cache import enable_compile_cache

        enable_compile_cache()
        cfg = PIVConfig(frame_shape=frame_shape, **self._engine_kwargs)
        self._engine = MultipassPIV(
            cfg, frame_mask=resolve_frame_mask(self._frame_mask),
            mask_threshold=self._mask_threshold)
        eng = self._engine

        def single(a, b):
            # packed [3, R, C] output: one device->host buffer per pair
            # (fixed per-buffer dispatch overhead on tunnel-attached
            # devices; see OfflinePIV.batched)
            u, v, iv = eng(a, b)
            if iv is None:
                iv = jnp.zeros(u.shape, bool)
            return jnp.stack([u, v, iv.astype(jnp.float32)])

        self._fn = jax.jit(single)

    def _exec_future(self, table: dict, dtype, compile_fn):
        """Per-dtype compile future with double-checked locking: the table
        lock guards only the dict, the compile runs on a worker thread
        (serialized process-wide by _AOT_COMPILE_LOCK).  A failed compile
        is dropped from the table so the next request retries."""
        from concurrent.futures import Future

        dtype = np.dtype(dtype)
        with self._exec_lock:
            fut = table.get(dtype)
            if fut is None:
                fut = Future()
                table[dtype] = fut

                def work():
                    try:
                        ex = compile_fn(dtype)
                    except BaseException as e:  # noqa: BLE001 - to waiter
                        with self._exec_lock:
                            table.pop(dtype, None)
                        fut.set_exception(e)
                    else:
                        fut.set_result(ex)

                t = threading.Thread(target=work, name="piv-online-compile",
                                     daemon=True)
                self._compile_threads.append(t)
                t.start()
            return fut

    def _compile_single(self, dtype):
        s = jax.ShapeDtypeStruct(self._engine.config.frame_shape, dtype)
        return _aot_compile(self._fn, (s, s),
                            self._device_request, self._device)

    def _compile_batch(self, dtype):
        return aot_compile_packed(
            build_packed_scan(self._engine), self._catchup,
            self._engine.config.frame_shape,
            self._device_request, self._device, dtype=dtype)

    def _single_for(self, dtype):
        """AOT executable for one pair at ``dtype`` (canonical cache key:
        dispatch happens inside the stream loop's default_device context,
        which would otherwise change the lowered module — see
        aot_compile_packed)."""
        return self._exec_future(
            self._single_exec, dtype, self._compile_single).result()

    def _batch_for(self, dtype):
        """AOT executable for one catch-up chunk at ``dtype`` (the
        production packed-scan graph, shared cache entry with
        OfflinePIV/warmup at the same geometry)."""
        return self._exec_future(
            self._batch_exec, dtype, self._compile_batch).result()

    def _prewarm(self):
        """Background executable preparation while the stream waits for
        its first frame (requires the ``frame_shape`` hint): single-pair
        first (the live-latency path), then the catch-up batch once the
        single is ready (compiles serialize on _AOT_COMPILE_LOCK anyway,
        and the single-pair executable must win that lock — the first
        frame waits on it)."""
        fut = self._exec_future(self._single_exec, np.uint8,
                                self._compile_single)
        if self._catchup > 1:
            fut.add_done_callback(
                lambda f: f.exception() is None and self._exec_future(
                    self._batch_exec, np.uint8, self._compile_batch))

    def _join_compiles(self):
        """Wait out any in-flight compile threads before the generator
        returns: a process exiting while a daemon thread is mid-remote-
        compile wedges the tunnel's compile service for 20-40 min
        (OfflinePIV gates its prewarm the same way)."""
        for t in self._compile_threads:
            if t.is_alive():
                log.info("waiting for an in-flight engine compile to "
                         "finish before closing the stream...")
                t.join()
        self._compile_threads.clear()

    def _finalize(self, u, v, inval):
        x, y = self._engine.final_coordinates
        cfg = self._engine.config
        # same tail gate as OfflinePIV: host NaN+infill only for
        # infill="host" ("fused" is already filled on device; "none"
        # means raw vectors) — keeps online/offline results identical
        if not (cfg.validate and cfg.infill == "host"):
            inval = None
        return finalize_fields(
            np.asarray(u),
            np.asarray(v),
            np.asarray(inval) if inval is not None else None,
            x, y, self._scale, self._dt,
            static_mask=self._engine.window_masked[-1],
        )

    def __call__(self) -> Generator:
        B = self._catchup
        if self._frame_shape is not None and self._engine is None:
            self._ensure_engine(self._frame_shape)
            self._prewarm()
        try:
            with jax.default_device(self._device):
                backlog: list = []
                for burst in self._source.bursts():
                    for name_a, name_b in burst:
                        pair = self._decode(name_a, name_b)
                        if pair is None:
                            continue
                        if self._engine is None:
                            self._ensure_engine(pair[0].shape)
                        if pair[0].shape == self._engine.config.frame_shape:
                            backlog.append(pair)
                        else:
                            log.warning(
                                "online: skipping %s — frame shape %s != "
                                "engine %s", name_a, pair[0].shape,
                                self._engine.config.frame_shape)
                    if not backlog:
                        continue
                    while len(backlog) >= B > 1:
                        chunk, backlog = backlog[:B], backlog[B:]
                        fn_batch = self._batch_for(chunk[0][0].dtype)
                        fa = jnp.asarray(np.stack([p[0] for p in chunk]))
                        fb = jnp.asarray(np.stack([p[1] for p in chunk]))
                        arr = np.asarray(fn_batch(fa, fb))
                        for i in range(len(chunk)):
                            res = self._finalize(
                                arr[i, 0], arr[i, 1], arr[i, 2] > 0.5)
                            if res is not None:
                                yield res
                    while backlog:
                        frame_a, frame_b = backlog.pop(0)
                        arr = np.asarray(self._single_for(frame_a.dtype)(
                            jnp.asarray(frame_a), jnp.asarray(frame_b)))
                        res = self._finalize(arr[0], arr[1], arr[2] > 0.5)
                        if res is not None:
                            yield res
        finally:
            # never leave a daemon thread mid-remote-compile behind a
            # stream that ended early (stop()/idle_timeout before any
            # backlog formed)
            self._join_compiles()


class VideoPIV:
    """PIV over a video file's frame stream (the reference's "PIV Video
    File" menu intent, mainWindow.py:79-86 — nonfunctional there, real
    here).  Same generator contract as ``OfflinePIV``: yields
    ``(x, y, u, v)`` per frame pair, batched through the fused engine.
    """

    def __init__(
        self,
        path: str,
        device: str = "auto",
        wind_size: int = 64,
        overlap: int = 32,
        multipass: int = 1,
        multipass_mode: str = "CWS",
        dt: float = 1,
        scale: float = 1.0,
        multipass_scale: float = 2.0,
        folder_mode: str = "sequential",
        *,
        batch_size: int = 4,
        validate: bool = True,
        max_pairs: Optional[int] = None,
        preprocess="none",
        engine_options: Optional[dict] = None,
    ) -> None:
        from .io.video import VideoPairSource

        self._dt = dt
        self._scale = scale
        self._batch = max(1, batch_size)
        self._device_request = device
        self._device = DeviceMap.resolve(device)
        self._source = VideoPairSource(path, folder_mode, max_pairs)
        self._preprocess = resolve_preprocess(preprocess)
        engine_options = dict(engine_options or {})
        frame_mask = engine_options.pop("frame_mask", None)
        mask_threshold = engine_options.pop("mask_threshold", 0.5)
        vkw = dict(
            frame_shape=self._source.frame_shape,
            wind_size=wind_size,
            overlap=overlap,
            multipass=multipass,
            multipass_mode=multipass_mode,
            multipass_scale=multipass_scale,
            validate=validate,
            **engine_options,
        )
        if self._device.platform != "tpu":
            vkw.setdefault("use_pallas", "off")
        from .utils.compile_cache import enable_compile_cache

        enable_compile_cache()
        cfg = PIVConfig(**vkw)
        self._engine = MultipassPIV(
            cfg, frame_mask=resolve_frame_mask(frame_mask),
            mask_threshold=mask_threshold)

        # packed [B, 3, R, C] output via the shared production builder;
        # dispatched through canonical-key AOT executables (the flush
        # loop runs inside a default_device context, which would change
        # a plain jit dispatch's persistent-cache key — see
        # aot_compile_packed), cached per frame dtype
        self._fn = build_packed_scan(self._engine)
        self._exec: dict = {}
        self._exec_lock = threading.Lock()
        self._compile_threads: list = []

    def _exec_future_for(self, dtype):
        """Per-dtype compile future (double-checked locking, as in
        OnlinePIV._exec_future): the lock guards only the dict, a failed
        compile is dropped so the next flush retries, and the worker
        thread is tracked so the generator can join it before exiting
        (killing a mid-remote-compile thread wedges the tunnel's compile
        service — CLAUDE.md)."""
        from concurrent.futures import Future

        dtype = np.dtype(dtype)
        with self._exec_lock:
            fut = self._exec.get(dtype)
            if fut is None:
                fut = Future()
                self._exec[dtype] = fut

                def work():
                    try:
                        ex = aot_compile_packed(
                            self._fn, self._batch,
                            self._engine.config.frame_shape,
                            self._device_request, self._device, dtype=dtype)
                    except BaseException as e:  # noqa: BLE001 - to waiter
                        with self._exec_lock:
                            self._exec.pop(dtype, None)
                        fut.set_exception(e)
                    else:
                        fut.set_result(ex)

                t = threading.Thread(target=work, name="piv-video-compile",
                                     daemon=True)
                self._compile_threads.append(t)
                t.start()
        return fut

    def _exec_for(self, dtype):
        return self._exec_future_for(dtype).result()

    @property
    def engine(self) -> MultipassPIV:
        return self._engine

    def __len__(self) -> int:
        return len(self._source)

    def __call__(self) -> Generator:
        x, y = self._engine.final_coordinates
        tail_validates = (
            self._engine.config.validate
            and self._engine.config.infill == "host"
        )

        def flush(batch):
            if not batch:
                return
            B = len(batch)
            fa = np.stack([a for a, _ in batch])
            fb = np.stack([b for _, b in batch])
            if B < self._batch:  # pad to jit shape, drop the padding after
                pad = self._batch - B
                fa = np.concatenate([fa, np.tile(fa[-1:], (pad, 1, 1))])
                fb = np.concatenate([fb, np.tile(fb[-1:], (pad, 1, 1))])
            arr = np.asarray(self._exec_for(fa.dtype)(
                jnp.asarray(fa), jnp.asarray(fb)))
            u_b, v_b, inval_b = arr[:, 0], arr[:, 1], arr[:, 2] > 0.5
            for i in range(B):
                inval = inval_b[i] if tail_validates else None
                res = finalize_fields(
                    u_b[i], v_b[i], inval, x, y, self._scale, self._dt,
                    self._engine.window_masked[-1])
                if res is not None:
                    yield res

        # executable preparation overlaps the first batch's video decode
        # (frame shape is known from the container header up front) —
        # only when the source has any pairs at all: an unused prewarm
        # wastes a compile and would leave a thread mid-remote-compile
        # behind an immediately-exiting generator
        if len(self._source) > 0:
            self._exec_future_for(np.uint8)  # non-blocking
        try:
            with jax.default_device(self._device):
                batch = []
                for pair in self._source:
                    if self._preprocess is not None:
                        pair = (self._preprocess(pair[0]),
                                self._preprocess(pair[1]))
                    batch.append(pair)
                    if len(batch) == self._batch:
                        yield from flush(batch)
                        batch = []
                yield from flush(batch)
        finally:
            for t in self._compile_threads:
                if t.is_alive():
                    log.info("waiting for an in-flight engine compile to "
                             "finish before closing the video stream...")
                    t.join()
            self._compile_threads.clear()


class _AsyncSaver:
    """Per-pair saves on a writer thread with a bounded queue.

    The reference saves synchronously in its worker loop (workers.py:70-76);
    at this engine's throughput a synchronous text save would BE the
    pipeline bottleneck (~31 ms/pair C-formatted, ~75 ms via np.savetxt),
    so writes overlap with compute and backpressure only when the disk
    genuinely cannot keep up.  Errors surface on the next submit/close.
    """

    def __init__(self, maxsize: int = 8):
        self._q: "queue.Queue" = queue.Queue(maxsize=maxsize)
        self._err: Optional[BaseException] = None
        self._t = threading.Thread(
            target=self._run, name="piv-saver", daemon=True)
        self._t.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            fn, args = item
            try:
                fn(*args)
            except BaseException as e:  # surfaced at next submit/close
                self._err = e

    def _check(self):
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def submit(self, fn, *args) -> None:
        self._check()
        self._q.put((fn, args))

    def close(self) -> None:
        self._q.put(None)
        self._t.join()
        self._check()


class PIVRunner:
    """Headless equivalent of the reference's Qt ``PIVWorker``
    (workers.py:18-124): drives OfflinePIV, reports progress through plain
    callbacks, supports cooperative pause/stop, optional per-pair saving, and
    emits the 13-column statistics table at the end.  GUI layers wrap this in
    a thread; nothing here imports Qt.
    """

    def __init__(
        self,
        params: PIVParams,
        on_progress: Optional[Callable[[int], None]] = None,
        on_output: Optional[Callable[[Dict[str, np.ndarray]], None]] = None,
        on_finished: Optional[Callable[[Dict[str, np.ndarray]], None]] = None,
        on_failed: Optional[Callable[[], None]] = None,
        checkpoint_path: Optional[str] = None,
        checkpoint_every: int = 50,
        smooth: bool | float = False,
        shard: Optional[Tuple[int, int]] = None,
        **offline_kwargs,
    ):
        self.params = params
        self.on_progress = on_progress or (lambda pct: None)
        self.on_output = on_output or (lambda out: None)
        self.on_finished = on_finished or (lambda table: None)
        self.on_failed = on_failed or (lambda: None)
        self.is_paused = False
        self.is_running = True
        self.checkpoint_path = checkpoint_path
        self.checkpoint_every = checkpoint_every
        # robust smoothn post-smoothing of each field (stats/smoothing.py);
        # True = GCV-chosen parameter per pair, a float = fixed parameter
        self.smooth = smooth
        # multi-host campaign sharding: (shard_index, num_shards) makes
        # this runner process only its contiguous pair block and KEEP the
        # final statistics state at checkpoint_path for `tpiv merge-stats`
        # (parallel.distributed — zero-communication DP across hosts)
        self.shard = shard
        self._offline_kwargs = offline_kwargs

    def stop(self) -> None:
        self.is_running = False

    def pause(self, flag: bool = True) -> None:
        self.is_paused = flag

    def run(self) -> Optional[Dict[str, np.ndarray]]:
        import os

        from .utils.checkpoint import load_checkpoint, save_checkpoint

        p = self.params
        acc = EnsembleAccumulator()
        x = y = None
        skip = 0
        if self.checkpoint_path:
            state = load_checkpoint(self.checkpoint_path)
            if state is not None:
                acc, skip, x, y = state
                log.info("resuming from checkpoint: %d pairs done", skip)
        shard_start, shard_count = 0, None
        if self.shard is not None:
            from .io.dataset import PIVDataset
            from .parallel.distributed import pair_block

            si, sn = self.shard
            n_all = len(PIVDataset(p.folder, p.file_fmt, p.folder_mode))
            shard_start, shard_count = pair_block(n_all, si, sn)
            log.info("shard %d/%d: pairs [%d, %d)", si, sn,
                     shard_start, shard_start + shard_count)
        piv_gen = OfflinePIV(
            folder=p.folder,
            device=p.device,
            file_fmt=p.file_fmt,
            wind_size=p.wind_size,
            overlap=p.overlap,
            multipass=p.multipass,
            multipass_mode=p.multipass_mode,
            dt=p.dt,
            scale=p.scale,
            multipass_scale=p.multipass_scale,
            folder_mode=p.folder_mode,
            skip_pairs=shard_start + skip,
            max_pairs=(None if shard_count is None
                       else max(0, shard_count - skip)),
            **self._offline_kwargs,
        )
        total = len(piv_gen) + skip
        if total == 0:
            self.on_failed()
            return None

        name = os.path.basename(os.path.normpath(p.folder))
        start = time.perf_counter()
        done = skip
        saver = (_AsyncSaver()
                 if p.save_opt in ("Save all binary", "Save all text")
                 else None)
        for i, (x, y, u, v) in enumerate(piv_gen()):
            while self.is_paused and self.is_running:
                # 20 ms poll: same responsiveness as the reference's
                # sleep(0) spin (workers.py:55-56) without pinning a core
                time.sleep(0.02)
            if not self.is_running:
                break
            if self.smooth:
                from .stats.smoothing import smooth_vector_field

                s = None if self.smooth is True else float(self.smooth)
                # statically-masked windows (ROI) are zero by contract:
                # exclude them from the fit and keep them at zero, so the
                # smoother cannot bleed wall zeros into the flow (or vice
                # versa).  Yielded fields are row-flipped; flip the mask.
                wm = (piv_gen.engine.window_masked[-1]
                      if piv_gen.engine is not None else None)
                wm = np.flip(wm, axis=0) if wm is not None else None
                u, v = smooth_vector_field(u, v, mask=wm, s=s, robust=True)
                if wm is not None:
                    u[wm] = 0.0
                    v[wm] = 0.0
            acc.add(u, v)
            done += 1
            self.on_progress(int(done / total * 100))
            output = {"x[mm]": x, "y[mm]": y, "Vx[m/s]": u, "Vy[m/s]": v}
            # per-pair saves overlap with compute on the writer thread
            # (yielded arrays are never mutated after this point); the
            # file-sequence order is preserved by the single writer
            if p.save_opt == "Save all binary":
                saver.submit(save_binary, f"{name}_pair.npy", p.save_dir,
                             dict(output))
            elif p.save_opt == "Save all text":
                saver.submit(save_table, f"{name}_pair.txt", p.save_dir,
                             dict(output))
            self.on_output(output)
            if (
                self.checkpoint_path
                and self.checkpoint_every
                and done % self.checkpoint_every == 0
            ):
                save_checkpoint(self.checkpoint_path, acc, done, x, y)

        if saver is not None:
            saver.close()  # drain pending writes; re-raise any save error
        if acc.n == 0:
            self.on_failed()
            return None
        if self.checkpoint_path and self.is_running is False:
            # interrupted: persist progress for resume
            save_checkpoint(self.checkpoint_path, acc, done, x, y)
        log.info("avg PIV time %.0f ms", (time.perf_counter() - start) / acc.n * 1000)
        table = acc.finalize(x, y)
        if p.save_opt != "Dont save":
            save_table(f"{name}_statistics.txt", p.save_dir, dict(table))
        if self.checkpoint_path and self.is_running:
            if self.shard is not None:
                # shard mode: the final state IS the product (merged later
                # by `tpiv merge-stats` / parallel.merge_checkpoints);
                # complete=True distinguishes it from an interrupted
                # shard's resume checkpoint
                save_checkpoint(self.checkpoint_path, acc, done, x, y,
                                complete=True)
            elif os.path.exists(self.checkpoint_path):
                os.remove(self.checkpoint_path)  # completed: clear resume state
        self.on_finished(table)
        return table
