"""Threaded decode + host->device prefetch pipeline.

The reference loads pairs synchronously in the hot loop (DataLoader with
``num_workers=0``, PIVbackend.py:863-864) so disk/decode time serialises with
GPU compute.  Here a thread pool decodes ahead while the device crunches the
previous batch, and ``jax.device_put`` is issued early so the transfer
overlaps too (double buffering).  This is the host half of the throughput
story: the 4 MP x 4,000-pair target needs ~0.5 GB/s of sustained ingest.
"""
from __future__ import annotations

import collections
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Sequence, Tuple

import jax
import numpy as np


class PairPrefetcher:
    """Iterate decoded (and optionally device-placed) frame-pair batches.

    Args:
      dataset: indexable of ``(frame_a, frame_b)`` uint8 arrays (or
        ``(None, None)`` for unreadable pairs, which are skipped).
      batch_size: pairs per yielded batch (the last batch may be short).
      device_put: move stacked batches to the default device asynchronously.
      num_threads: decode worker threads.
      depth: how many batches to keep in flight.
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        device_put: bool = True,
        num_threads: int = 4,
        depth: int = 2,
        first_batch_size: int | None = None,
        transfer_log: list | None = None,
        device=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.device_put = device_put
        # Explicit placement target: pool threads do NOT inherit the
        # caller's thread-local ``jax.default_device`` context, so an
        # unqualified device_put here would land every batch on the global
        # default device (e.g. the TPU on a host where the pipeline was
        # asked for device="cpu") and pay a transfer back.  None = global
        # default (single-device hosts).
        self.device = device
        self.num_threads = num_threads
        self.depth = max(1, depth)
        # ramp-up: a smaller FIRST batch so its H2D transfer (which has
        # nothing to overlap with) exposes less, and the first field
        # arrives sooner; None/==batch_size disables
        self.first_batch_size = first_batch_size or batch_size
        # Optional in-run transfer accounting: when a list is supplied,
        # each device_put'ed batch appends ``(t_start, t_end, n_bytes)``
        # (perf_counter seconds, transfer blocked-until-ready).  Shared
        # links (e.g. a network tunnel to the device) drift on minute
        # scales, so any throughput *bound* must be computed from the
        # bandwidth observed DURING the run — bench.py merges these
        # intervals for its achieved-vs-bound check.  Logging blocks the
        # decode worker until the batch is device-resident; concurrent
        # workers keep the link busy, so pipelining is preserved.
        self.transfer_log = transfer_log

    def __iter__(
        self,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, Sequence[int]]]:
        """Yields ``(batch_a, batch_b, pair_indices)`` with arrays shaped
        ``[B, H, W]`` uint8 (B = len(pair_indices))."""
        n = len(self.dataset)
        if n == 0:
            return
        with ThreadPoolExecutor(max_workers=self.num_threads) as pool:
            futures = collections.deque()
            b0 = max(1, min(self.first_batch_size, self.batch_size, n))
            batches = [list(range(0, b0))] + [
                list(range(i, min(i + self.batch_size, n)))
                for i in range(b0, n, self.batch_size)
            ]

            def load_batch(idxs):
                if hasattr(self.dataset, "read_batch"):
                    # honour the configured decode parallelism (the native
                    # decoder's default of 8 C++ threads would otherwise
                    # ignore OfflinePIV(decode_threads=...))
                    ids, a, b = self.dataset.read_batch(
                        idxs, threads=max(1, self.num_threads))
                    if not ids:
                        return None
                else:
                    pairs = [self.dataset[i] for i in idxs]
                    keep = [
                        (i, a, b)
                        for i, (a, b) in zip(idxs, pairs)
                        if a is not None and b is not None
                    ]
                    if not keep:
                        return None
                    ids = [i for i, _, _ in keep]
                    a = np.stack([a for _, a, _ in keep])
                    b = np.stack([b for _, _, b in keep])
                if self.device_put:
                    if self.transfer_log is not None:
                        import time

                        nbytes = a.nbytes + b.nbytes
                        t0 = time.perf_counter()
                        a = jax.device_put(a, self.device)
                        b = jax.device_put(b, self.device)
                        a.block_until_ready()
                        b.block_until_ready()
                        self.transfer_log.append(
                            (t0, time.perf_counter(), nbytes))
                    else:
                        a = jax.device_put(a, self.device)
                        b = jax.device_put(b, self.device)
                return a, b, ids

            it = iter(batches)
            for _ in range(self.depth):
                idxs = next(it, None)
                if idxs is not None:
                    futures.append(pool.submit(load_batch, idxs))
            while futures:
                result = futures.popleft().result()
                idxs = next(it, None)
                if idxs is not None:
                    futures.append(pool.submit(load_batch, idxs))
                if result is not None:
                    yield result
