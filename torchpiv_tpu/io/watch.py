"""Streaming ("online") frame-pair sources.

The reference's online mode is an unfinished stub (OnlineWorker crashes at
construction, workers.py:128-150; the watchdog script watchman.py is never
invoked).  What it *intended* — process pairs as a camera writes them — is
implemented here for real: a polling directory watcher with the reference's
``_a``/``_b`` filename pairing rules (workers.py:169-178), usable as an
iterator that blocks until new pairs arrive or a stop event fires.
"""
from __future__ import annotations

import os
import threading
import time
from typing import Iterator, List, Optional, Tuple

from ..utils.persistence import natural_keys


class WatchMan:
    """Polling watcher: diffs the folder listing and pairs new files.

    Pairing mirrors the reference's four alignment cases on the ``_a``/``_b``
    suffix of the first new file and the parity of the count
    (workers.py:169-178).
    """

    def __init__(self, folder: str, file_fmt: str):
        self.folder = folder
        self.file_fmt = file_fmt
        self.filenames = self._listing()
        self.img_pairs: List[Tuple[str, str]] = []

    def _listing(self) -> set:
        return {
            os.path.join(self.folder, name)
            for name in os.listdir(self.folder)
            if name.endswith(self.file_fmt)
        }

    def update(self) -> List[Tuple[str, str]]:
        filenames = self._listing()
        new_files = list(filenames.difference(self.filenames))
        self.filenames = filenames
        self.set_image_pairs(new_files)
        return self.img_pairs

    def set_image_pairs(self, new_files: List[str]) -> None:
        if not new_files:
            self.img_pairs = []
            return
        new_files.sort(key=natural_keys)
        fmt = self.file_fmt
        even = len(new_files) % 2 == 0
        if new_files[0].endswith("_a" + fmt):
            if even:
                self.img_pairs = list(zip(new_files[::2], new_files[1::2]))
            else:
                self.img_pairs = list(zip(new_files[:-1:2], new_files[1:-1:2]))
        elif new_files[0].endswith("_b" + fmt):
            if even:
                self.img_pairs = list(zip(new_files[1:-1:2], new_files[2:-1:2]))
            else:
                self.img_pairs = list(zip(new_files[1::2], new_files[2::2]))
        else:
            self.img_pairs = []


class StreamingPairSource:
    """Blocking iterator of new image-pair paths appearing in a folder.

    Used by ``OnlinePIV``.  Stops when ``stop()`` is called or after
    ``idle_timeout`` seconds without new files (None = wait forever).
    """

    def __init__(
        self,
        folder: str,
        file_fmt: str,
        poll_interval: float = 0.2,
        idle_timeout: Optional[float] = None,
    ):
        self.watchman = WatchMan(folder, file_fmt)
        self.poll_interval = poll_interval
        self.idle_timeout = idle_timeout
        self._stop = threading.Event()

    def stop(self) -> None:
        self._stop.set()

    def __iter__(self) -> Iterator[Tuple[str, str]]:
        last_new = time.monotonic()
        while not self._stop.is_set():
            pairs = self.watchman.update()
            if pairs:
                last_new = time.monotonic()
                yield from pairs
            elif (
                self.idle_timeout is not None
                and time.monotonic() - last_new > self.idle_timeout
            ):
                return
            else:
                self._stop.wait(self.poll_interval)
