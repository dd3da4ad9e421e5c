"""Image-pair dataset over a folder of frames.

Mirrors the reference ``PIVDataset`` (/root/reference/src/torchPIV/
PIVbackend.py:114-144): list files by extension, natural-sort, pair them
``(0,1),(2,3),…`` ("pairs") or ``(0,1),(1,2),…`` ("sequential"), decode to
uint8 grayscale; unreadable pairs yield ``(None, None)`` and are skipped by
the pipeline.
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from ..utils.persistence import natural_keys
from .decode import imread_gray


def compute_background(dataset, n_pairs: int = 20) -> Optional[np.ndarray]:
    """Temporal-minimum background image over the first ``n_pairs`` pairs.

    Standard PIV preprocessing (absent in the reference): stationary glare /
    wall reflections survive a per-pixel minimum while moving particles do
    not; subtracting it before analysis boosts correlation SNR.
    """
    bg = None
    count = 0
    for i in range(min(len(dataset), n_pairs)):
        a, b = dataset[i]
        if a is None:
            continue
        m = np.minimum(a, b)
        bg = m if bg is None else np.minimum(bg, m)
        count += 1
    return bg if count else None


def list_pairs(folder: str, file_fmt: str, folder_mode: str) -> List[Tuple[str, str]]:
    filenames = [
        os.path.join(folder, name)
        for name in os.listdir(folder)
        if name.endswith(file_fmt)
    ]
    filenames.sort(key=natural_keys)
    if folder_mode == "pairs":
        return list(zip(filenames[::2], filenames[1::2]))
    if folder_mode == "sequential":
        return list(zip(filenames[:-1], filenames[1:]))
    return []


class PIVDataset:
    """Indexable dataset of decoded uint8 grayscale frame pairs.

    ``read_batch`` is the bulk path the prefetcher uses: for folders of
    8-bit BMP (the usual camera format) it decodes whole batches on C++
    threads with the GIL released (``native.loader``); anything else falls
    back to the per-file Python decoders.
    """

    def __init__(self, folder: str, file_fmt: str, folder_mode: str = "pairs"):
        self.folder = folder
        self.img_pairs = list_pairs(folder, file_fmt, folder_mode)
        self._native_shape = None
        if self.img_pairs:
            from ..native import loader as native

            self._native_shape = native.probe_gray(self.img_pairs[0][0])

    def __len__(self) -> int:
        return len(self.img_pairs)

    def __getitem__(
        self, index: int
    ) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
        name_a, name_b = self.img_pairs[index]
        frame_b = imread_gray(name_b)
        frame_a = imread_gray(name_a)
        if frame_a is None or frame_b is None:
            return None, None
        return frame_a, frame_b

    def read_batch(self, indices, threads: int = 8):
        """Decode pairs for ``indices`` -> (ids, batch_a, batch_b); failed
        pairs are dropped (reference skip semantics, PIVbackend.py:869-870).
        """
        if self._native_shape is not None:
            from ..native import loader as native

            paths = [p for i in indices for p in self.img_pairs[i]]
            frames, status = native.read_batch_gray(
                paths, self._native_shape, threads
            )
            ok = [
                j
                for j, i in enumerate(indices)
                if status[2 * j] == 0 and status[2 * j + 1] == 0
            ]
            if len(ok) == len(indices):
                return list(indices), frames[0::2], frames[1::2]
            if ok:
                ids = [indices[j] for j in ok]
                a = np.stack([frames[2 * j] for j in ok])
                b = np.stack([frames[2 * j + 1] for j in ok])
                return ids, a, b
            return [], None, None
        pairs = [self[i] for i in indices]
        keep = [
            (i, a, b)
            for i, (a, b) in zip(indices, pairs)
            if a is not None and b is not None
        ]
        if keep:
            # frames of a different camera format than the first pair are
            # treated as unreadable (the engine is shape-specialised)
            shape = keep[0][1].shape
            keep = [t for t in keep if t[1].shape == shape and t[2].shape == shape]
        if not keep:
            return [], None, None
        return (
            [i for i, _, _ in keep],
            np.stack([a for _, a, _ in keep]),
            np.stack([b for _, _, b in keep]),
        )
