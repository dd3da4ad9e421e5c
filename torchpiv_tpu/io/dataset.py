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
    """Indexable dataset of decoded uint8 grayscale frame pairs."""

    def __init__(self, folder: str, file_fmt: str, folder_mode: str = "pairs"):
        self.folder = folder
        self.img_pairs = list_pairs(folder, file_fmt, folder_mode)

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
