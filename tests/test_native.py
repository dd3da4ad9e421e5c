"""Native fastio loader: build, probe, batched decode parity, error paths."""
import os

import numpy as np
import pytest

from torchpiv_tpu.io.decode import imread_gray, imwrite_gray
from torchpiv_tpu.native import loader as native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for native fastio"
)


@pytest.fixture(scope="module")
def bmp_files(tmp_path_factory, rng):
    d = tmp_path_factory.mktemp("bmps")
    paths, imgs = [], []
    for i in range(6):
        img = rng.integers(0, 255, (96, 128), dtype=np.uint8)
        p = str(d / f"f{i}.bmp")
        imwrite_gray(p, img)
        paths.append(p)
        imgs.append(img)
    return paths, imgs


def test_probe(bmp_files):
    paths, imgs = bmp_files
    shape = native.probe_bmp8(paths[0])
    assert shape == (96, 128)


def test_batch_decode_matches_python(bmp_files):
    paths, imgs = bmp_files
    frames, status = native.read_batch_bmp8(paths, (96, 128), threads=3)
    assert (status == 0).all()
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(frames[i], imread_gray(p))
        np.testing.assert_array_equal(frames[i], imgs[i])


def test_batch_decode_bad_file(bmp_files, tmp_path):
    paths, _ = bmp_files
    bad = str(tmp_path / "missing.bmp")
    junk = str(tmp_path / "junk.bmp")
    with open(junk, "wb") as f:
        f.write(b"not a bmp at all")
    frames, status = native.read_batch_bmp8(
        [paths[0], bad, junk], (96, 128), threads=2
    )
    assert status[0] == 0
    assert status[1] != 0 and status[2] != 0


def test_dataset_uses_native_batch(bmp_files, tmp_path, rng):
    from torchpiv_tpu.io.dataset import PIVDataset

    d = tmp_path / "pairs"
    d.mkdir()
    imgs = []
    for i in range(4):
        img = rng.integers(0, 255, (64, 80), dtype=np.uint8)
        imwrite_gray(str(d / f"p{i // 2}_{'ab'[i % 2]}.bmp"), img)
        imgs.append(img)
    ds = PIVDataset(str(d), ".bmp", "pairs")
    assert ds._native_shape in ((64, 80), None)
    ids, a, b = ds.read_batch([0, 1])
    assert ids == [0, 1]
    np.testing.assert_array_equal(a[0], imgs[0])
    np.testing.assert_array_equal(b[1], imgs[3])
