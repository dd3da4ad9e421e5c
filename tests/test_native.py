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


 
def test_native_tiff_8_and_16bit(tmp_path):
    """Uncompressed grayscale TIFF decode: 8-bit exact; 16-bit scaled to
    8 via the high byte (cv2.IMREAD_GRAYSCALE behaviour)."""
    from PIL import Image

    rng = np.random.default_rng(5)
    img8 = rng.integers(0, 255, (48, 64), dtype=np.uint8)
    p8 = str(tmp_path / "t8.tif")
    Image.fromarray(img8, mode="L").save(p8)

    img16 = rng.integers(0, 65535, (48, 64), dtype=np.uint16)
    p16 = str(tmp_path / "t16.tif")
    Image.fromarray(img16).save(p16)  # uint16 -> I;16 (mode= kwarg is deprecated)

    assert native.probe_gray(p8) == (48, 64)
    assert native.probe_gray(p16) == (48, 64)
    frames, status = native.read_batch_gray([p8, p16], (48, 64), threads=2)
    assert (status == 0).all(), status
    np.testing.assert_array_equal(frames[0], img8)
    np.testing.assert_array_equal(frames[1], (img16 >> 8).astype(np.uint8))


 
def test_native_tiff_big_endian_and_strips(tmp_path):
    """Hand-rolled big-endian multi-strip TIFF exercises the endian and
    strip-walk paths."""
    import struct

    H, W = 6, 8
    rng = np.random.default_rng(6)
    img = rng.integers(0, 65535, (H, W), dtype=np.uint16)
    rows_per_strip = 2
    n_strips = H // rows_per_strip
    strip_bytes = rows_per_strip * W * 2

    def be(fmt, *v):
        return struct.pack(">" + fmt, *v)

    # layout: header(8) + pixel strips + IFD
    strips_off = 8
    ifd_off = strips_off + H * W * 2
    entries = []

    def entry(tag, typ, count, value):
        entries.append(be("HHI", tag, typ, count) + value)

    def short_val(v):
        return be("H", v) + b"\x00\x00"

    strip_offs = [strips_off + i * strip_bytes for i in range(n_strips)]
    # offsets/counts arrays live after the IFD
    n_entries = 9
    after_ifd = ifd_off + 2 + n_entries * 12 + 4
    entry(256, 3, 1, short_val(W))
    entry(257, 3, 1, short_val(H))
    entry(258, 3, 1, short_val(16))
    entry(259, 3, 1, short_val(1))
    entry(262, 3, 1, short_val(1))
    entry(273, 4, n_strips, be("I", after_ifd))
    entry(277, 3, 1, short_val(1))
    entry(278, 3, 1, short_val(rows_per_strip))
    entry(279, 4, n_strips, be("I", after_ifd + 4 * n_strips))
    assert len(entries) == n_entries

    buf = b"MM\x00\x2a" + be("I", ifd_off)
    buf += img.astype(">u2").tobytes()
    buf += be("H", n_entries) + b"".join(entries) + be("I", 0)
    buf += b"".join(be("I", o) for o in strip_offs)
    buf += b"".join(be("I", strip_bytes) for _ in range(n_strips))

    p = str(tmp_path / "be.tif")
    with open(p, "wb") as f:
        f.write(buf)
    assert native.probe_gray(p) == (H, W)
    frames, status = native.read_batch_gray([p], (H, W))
    assert status[0] == 0, status
    np.testing.assert_array_equal(frames[0], (img >> 8).astype(np.uint8))


def test_native_corrupt_files_rejected(tmp_path):
    """Malformed headers must fail with a status code, never crash or
    over-read (the palette/strip bounds checks)."""
    from PIL import Image

    ok = rng_img = np.full((16, 24), 7, np.uint8)
    good = str(tmp_path / "good.bmp")
    imwrite_gray(good, ok)
    dims = native.probe_gray(good)
    assert dims == (16, 24)

    bad_files = []
    # truncated BMP: header promises more row data than the file has
    data = open(good, "rb").read()
    p = str(tmp_path / "trunc.bmp")
    open(p, "wb").write(data[: len(data) // 2])
    bad_files.append(p)
    # BMP with absurd DIB size -> palette would read out of bounds
    hacked = bytearray(data)
    hacked[14:18] = (2**31 - 1).to_bytes(4, "little")
    p = str(tmp_path / "dib.bmp")
    open(p, "wb").write(bytes(hacked))
    bad_files.append(p)
    # BMP with data_offset beyond the file
    hacked = bytearray(data)
    hacked[10:14] = (2**30).to_bytes(4, "little")
    p = str(tmp_path / "off.bmp")
    open(p, "wb").write(bytes(hacked))
    bad_files.append(p)
    # TIFF with strip offsets beyond the file
    t = str(tmp_path / "t.tif")
    Image.fromarray(rng_img, mode="L").save(t)
    tdata = bytearray(open(t, "rb").read())
    # clobber the second half (strip data) off
    p = str(tmp_path / "trunc.tif")
    open(p, "wb").write(bytes(tdata[: len(tdata) // 3]))
    bad_files.append(p)
    # garbage file
    p = str(tmp_path / "junk.bmp")
    open(p, "wb").write(b"\x42\x4d" + b"\x01" * 40)
    bad_files.append(p)

    frames, status = native.read_batch_gray([good] + bad_files, (16, 24))
    assert status[0] == 0
    assert (status[1:] != 0).all(), status
    np.testing.assert_array_equal(frames[0], ok)


@pytest.mark.filterwarnings(
    # imageio's undecodable-bytes path probes its vendored tifffile, which
    # self-deprecates on import — third-party noise, not our warning.
    "ignore:ImageIO's vendored tifffile backend is deprecated:DeprecationWarning")
def test_python_decoder_corrupt_bmp_fallback(tmp_path):
    """decode_bmp_gray8 returns None on malformed input (falls back), and
    imread_gray returns None for undecodable bytes."""
    from torchpiv_tpu.io.decode import decode_bmp_gray8, imread_gray

    assert decode_bmp_gray8(np.frombuffer(b"BM" + b"\x00" * 20,
                                          dtype=np.uint8)) is None
    p = str(tmp_path / "junk.bmp")
    open(p, "wb").write(b"not an image at all")
    assert imread_gray(p) is None


def test_native_write_table_byte_identical_to_savetxt(tmp_path):
    """The C table formatter must be byte-identical to
    np.savetxt(fmt='%.6f') — including negative zero, infinities, NaN,
    and round-to-even ties — so save_table output is writer-independent."""
    from torchpiv_tpu.native import loader as fastio

    if not fastio.available():
        pytest.skip("native fastio unavailable")
    rng = np.random.default_rng(0)
    arr = np.concatenate([
        rng.normal(0, 100, (2000, 4)),
        rng.normal(0, 1e-6, (100, 4)),
        np.array([[0.0, -0.0, 1e-7, -1e-7],
                  [np.inf, -np.inf, np.nan, 123456789.123456789],
                  [0.0000005, -0.0000005, 2.5e-7, 1.5]]),
    ])
    hdr = "x[mm], y[mm], Vx[m/s], Vy[m/s]"
    p1, p2 = str(tmp_path / "native.txt"), str(tmp_path / "numpy.txt")
    fastio.write_table(p1, hdr, arr)
    np.savetxt(p2, arr, delimiter=", ", header=hdr, comments="", fmt="%.6f")
    with open(p1, "rb") as f1, open(p2, "rb") as f2:
        assert f1.read() == f2.read()
    with pytest.raises(OSError):
        fastio.write_table(str(tmp_path / "no_dir" / "x.txt"), hdr, arr)
    with pytest.raises(ValueError):
        fastio.write_table(p1, hdr, arr.ravel())


def test_native_pgm_8_and_16bit(tmp_path):
    """Netpbm P5 decode: 8-bit exact (incl. '#' comment lines in the
    header); 16-bit big-endian scaled to 8 via the high byte."""
    rng = np.random.default_rng(6)
    img8 = rng.integers(0, 255, (32, 48), dtype=np.uint8)
    p8 = str(tmp_path / "g8.pgm")
    with open(p8, "wb") as f:
        f.write(b"P5\n# a comment line\n48 32\n# another\n255\n")
        f.write(img8.tobytes())

    img16 = rng.integers(0, 65535, (32, 48), dtype=np.uint16)
    p16 = str(tmp_path / "g16.pgm")
    with open(p16, "wb") as f:
        f.write(b"P5 48 32 65535\n")
        f.write(img16.byteswap().tobytes())  # PGM 16-bit is big-endian

    assert native.probe_gray(p8) == (32, 48)
    assert native.probe_gray(p16) == (32, 48)
    frames, status = native.read_batch_gray([p8, p16], (32, 48), threads=2)
    assert (status == 0).all(), status
    np.testing.assert_array_equal(frames[0], img8)
    np.testing.assert_array_equal(frames[1], (img16 >> 8).astype(np.uint8))

    # truncated data / wrong dims rejected, not crashed
    bad = str(tmp_path / "trunc.pgm")
    with open(bad, "wb") as f:
        f.write(b"P5\n48 32\n255\n")
        f.write(img8.tobytes()[:100])
    _, status = native.read_batch_gray([bad], (32, 48))
    assert status[0] != 0
    _, status = native.read_batch_gray([p8], (32, 47))
    assert status[0] != 0

    # cross-check against cv2's reading of the same file when available
    try:
        import cv2
    except Exception:
        return
    ref = cv2.imread(p8, cv2.IMREAD_GRAYSCALE)
    np.testing.assert_array_equal(frames[0], ref)


def test_native_decoder_mutation_fuzz(tmp_path):
    """Seeded mutation fuzz over all three container formats: random
    byte flips / truncations / extensions of valid files must decode
    (status 0, when the mutation missed anything load-bearing) or fail
    with a status code — never crash the process or over-read."""
    from PIL import Image

    rng = np.random.default_rng(1234)
    img = rng.integers(0, 255, (24, 40), dtype=np.uint8)

    seeds = []
    p = str(tmp_path / "s.bmp")
    imwrite_gray(p, img)
    seeds.append(open(p, "rb").read())
    p = str(tmp_path / "s.tif")
    Image.fromarray(img, mode="L").save(p)
    seeds.append(open(p, "rb").read())
    seeds.append(b"P5\n40 24\n255\n" + img.tobytes())

    paths = []
    for i in range(240):
        data = bytearray(seeds[i % 3])
        kind = i % 4
        if kind == 0:  # flip 1-8 random bytes anywhere (headers included)
            for j in rng.integers(0, len(data), rng.integers(1, 9)):
                data[j] = rng.integers(0, 256)
        elif kind == 1:  # truncate at a random point
            data = data[: rng.integers(0, len(data))]
        elif kind == 2:  # extend with junk
            data += bytes(rng.integers(0, 256, rng.integers(1, 64), "u1"))
        else:  # splice a random window with junk
            a = int(rng.integers(0, len(data)))
            b = min(len(data), a + int(rng.integers(1, 32)))
            data[a:b] = bytes(rng.integers(0, 256, b - a, "u1"))
        ext = [".bmp", ".tif", ".pgm"][i % 3]
        p = str(tmp_path / f"m{i}{ext}")
        open(p, "wb").write(bytes(data))
        paths.append(p)

    # batch decode in one call (exercises the threaded C++ path);
    # surviving the call IS the assertion — plus frames stay in-bounds
    frames, status = native.read_batch_gray(paths, (24, 40), threads=4)
    assert len(status) == len(paths)
    for j, rc in enumerate(status):
        if rc == 0:
            assert frames[j].shape == (24, 40)
    # the probe path must also survive every mutant
    for p in paths:
        native.probe_gray(p)
