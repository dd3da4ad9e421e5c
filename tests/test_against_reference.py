"""Anchor the parity chain to the actual torch reference.

These tests import the real TorchPIV backend from /root/reference (CPU torch)
and compare it against both the golden numpy mirror and the JAX engine.  They
skip cleanly when the reference checkout or its dependencies are absent, so
the suite stays self-contained; when present they prove that golden (the
ground truth all engine tests use) matches the reference bit-for-bit-ish.
"""
import sys
import types

import numpy as np
import pytest

import golden
from torchpiv_tpu.utils.synthetic import particle_pair

# The torch reference's DataLoader always requests pin_memory; on this
# CPU-only torch build that emits a UserWarning — the reference's noise,
# not ours.
pytestmark = pytest.mark.filterwarnings(
    "ignore:'pin_memory' argument is set as true:UserWarning")


@pytest.fixture(scope="module")
def ref():
    """Import the reference PIVbackend without running its GUI package init.

    A synthetic ``torchPIV`` package (with only ``__path__``) lets the import
    machinery resolve the submodules directly, and PyQt5 is stubbed with just
    the QMessageBox PlotterFunctions references.
    """
    import importlib
    import os

    pkg_dir = "/root/reference/src/torchPIV"
    if not os.path.isdir(pkg_dir):
        pytest.skip("reference checkout unavailable")
    try:
        import torch  # noqa: F401
        import cv2  # noqa: F401
    except Exception:
        pytest.skip("torch/cv2 unavailable")
    if "PyQt5" not in sys.modules:
        qt = types.ModuleType("PyQt5")
        widgets = types.ModuleType("PyQt5.QtWidgets")
        widgets.QMessageBox = type("QMessageBox", (), {})
        qt.QtWidgets = widgets
        qt.__path__ = []
        sys.modules["PyQt5"] = qt
        sys.modules["PyQt5.QtWidgets"] = widgets
    if "torchPIV" not in sys.modules:
        pkg = types.ModuleType("torchPIV")
        pkg.__path__ = [pkg_dir]
        sys.modules["torchPIV"] = pkg
    try:
        return importlib.import_module("torchPIV.PIVbackend")
    except Exception as e:  # reference stripped or deps missing
        pytest.skip(f"reference unavailable: {e}")


@pytest.fixture(scope="module")
def frames():
    fa, fb = particle_pair((256, 256), displacement=(3.3, -2.1), seed=7)
    return fa, fb


def test_window_extraction_matches_reference(ref, frames):
    import torch

    fa, _ = frames
    theirs = ref.moving_window_array(torch.tensor(fa), 64, 32).numpy()
    ours = golden.moving_window_array(fa, 64, 32)
    np.testing.assert_array_equal(ours, theirs)


def test_correlation_matches_reference(ref, frames, rng):
    import torch

    a = rng.normal(1, 0.2, (9, 32, 32)).astype(np.float32)
    b = rng.normal(1, 0.2, (9, 32, 32)).astype(np.float32)
    theirs = ref.correalte_fft(torch.tensor(a), torch.tensor(b)).numpy()
    ours = golden.correlate_fft(a.astype(np.float64), b.astype(np.float64))
    scale = np.abs(theirs).max()
    np.testing.assert_allclose(ours / scale, theirs / scale, atol=1e-5)


def test_peakfit_matches_reference(ref, rng):
    import torch

    maps = (rng.random((40, 32, 32)).astype(np.float32)) ** 2
    maps = maps - maps.min(axis=(-2, -1), keepdims=True)
    tu, tv, tval = ref.correlation_to_displacement(
        torch.tensor(maps.copy()), 8, 5, validate=True
    )
    gu, gv, gval = golden.correlation_to_displacement(
        maps.astype(np.float64), 8, 5, validate=True
    )
    np.testing.assert_allclose(gu, tu, atol=1e-4)
    np.testing.assert_allclose(gv, tv, atol=1e-4)
    np.testing.assert_array_equal(gval, tval)


def test_cws_bilinear_matches_reference(ref, frames, rng):
    import torch

    fa, _ = frames
    grid = golden._flat_window_grid((256, 256), 32, 16, )
    n = grid.shape[0]
    vx = rng.uniform(-5, 5, n).astype(np.float32)[:, None, None]
    vy = rng.uniform(-5, 5, n).astype(np.float32)[:, None, None]
    theirs = ref.biliniar_interpolation_CWS(
        torch.tensor(fa), torch.tensor(grid), torch.tensor(vx), torch.tensor(vy)
    ).numpy()
    ours = golden.bilinear_cws(fa, grid, vx, vy)
    np.testing.assert_allclose(ours, theirs, atol=1e-3)


def test_first_pass_matches_reference(ref, frames):
    import torch

    fa, fb = frames
    tu, tv, tx, ty, tval = ref.extended_search_area_piv(
        torch.tensor(fa, dtype=torch.uint8),
        torch.tensor(fb, dtype=torch.uint8),
        window_size=64, overlap=32, validate=True,
    )
    gu, gv, gx, gy, gval = golden.first_pass(fa, fb, 64, 32, True)
    np.testing.assert_array_equal(gx, tx)
    np.testing.assert_array_equal(gy, ty)
    np.testing.assert_allclose(gu, tu, atol=1e-6)
    np.testing.assert_allclose(gv, tv, atol=1e-6)
    np.testing.assert_array_equal(gval, tval)


def test_cws_iteration_matches_reference(ref, frames):
    import torch

    fa, fb = frames
    tu, tv, tx, ty, tval = ref.extended_search_area_piv(
        torch.tensor(fa, dtype=torch.uint8),
        torch.tensor(fb, dtype=torch.uint8),
        window_size=64, overlap=32, validate=True,
    )
    it = ref.piv_iteration_CWS((256, 256), 32, 16, torch.device("cpu"))
    ru, rv, rx, ry, rval = it(
        torch.tensor(fa, dtype=torch.uint8),
        torch.tensor(fb, dtype=torch.uint8),
        tx, ty, tu.copy(), tv.copy(), tval.copy(),
    )
    gu, gv, gx, gy, gval = golden.cws_iteration(
        fa, fb, tx, ty, tu.copy(), tv.copy(), tval.copy(), 32, 16
    )
    both = ~(gval | rval)
    assert (gval == rval).mean() > 0.98
    d = np.abs(gu - ru)[both]
    assert np.sqrt(np.mean(d**2)) < 1e-3
    d = np.abs(gv - rv)[both]
    assert np.sqrt(np.mean(d**2)) < 1e-3


def test_dws_iteration_matches_reference(ref, frames):
    import torch

    fa, fb = frames
    tu, tv, tx, ty, tval = ref.extended_search_area_piv(
        torch.tensor(fa, dtype=torch.uint8),
        torch.tensor(fb, dtype=torch.uint8),
        window_size=64, overlap=32, validate=True,
    )
    it = ref.piv_iteration_DWS((256, 256), 32, 16, torch.device("cpu"))
    ru, rv, rx, ry, rval = it(
        torch.tensor(fa, dtype=torch.uint8),
        torch.tensor(fb, dtype=torch.uint8),
        tx, ty, tu.copy(), tv.copy(), tval.copy(),
    )
    gu, gv, gx, gy, gval = golden.dws_iteration(
        fa, fb, tx, ty, tu.copy(), tv.copy(), tval.copy(), 32, 16
    )
    both = ~(gval | rval)
    assert (gval == rval).mean() > 0.98
    d = np.abs(gu - ru)[both]
    assert np.sqrt(np.mean(d**2)) < 1e-3


def _write_pair_with_holes(path, i):
    """A pair with a particle-free strip: a few windows fail the peak-ratio
    validation, so the infill path actually runs in both pipelines."""
    fa, fb = particle_pair((256, 256), displacement=(3.3, -2.1), seed=20 + i)
    fa = fa.copy()
    fb = fb.copy()
    fa[:72, :72] = 8
    fb[:72, :72] = 8
    from torchpiv_tpu.io.decode import imwrite_gray

    imwrite_gray(str(path / f"p{i}_a.bmp"), fa)
    imwrite_gray(str(path / f"p{i}_b.bmp"), fb)


def test_offline_pipeline_matches_reference(ref, tmp_path):
    """END-TO-END anchor: our OfflinePIV vs the reference's OfflinePIV
    generator on the same on-disk BMP folder — the full contract including
    validation NaN + border/Delaunay infill, the y-flip, and physical
    units (PIVbackend.py:824-903).  Pairs contain a particle-free strip so
    some vectors are invalid (see the companion test for why fully-valid
    pairs cannot be compared)."""
    import torch  # noqa: F401  (fixture guarantees availability)

    from torchpiv_tpu.pipeline import OfflinePIV

    for i in range(2):
        _write_pair_with_holes(tmp_path, i)

    kw = dict(file_fmt=".bmp", wind_size=64, overlap=32, multipass=2,
              multipass_mode="CWS", dt=2.0, scale=0.05,
              folder_mode="pairs")
    ref_piv = ref.OfflinePIV(str(tmp_path), device="cpu", **kw)
    ours = OfflinePIV(str(tmp_path), device="cpu", **kw)

    ref_out = list(ref_piv())
    our_out = list(ours())
    assert len(ref_out) == len(our_out) == 2
    for (rx, ry, ru, rv), (ox, oy, ou, ov) in zip(ref_out, our_out):
        np.testing.assert_allclose(ox, np.asarray(rx), atol=1e-6)
        np.testing.assert_allclose(oy, np.asarray(ry), atol=1e-6)
        for got, want in ((ou, ru), (ov, rv)):
            got = np.asarray(got, dtype=np.float64)
            want = np.asarray(want, dtype=np.float64)
            assert np.isnan(got).sum() == np.isnan(want).sum() == 0
            # units are px * scale/dt * 1000 = px * 25: 0.01 px ~ 0.25.
            # The handful of vectors covering the particle-free strip are
            # INFILLED, and the degenerate windows there sit on the peak-
            # ratio threshold: an f32-vs-f64 validation flip changes which
            # vectors feed the Delaunay fill, so those few may differ by
            # whole pixels in BOTH directions legitimately.  Measured
            # vectors must agree tightly; the infill region is bounded.
            d = np.abs(got - want)
            assert np.quantile(d, 0.9) < 0.25, "measured-vector parity"
            assert (d > 0.25).mean() < 0.08, f"{(d > 0.25).mean():.1%} differ"


def test_reference_drops_fully_valid_pairs_we_dont(ref, tmp_path):
    """Documented divergence: the reference SKIPS pairs whose field is
    fully valid — with zero NaNs, ``getPixelsForInterp`` marks no border
    pixels, ``points`` is empty, ``LinearNDInterpolator([], [])`` raises,
    and the bare ``except: return None`` (PIVbackend.py:299-303) makes the
    generator ``continue`` past the pair (:889-891).  Our pipeline
    short-circuits the infill when there is nothing to fill and yields the
    pair — the skip branch exists for the >50%-invalid case only."""
    import torch  # noqa: F401

    from torchpiv_tpu.io.decode import imwrite_gray
    from torchpiv_tpu.pipeline import OfflinePIV

    fa, fb = particle_pair((256, 256), displacement=(3.3, -2.1), seed=20)
    imwrite_gray(str(tmp_path / "q0_a.bmp"), fa)
    imwrite_gray(str(tmp_path / "q0_b.bmp"), fb)
    kw = dict(file_fmt=".bmp", wind_size=64, overlap=32, multipass=2,
              multipass_mode="CWS", folder_mode="pairs")
    assert len(list(ref.OfflinePIV(str(tmp_path), device="cpu", **kw)())) == 0
    out = list(OfflinePIV(str(tmp_path), device="cpu", **kw)())
    assert len(out) == 1 and np.isfinite(out[0][2]).all()


def test_offline_pipeline_dws_sequential_matches_reference(ref, tmp_path):
    """END-TO-END anchor #2: DWS multipass mode + sequential folder mode
    ((0,1),(1,2),... pairing) — the other half of the reference's
    OfflinePIV configuration space (PIVbackend.py:824-837), previously
    covered only at the per-iteration unit level."""
    import torch  # noqa: F401  (fixture guarantees availability)

    from torchpiv_tpu.io.decode import imwrite_gray
    from torchpiv_tpu.pipeline import OfflinePIV

    # three frames of one ADVECTING particle field -> two genuine
    # sequential pairs; a dead strip so validation/infill runs in both
    from torchpiv_tpu.utils.synthetic import render_particles

    H = W = 256
    rng = np.random.default_rng(41)
    n = int(0.02 * H * W)
    xs = rng.uniform(-16, W + 16, n)
    ys = rng.uniform(-16, H + 16, n)
    inten = rng.uniform(100, 220, n)
    for i in range(3):
        f = render_particles((H, W), xs + 3.3 * i, ys - 2.1 * i, inten, 2.5)
        f = np.clip(f + 8 + rng.normal(0, 2.0, f.shape), 0, 255
                    ).astype(np.uint8)
        f[:72, :72] = 8
        imwrite_gray(str(tmp_path / f"s{i}.bmp"), f)

    kw = dict(file_fmt=".bmp", wind_size=64, overlap=32, multipass=2,
              multipass_mode="DWS", dt=1.0, scale=1.0,
              folder_mode="sequential")
    ref_out = list(ref.OfflinePIV(str(tmp_path), device="cpu", **kw)())
    our_out = list(OfflinePIV(str(tmp_path), device="cpu", **kw)())
    assert len(ref_out) == len(our_out) == 2
    for (rx, ry, ru, rv), (ox, oy, ou, ov) in zip(ref_out, our_out):
        np.testing.assert_allclose(ox, np.asarray(rx), atol=1e-6)
        np.testing.assert_allclose(oy, np.asarray(ry), atol=1e-6)
        for got, want in ((ou, ru), (ov, rv)):
            got = np.asarray(got, dtype=np.float64)
            want = np.asarray(want, dtype=np.float64)
            assert np.isnan(got).sum() == np.isnan(want).sum() == 0
            # same tolerance structure as the CWS end-to-end anchor: the
            # dead-strip windows sit on the validation threshold and are
            # infilled (legitimately different); measured vectors tight
            d = np.abs(got - want)
            assert np.quantile(d, 0.9) < 0.01, "measured-vector parity"
            assert (d > 0.01).mean() < 0.08, f"{(d > 0.01).mean():.1%}"
