"""Integration tests: the OfflinePIV API contract and the runner, end-to-end
over image files on disk, vs the golden full pipeline."""
import os

import numpy as np
import pytest

import golden
from torchpiv_tpu.io.decode import imread_gray, imwrite_gray
from torchpiv_tpu.pipeline import OfflinePIV, PIVRunner
from torchpiv_tpu.utils.config import PIVParams
from torchpiv_tpu.utils.synthetic import particle_pair


@pytest.fixture(scope="module")
def pair_folder(tmp_path_factory):
    folder = tmp_path_factory.mktemp("pairs")
    shifts = [(3.3, -2.1), (1.0, 0.5), (-2.0, 1.5)]
    for i, disp in enumerate(shifts):
        fa, fb = particle_pair((256, 256), displacement=disp, seed=10 + i)
        imwrite_gray(str(folder / f"img{i:04d}_a.bmp"), fa)
        imwrite_gray(str(folder / f"img{i:04d}_b.bmp"), fb)
    return str(folder), shifts


def test_offline_piv_matches_golden_pipeline(pair_folder):
    folder, shifts = pair_folder
    kwargs = dict(wind_size=64, overlap=32, multipass=2, multipass_mode="CWS",
                  dt=2.0, scale=0.05)
    piv = OfflinePIV(folder, device="cpu", file_fmt=".bmp",
                     folder_mode="pairs", batch_size=2, **kwargs)
    assert len(piv) == len(shifts)
    results = list(piv())
    assert len(results) == len(shifts)

    from torchpiv_tpu.io.dataset import PIVDataset

    ds = PIVDataset(folder, ".bmp", "pairs")
    for i, (x, y, u, v) in enumerate(results):
        fa, fb = ds[i]
        ref = golden.offline_piv_pair(
            fa, fb, 64, 32, multipass=2, multipass_mode="CWS",
            dt=2.0, scale=0.05,
        )
        assert ref is not None
        gx, gy, gu, gv = ref
        np.testing.assert_array_equal(x, gx)
        np.testing.assert_array_equal(y, gy)
        # parity on the final physical fields (vast majority of vectors;
        # infilled outliers depend on f32-vs-f64 validation flips)
        du = np.abs(u - gu)
        dv = np.abs(v - gv)
        assert np.median(du) < 0.01 * 0.05 / 2.0 * 1000
        assert np.quantile(du, 0.9) < 0.05 * 0.05 / 2.0 * 1000
        assert np.quantile(dv, 0.9) < 0.05 * 0.05 / 2.0 * 1000


def test_offline_piv_physical_units(pair_folder):
    folder, shifts = pair_folder
    scale, dt = 0.1, 4.0  # mm/px, us
    piv = OfflinePIV(folder, device="cpu", file_fmt=".bmp", wind_size=64,
                     overlap=32, scale=scale, dt=dt, batch_size=3)
    x, y, u, v = next(piv())
    # first pair: u=3.3 px -> u_mm_per_us*1000 = 3.3*scale/dt*1000 m/s
    expected = 3.3 * scale / dt * 1000
    interior = np.abs(np.median(u))
    assert abs(interior - expected) / expected < 0.05
    # y-flip: v = -flip(v) => positive v_px (down in image) becomes negative
    expected_v = -(-2.1) * scale / dt * 1000
    assert abs(np.median(v) - expected_v) / abs(expected_v) < 0.1


def test_offline_piv_transfer_log(pair_folder):
    """In-run H2D accounting: with ``transfer_log`` set, every device-put
    batch records a (t0, t1, nbytes) interval — bench.py's drift-proof
    achieved-vs-bound check depends on this plumbing."""
    folder, shifts = pair_folder
    piv = OfflinePIV(folder, device="cpu", file_fmt=".bmp", wind_size=64,
                     overlap=32, batch_size=2)
    piv.transfer_log = tlog = []
    results = list(piv())
    assert len(results) == len(shifts)
    assert len(tlog) == 2  # 3 pairs at batch 2 -> batches of 2 and 1
    for t0, t1, nbytes in tlog:
        assert t1 >= t0
    # each frame is 256x256 uint8, two frames per pair
    assert sum(nb for _, _, nb in tlog) == len(shifts) * 2 * 256 * 256


def test_bench_merge_intervals():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from bench import _merge_intervals

    assert _merge_intervals([]) == []
    assert _merge_intervals([(0, 2), (1, 3), (5, 6)]) == [(0, 3), (5, 6)]
    # containment and exact-touch both merge
    assert _merge_intervals([(0, 10), (2, 3), (10, 12)]) == [(0, 12)]


def test_sequential_folder_mode(pair_folder):
    folder, _ = pair_folder
    piv = OfflinePIV(folder, device="cpu", file_fmt=".bmp", wind_size=64,
                     overlap=32, folder_mode="sequential")
    assert len(piv) == 5  # 6 files -> 5 consecutive pairs


def test_empty_folder(tmp_path):
    piv = OfflinePIV(str(tmp_path), device="cpu", file_fmt=".bmp",
                     wind_size=32, overlap=16)
    assert len(piv) == 0
    assert list(piv()) == []


def test_runner_statistics_and_saving(pair_folder, tmp_path):
    folder, _ = pair_folder
    params = PIVParams(
        wind_size=64, overlap=32, multipass=1, multipass_mode="CWS",
        scale=0.05, dt=2.0, device="cpu", file_fmt=".bmp", folder=folder,
        folder_mode="pairs", save_opt="Save statistics",
        save_dir=str(tmp_path),
    )
    progress, outputs = [], []
    runner = PIVRunner(
        params,
        on_progress=progress.append,
        on_output=outputs.append,
        batch_size=2,
    )
    table = runner.run()
    assert table is not None
    assert len(outputs) == 3
    assert progress[-1] == 100
    expected_cols = [
        "x[mm]", "y[mm]", "Vx[m/s]", "Vy[m/s]",
        "(vx-Vx)(vy-Vy)[m^2/s^2]", "(vx-Vx)^2[m^2/s^2]", "(vy-Vy)^2[m^2/s^2]",
        "dVx/dx[1/s]", "dVx/dy[1/s]", "dVy/dx[1/s]", "dVy/dy[1/s]",
        "W[1/s]", "S[1/s]",
    ]
    assert list(table.keys()) == expected_cols
    saved = [f for f in os.listdir(tmp_path) if f.endswith("_statistics.txt")]
    assert len(saved) == 1
    # saved table loads back with the same grid
    from torchpiv_tpu.utils.persistence import load_table

    loaded = load_table(os.path.join(tmp_path, saved[0]))
    assert loaded["Vx[m/s]"].shape == table["Vx[m/s]"].shape
    np.testing.assert_allclose(
        loaded["Vx[m/s]"], table["Vx[m/s]"], atol=1e-5
    )


def test_runner_empty_folder_fails(tmp_path):
    params = PIVParams(folder=str(tmp_path), device="cpu", file_fmt=".bmp",
                       wind_size=32, overlap=16)
    failed = []
    runner = PIVRunner(params, on_failed=lambda: failed.append(True))
    assert runner.run() is None
    assert failed == [True]


def test_bmp_roundtrip(tmp_path, rng):
    img = rng.integers(0, 255, (120, 160), dtype=np.uint8)
    p = str(tmp_path / "t.bmp")
    imwrite_gray(p, img)
    back = imread_gray(p)
    np.testing.assert_array_equal(img, back)
    # the fast numpy BMP path handles it (cv2-independent)
    from torchpiv_tpu.io.decode import decode_bmp_gray8

    decoded = decode_bmp_gray8(np.fromfile(p, dtype=np.uint8))
    if decoded is not None:  # cv2 may write a non-paletted BMP
        np.testing.assert_array_equal(img, decoded)


def test_infill_path_with_dead_region(tmp_path):
    """A particle-free patch produces invalid windows; the tail must infill
    them (not skip the pair) and match golden's Delaunay infill."""
    fa, fb = particle_pair((256, 256), displacement=(2.0, 1.0), seed=21)
    fa[96:160, 96:160] = 8
    fb[96:160, 96:160] = 8
    imwrite_gray(str(tmp_path / "d0_a.bmp"), fa)
    imwrite_gray(str(tmp_path / "d0_b.bmp"), fb)
    piv = OfflinePIV(str(tmp_path), device="cpu", file_fmt=".bmp",
                     wind_size=32, overlap=16, multipass=1)
    results = list(piv())
    assert len(results) == 1
    x, y, u, v = results[0]
    assert np.isfinite(u).all() and np.isfinite(v).all()
    ref = golden.offline_piv_pair(fa, fb, 32, 16, multipass=1)
    assert ref is not None
    _, _, gu, gv = ref
    # infilled vectors depend on which windows each impl flags; compare the
    # bulk of the field
    assert np.quantile(np.abs(u - gu), 0.9) < 0.1


def test_runner_checkpoint_resume(pair_folder, tmp_path):
    """Stop after the first pair, resume from the checkpoint, and get the
    same statistics as an uninterrupted run."""
    folder, _ = pair_folder
    ckpt = str(tmp_path / "run.ckpt.npz")
    params = PIVParams(wind_size=64, overlap=32, multipass=1, scale=0.05,
                       dt=2.0, device="cpu", file_fmt=".bmp", folder=folder,
                       folder_mode="pairs", save_opt="Dont save")

    # full run for reference statistics
    full = PIVRunner(params, batch_size=1).run()

    # interrupted run: stop after the first pair
    stopper = {}

    def on_output(out):
        stopper["runner"].stop()

    r1 = PIVRunner(params, on_output=on_output, checkpoint_path=ckpt,
                   checkpoint_every=1, batch_size=1)
    stopper["runner"] = r1
    r1.run()
    assert os.path.exists(ckpt)

    # resumed run completes and matches the uninterrupted statistics
    r2 = PIVRunner(params, checkpoint_path=ckpt, checkpoint_every=1,
                   batch_size=1)
    table = r2.run()
    assert table is not None
    np.testing.assert_allclose(table["Vx[m/s]"], full["Vx[m/s]"], atol=1e-9)
    np.testing.assert_allclose(
        table["(vx-Vx)^2[m^2/s^2]"], full["(vx-Vx)^2[m^2/s^2]"], atol=1e-9
    )
    assert not os.path.exists(ckpt)  # cleared after completion


def test_fused_infill_pipeline_skips_host_tail(tmp_path):
    """With engine_options={'infill': 'fused'} the device fills holes and the
    host tail must not re-NaN them."""
    fa, fb = particle_pair((256, 256), displacement=(2.0, 1.0), seed=22)
    fa[96:160, 96:160] = 8
    fb[96:160, 96:160] = 8
    imwrite_gray(str(tmp_path / "g0_a.bmp"), fa)
    imwrite_gray(str(tmp_path / "g0_b.bmp"), fb)
    piv = OfflinePIV(str(tmp_path), device="cpu", file_fmt=".bmp",
                     wind_size=32, overlap=16,
                     engine_options={"infill": "fused"})
    results = list(piv())
    assert len(results) == 1
    _, _, u, v = results[0]
    assert np.isfinite(u).all() and np.isfinite(v).all()
    # compare against the host-infill pipeline: same valid vectors
    piv2 = OfflinePIV(str(tmp_path), device="cpu", file_fmt=".bmp",
                      wind_size=32, overlap=16)
    _, _, u2, v2 = next(piv2())
    assert np.quantile(np.abs(u - u2), 0.8) < 1.0


def test_background_subtraction_improves_glare_case(tmp_path):
    """A bright stationary glare spot corrupts correlations; 'auto'
    background subtraction (temporal minimum) removes it."""
    rng = np.random.default_rng(77)
    yy, xx = np.mgrid[0:256, 0:256]
    glare = (200 * np.exp(-((yy - 128) ** 2 + (xx - 128) ** 2) / (2 * 40**2)))
    for i in range(3):
        fa, fb = particle_pair((256, 256), displacement=(2.0, 1.0),
                               seed=400 + i, background=5.0, noise=1.0)
        fa = np.clip(fa.astype(np.int32) + glare, 0, 255).astype(np.uint8)
        fb = np.clip(fb.astype(np.int32) + glare, 0, 255).astype(np.uint8)
        imwrite_gray(str(tmp_path / f"g{i}_a.bmp"), fa)
        imwrite_gray(str(tmp_path / f"g{i}_b.bmp"), fb)

    def median_err(**kw):
        piv = OfflinePIV(str(tmp_path), device="cpu", file_fmt=".bmp",
                         wind_size=32, overlap=16, **kw)
        errs = []
        for x, y, u, v in piv():
            errs.append(abs(np.median(u) - 2000.0))
        return np.mean(errs)

    e_plain = median_err()
    e_bg = median_err(background="auto")
    assert e_bg <= e_plain + 1e-9
    assert e_bg < 100  # recovered 2 px * 1000 within 5%

    from torchpiv_tpu.io.dataset import PIVDataset, compute_background

    bg = compute_background(PIVDataset(str(tmp_path), ".bmp", "pairs"))
    assert bg is not None
    # glare survives the temporal minimum
    assert bg[128, 128] > 100


def test_checkpoint_leaves_no_stray_tmp(tmp_path):
    from torchpiv_tpu.stats import EnsembleAccumulator
    from torchpiv_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    acc = EnsembleAccumulator()
    u = np.ones((3, 4)); v = np.zeros((3, 4))
    acc.add(u, v)
    ckpt = str(tmp_path / "run.npz")
    x = np.arange(4.0); y = np.arange(3.0)
    save_checkpoint(ckpt, acc, 1, x, y)
    save_checkpoint(ckpt, acc, 2, x, y)  # overwrite path too
    leftovers = [p for p in os.listdir(tmp_path) if p != "run.npz"]
    assert leftovers == []
    restored = load_checkpoint(ckpt)
    assert restored is not None and restored[1] == 2


def test_imread_gray_rgb_luma_weights(tmp_path):
    """Color fallback decode must weight R/G/B per BT.601 in RGB order."""
    from torchpiv_tpu.io import decode

    rgb = np.zeros((4, 6, 3), dtype=np.uint8)
    rgb[..., 0] = 200  # pure red -> luma ~ 0.299*200 = 60
    from PIL import Image

    p = str(tmp_path / "red.png")
    Image.fromarray(rgb, mode="RGB").save(p)
    old_cv2 = decode.cv2
    decode.cv2 = None  # force the imageio/PIL fallback path
    try:
        img = decode.imread_gray(p)
    finally:
        decode.cv2 = old_cv2
    assert img is not None
    assert abs(int(img[0, 0]) - round(0.299 * 200)) <= 1


def test_pipeline_cpu_device_pins_use_pallas(tmp_path):
    """device="cpu" must not trace Pallas kernels even when the global
    default backend is a TPU (the engine's "auto" checks the global
    backend; the pipeline pins it to the TARGET device)."""
    from torchpiv_tpu.io.decode import imwrite_gray
    from torchpiv_tpu.utils.synthetic import particle_pair

    fa, fb = particle_pair((128, 128), displacement=(2.0, -1.0), seed=0)
    imwrite_gray(str(tmp_path / "a_a.bmp"), fa)
    imwrite_gray(str(tmp_path / "a_b.bmp"), fb)
    piv = OfflinePIV(str(tmp_path), device="cpu", file_fmt=".bmp",
                     wind_size=64, overlap=32)
    assert piv._engine.config.use_pallas == "off"
    # explicit engine_options still win
    piv2 = OfflinePIV(str(tmp_path), device="cpu", file_fmt=".bmp",
                      wind_size=64, overlap=32,
                      engine_options={"use_pallas": "auto"})
    assert piv2._engine.config.use_pallas == "auto"


def test_threaded_pipeline_early_close_joins_threads(pair_folder):
    """Consumer abandoning the generator mid-stream (the PIVRunner Stop
    path) must tear the feeder/drainer threads down without hanging or
    leaking: all piv-* threads are gone after close()."""
    import threading
    import time

    folder, shifts = pair_folder
    piv = OfflinePIV(folder, wind_size=32, overlap=16, multipass=1,
                     batch_size=1)
    gen = piv()
    next(gen)  # one result, then abandon
    gen.close()
    deadline = time.time() + 30
    while time.time() < deadline:
        alive = [t.name for t in threading.enumerate()
                 if t.name.startswith("piv-")]
        if not alive:
            break
        time.sleep(0.05)
    assert not alive, f"pipeline threads leaked: {alive}"


def test_threaded_pipeline_propagates_engine_errors(pair_folder):
    """An exception on the feeder thread (device dispatch) must surface to
    the consumer, not vanish into a daemon thread."""
    folder, _ = pair_folder
    piv = OfflinePIV(folder, wind_size=32, overlap=16, multipass=1,
                     batch_size=1)

    def boom(fa, fb):
        raise RuntimeError("synthetic dispatch failure")

    piv._batched_fn = boom
    with pytest.raises(RuntimeError, match="synthetic dispatch failure"):
        list(piv())


def test_threaded_pipeline_yields_in_pair_order(pair_folder):
    """The worker-pool finalize tail must not reorder results: fields come
    out in sorted pair order (the checkpoint/resume contract)."""
    folder, shifts = pair_folder
    piv = OfflinePIV(folder, wind_size=64, overlap=32, multipass=1,
                     batch_size=2)
    means = [float(np.nanmean(u)) for x, y, u, v in piv()]
    # pair i has displacement shifts[i][0] (x1000 for units)
    expect = [s[0] * 1000 for s in shifts]
    assert len(means) == len(expect)
    for got, want in zip(means, expect):
        assert abs(got - want) < 150, (means, expect)


def test_prefetcher_ramp_first_batch(pair_folder):
    """PairPrefetcher emits a small first batch (ramp-up), then full-size
    batches; OfflinePIV pads to the nearest jit shape so both sizes
    compile once each."""
    from torchpiv_tpu.io.dataset import PIVDataset
    from torchpiv_tpu.io.prefetch import PairPrefetcher

    folder, shifts = pair_folder  # 3 pairs
    ds = PIVDataset(folder, ".bmp", "pairs")
    sizes = [len(ids) for _, _, ids in
             PairPrefetcher(ds, batch_size=2, device_put=False,
                            first_batch_size=1)]
    assert sizes == [1, 2]
    # ramp disabled -> plain chunking
    sizes = [len(ids) for _, _, ids in
             PairPrefetcher(ds, batch_size=2, device_put=False)]
    assert sizes == [2, 1]


def test_runner_smooth_postprocessing(pair_folder, tmp_path):
    """smooth=True applies robust smoothn to each yielded field before
    accumulation (stats/smoothing.py; beyond the reference)."""
    folder, _ = pair_folder
    params = PIVParams(
        wind_size=64, overlap=32, multipass=1, multipass_mode="CWS",
        scale=1.0, dt=1.0, device="cpu", file_fmt=".bmp", folder=folder,
        folder_mode="pairs", save_opt="Dont save", save_dir=str(tmp_path),
    )
    rough = PIVRunner(params, batch_size=2).run()
    smoothed = PIVRunner(params, batch_size=2, smooth=True).run()
    assert smoothed is not None and rough is not None
    ru, su = rough["Vx[m/s]"], smoothed["Vx[m/s]"]
    assert su.shape == ru.shape
    # same flow recovered, but with smaller spatial roughness
    assert abs(np.mean(su) - np.mean(ru)) < 0.1 * max(1.0, abs(np.mean(ru)))

    def roughness(f):
        return float(np.mean(np.abs(np.diff(f, axis=0)))
                     + np.mean(np.abs(np.diff(f, axis=1))))

    assert roughness(su) < roughness(ru)
    # fixed-parameter form also accepted
    fixed = PIVRunner(params, batch_size=2, smooth=10.0).run()
    assert fixed is not None


def test_offline_piv_frame_mask(pair_folder, tmp_path):
    """engine_options['frame_mask'] accepts an array or a mask-image path;
    masked windows are flagged invalid inside the engine and infilled like
    outliers in the yielded fields."""
    from torchpiv_tpu.io.decode import imwrite_gray

    folder, shifts = pair_folder
    mask = np.zeros((256, 256), np.uint8)
    mask[:, 96:160] = 255
    mask_path = str(tmp_path / "mask.bmp")
    imwrite_gray(mask_path, mask)

    out = list(OfflinePIV(folder, device="cpu", file_fmt=".bmp",
                          wind_size=64, overlap=32, multipass=2,
                          engine_options={"frame_mask": mask_path})())
    assert len(out) == 3
    x, y, u, v = out[0]
    assert np.isfinite(u).all()
    # masked windows are reported as exactly zero displacement (walls);
    # the tail flips rows to the physical y-axis, so flip the mask too
    from torchpiv_tpu.models import MultipassPIV, PIVConfig
    eng = MultipassPIV(
        PIVConfig(frame_shape=(256, 256), wind_size=64, overlap=32,
                  multipass=2),
        frame_mask=mask > 0)
    wm = np.flip(eng.window_masked[-1], axis=0)
    assert wm.any()
    assert (u[wm] == 0).all() and (v[wm] == 0).all()
    # free-stream columns still recover the planted flow (physical units
    # with scale=dt=1: px * 1000)
    assert abs(np.mean(u[:, :2]) / 1000 - shifts[0][0]) < 0.1
    # unreadable mask path fails loudly
    import pytest
    with pytest.raises(ValueError):
        list(OfflinePIV(folder, device="cpu", file_fmt=".bmp",
                        wind_size=64, overlap=32,
                        engine_options={"frame_mask": "/nonexistent.bmp"})())


def test_offline_piv_preprocess(pair_folder):
    """preprocess='clahe' conditions frames in the decode stage and the
    pipeline still recovers the planted flow."""
    folder, shifts = pair_folder
    out = list(OfflinePIV(folder, device="cpu", file_fmt=".bmp",
                          wind_size=64, overlap=32, multipass=2,
                          preprocess="clahe")())
    assert len(out) == 3
    _, _, u, v = out[0]
    assert abs(np.mean(u) / 1000 - shifts[0][0]) < 0.1
    with pytest.raises(ValueError):
        OfflinePIV(folder, device="cpu", preprocess="bogus")


def test_offline_piv_preprocess_callable_nonuint8(pair_folder):
    """A user preprocess callable may emit any dtype (resolve_preprocess
    accepts any frame->frame callable); the AOT executables must be
    compiled for that dtype — an executable compiled for uint8
    hard-rejects float32 args (unlike jit, which would retrace)."""
    folder, shifts = pair_folder
    out = list(OfflinePIV(folder, device="cpu", file_fmt=".bmp",
                          wind_size=64, overlap=32, multipass=2,
                          preprocess=lambda f: f.astype(np.float32) / 2.0)())
    assert len(out) == 3
    _, _, u, v = out[0]
    # normalization makes the engine scale-invariant: same flow recovered
    assert abs(np.mean(u) / 1000 - shifts[0][0]) < 0.1


def test_warmup_compiles_the_production_graph(pair_folder):
    """`tpiv warmup` must trace the EXACT graph OfflinePIV dispatches —
    the persistent compile cache keys on the traced HLO, so a
    structurally different scan (the old tuple-output warmup) caches a
    different executable and the first real run still pays the full
    compile.  Pin: identical lowered text for the same config."""
    import jax.numpy as jnp

    from torchpiv_tpu.models import MultipassPIV, PIVConfig
    from torchpiv_tpu.pipeline import build_packed_scan

    folder, _ = pair_folder
    piv = OfflinePIV(folder, device="cpu", file_fmt=".bmp",
                     folder_mode="pairs", batch_size=4,
                     wind_size=64, overlap=32, multipass=2)

    # what `tpiv warmup 256x256 --wind-size 64 --overlap 32 --multipass 2`
    # builds (cli.cmd_warmup uses the same shared builder)
    cfg = PIVConfig(frame_shape=(256, 256), wind_size=64, overlap=32,
                    multipass=2, multipass_mode="CWS")
    warm_fn = build_packed_scan(MultipassPIV(cfg))

    z = jnp.zeros((4, 256, 256), jnp.uint8)
    warm_txt = warm_fn.lower(z, z).as_text()
    prod_txt = piv._batched_fn.lower(z, z).as_text()
    assert warm_txt == prod_txt


def test_runner_per_pair_saves_async(pair_folder, tmp_path):
    """'Save all text/binary' runs on the async writer thread: every pair
    file lands with correct content, and a failing save surfaces instead
    of being swallowed."""
    import glob

    from torchpiv_tpu.pipeline import _AsyncSaver
    from torchpiv_tpu.utils.persistence import load_table

    folder, shifts = pair_folder
    p = PIVParams()
    p.folder = folder
    p.device = "cpu"
    p.file_fmt = ".bmp"
    p.wind_size = 64
    p.overlap = 32
    p.multipass = 1
    p.save_opt = "Save all text"
    p.save_dir = str(tmp_path / "out")
    table = PIVRunner(p, batch_size=2).run()
    assert table is not None
    files = sorted(glob.glob(os.path.join(p.save_dir, "*_pair*.txt")))
    assert len(files) == len(shifts)
    cols = load_table(files[0])
    assert set(cols) == {"x[mm]", "y[mm]", "Vx[m/s]", "Vy[m/s]"}
    assert np.isfinite(cols["Vx[m/s]"]).all()

    # error propagation: a writer failure raises at submit/close
    saver = _AsyncSaver(maxsize=2)

    def boom(*a):
        raise OSError("disk full")

    saver.submit(boom)
    with pytest.raises(OSError, match="disk full"):
        saver.close()


def test_truncated_bmp_is_skipped_not_crash(pair_folder, tmp_path):
    """A half-written BMP (camera mid-write) must read as unreadable —
    the skip-unreadable-pair contract — not raise out of the decoder and
    kill the pipeline."""
    from torchpiv_tpu.io.decode import imread_gray

    folder, shifts = pair_folder
    import glob
    import shutil

    work = tmp_path / "w"
    work.mkdir()
    for f in glob.glob(os.path.join(folder, "*.bmp")):
        shutil.copy(f, work)
    victims = sorted(glob.glob(str(work / "*.bmp")))[:2]  # pair 0
    for v in victims:
        with open(v, "rb") as f:
            data = f.read()
        with open(v, "wb") as f:
            f.write(data[: len(data) // 2])  # truncate mid-pixel-data
    assert imread_gray(victims[0]) is None
    piv = OfflinePIV(str(work), device="cpu", file_fmt=".bmp",
                     wind_size=64, overlap=32, batch_size=2)
    out = list(piv())
    assert len(out) == len(shifts) - 1  # pair 0 skipped, rest intact


def test_infill_none_yields_raw_vectors(pair_folder):
    """infill='none' must actually disable the host NaN+infill tail (it
    silently behaved like 'host' before): raw vectors come back — NaNs
    allowed nowhere because this synthetic data is fully valid — and the
    >50%-invalid skip must NOT engage on a mostly-invalid pair."""
    import glob
    import shutil
    import tempfile

    folder, shifts = pair_folder
    piv = OfflinePIV(folder, device="cpu", file_fmt=".bmp", wind_size=64,
                     overlap=32, batch_size=2,
                     engine_options={"infill": "none"})
    out = list(piv())
    assert len(out) == len(shifts)

    # a pair that is mostly particle-free: 'host' skips it (>50% invalid),
    # 'none' must yield it raw (NaN-free, unfiltered measurements)
    work = tempfile.mkdtemp()
    fa, fb = particle_pair((256, 256), displacement=(2.0, 1.0), seed=77)
    fa = fa.copy()
    fb = fb.copy()
    # uncorrelated noise over 3/4 of the frame: those windows have no
    # correlation peak and fail the peak-ratio validation
    rng = np.random.default_rng(5)
    fa[:, 64:] = rng.integers(0, 255, fa[:, 64:].shape, dtype=np.uint8)
    fb[:, 64:] = rng.integers(0, 255, fb[:, 64:].shape, dtype=np.uint8)
    imwrite_gray(os.path.join(work, "h_a.bmp"), fa)
    imwrite_gray(os.path.join(work, "h_b.bmp"), fb)
    kw = dict(device="cpu", file_fmt=".bmp", wind_size=64, overlap=32)
    assert len(list(OfflinePIV(work, **kw)())) == 0  # host: skip quirk
    raw = list(OfflinePIV(work, engine_options={"infill": "none"}, **kw)())
    assert len(raw) == 1
    assert np.isfinite(raw[0][2]).all()
    shutil.rmtree(work, ignore_errors=True)


def test_mesh_first_batch_matches_rounded_batch(pair_folder):
    """Mesh mode rounds the batch up to a pair-axis multiple; the ramp-up
    first batch must follow (it was captured before the rounding, making
    the FIRST dispatch's pair axis indivisible by the mesh)."""
    import jax

    from torchpiv_tpu.parallel import make_mesh

    folder, shifts = pair_folder
    mesh = make_mesh({"pairs": 4}, jax.devices()[:4])
    piv = OfflinePIV(folder, file_fmt=".bmp", wind_size=64, overlap=32,
                     batch_size=3, mesh=mesh)  # 3 -> rounds to 4
    assert piv._batch == 4
    assert piv._first_batch == 4
    out = list(piv())
    assert len(out) == len(shifts)


def test_prefetcher_targets_explicit_device(pair_folder):
    """device_put runs in pool threads that do NOT inherit the feeder's
    thread-local default_device — the prefetcher must target the
    pipeline's device explicitly or batches land on the global default
    (e.g. a TPU the user asked to avoid) and pay a transfer back."""
    import jax

    from torchpiv_tpu.io.dataset import PIVDataset
    from torchpiv_tpu.io.prefetch import PairPrefetcher

    folder, _ = pair_folder
    target = jax.devices()[2]
    ds = PIVDataset(folder, ".bmp", "pairs")
    for a, b, ids in PairPrefetcher(ds, batch_size=2, device=target):
        assert a.devices() == {target}, a.devices()
        assert b.devices() == {target}


def test_corrupt_checkpoint_resumes_from_scratch(tmp_path, caplog):
    """An externally-truncated checkpoint must degrade to a from-scratch
    run with a warning — never crash the resume (merge, by contrast,
    refuses loudly: see test_distributed)."""
    import logging

    from torchpiv_tpu.stats.ensemble import EnsembleAccumulator
    from torchpiv_tpu.utils.checkpoint import (load_checkpoint,
                                               save_checkpoint)

    p = str(tmp_path / "ck.npz")
    acc = EnsembleAccumulator()
    acc.add(np.ones((4, 4)), np.ones((4, 4)))
    save_checkpoint(p, acc, done=3, x=np.zeros((4, 4)), y=np.zeros((4, 4)))
    assert load_checkpoint(p) is not None

    data = open(p, "rb").read()
    open(p, "wb").write(data[: len(data) // 2])
    with caplog.at_level(logging.WARNING, logger="torchpiv_tpu"):
        assert load_checkpoint(p) is None
    assert any("unreadable" in r.getMessage() for r in caplog.records)


def test_merge_refuses_corrupt_shard(tmp_path):
    from torchpiv_tpu.parallel.distributed import merge_checkpoints
    from torchpiv_tpu.stats.ensemble import EnsembleAccumulator
    from torchpiv_tpu.utils.checkpoint import save_checkpoint

    ok, bad = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    acc = EnsembleAccumulator()
    acc.add(np.ones((4, 4)), np.ones((4, 4)))
    for p in (ok, bad):
        save_checkpoint(p, acc, done=1, x=np.zeros((4, 4)),
                        y=np.zeros((4, 4)), complete=True)
    data = open(bad, "rb").read()
    open(bad, "wb").write(data[:40])
    with pytest.raises(FileNotFoundError, match="unreadable"):
        merge_checkpoints([ok, bad])
