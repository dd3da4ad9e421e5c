"""End-to-end parity of the fused multipass graph vs the golden mirror,
plus physical accuracy on synthetic flows with known displacement."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import golden
from torchpiv_tpu.models import MultipassPIV, PIVConfig
from torchpiv_tpu.utils.synthetic import particle_pair, shear_flow


def golden_multipass(fa, fb, cfg: PIVConfig):
    u, v, x, y, val = golden.first_pass(
        fa, fb, cfg.wind_size, cfg.overlap, cfg.validate, cfg.val_ratio
    )
    it = golden.cws_iteration if cfg.multipass_mode == "CWS" else golden.dws_iteration
    sched = golden.pass_schedule(
        cfg.wind_size, cfg.overlap, cfg.multipass, cfg.multipass_scale
    )
    for w, o in sched[1:]:
        u, v, x, y, val = it(fa, fb, x, y, u, v, val, w, o)
    return u, v, val


def rms(a, b, mask=None):
    d = np.asarray(a, dtype=np.float64) - np.asarray(b, dtype=np.float64)
    if mask is not None:
        d = d[~mask]
    return np.sqrt(np.mean(d**2))


@pytest.mark.parametrize(
    "multipass,mode",
    [(1, "CWS"), (2, "CWS"), (2, "DWS"), (3, "CWS")],
)
def test_parity_with_golden(multipass, mode):
    fa, fb = particle_pair((256, 256), displacement=(3.3, -2.1), seed=7)
    cfg = PIVConfig(
        frame_shape=(256, 256),
        wind_size=64,
        overlap=32,
        multipass=multipass,
        multipass_mode=mode,
    )
    engine = MultipassPIV(cfg)
    u, v, inval = jax.jit(engine)(jnp.asarray(fa), jnp.asarray(fb))
    gu, gv, gval = golden_multipass(fa, fb, cfg)

    inval = np.asarray(inval)
    # Validation masks agree exactly on these inputs (measured 0 flips for
    # every configuration); the 0.5% headroom only covers a future
    # f32-vs-f64 peak-ratio boundary flip, not systematic drift.
    disagree = np.mean(inval != gval)
    assert disagree <= 0.005, f"validation masks disagree on {disagree:.1%}"

    both_valid = ~(inval | gval)
    assert both_valid.mean() > 0.5
    assert rms(u, gu, ~both_valid) < 0.01, "u parity"
    assert rms(v, gv, ~both_valid) < 0.01, "v parity"


def test_uniform_flow_accuracy():
    true_u, true_v = 3.3, -2.1
    fa, fb = particle_pair((512, 512), displacement=(true_u, true_v), seed=3)
    cfg = PIVConfig(
        frame_shape=(512, 512), wind_size=64, overlap=32, multipass=2,
        multipass_mode="CWS",
    )
    engine = MultipassPIV(cfg)
    u, v, inval = jax.jit(engine)(jnp.asarray(fa), jnp.asarray(fb))
    u, v, inval = map(np.asarray, (u, v, inval))
    valid = ~inval
    assert valid.mean() > 0.9
    # interior only: windows near the frame edge lose particles
    interior = np.zeros_like(valid)
    interior[2:-2, 2:-2] = True
    sel = valid & interior
    assert abs(np.mean(u[sel]) - true_u) < 0.05
    assert abs(np.mean(v[sel]) - true_v) < 0.05
    assert np.std(u[sel]) < 0.2


def test_shear_flow_accuracy():
    du_dy = 0.01
    fa, fb = particle_pair(
        (512, 512), displacement=shear_flow(1.0, du_dy), seed=11
    )
    cfg = PIVConfig(
        frame_shape=(512, 512), wind_size=64, overlap=32, multipass=2,
        multipass_mode="CWS",
    )
    engine = MultipassPIV(cfg)
    u, v, inval = jax.jit(engine)(jnp.asarray(fa), jnp.asarray(fb))
    u, inval = np.asarray(u), np.asarray(inval)
    x, y = engine.final_coordinates
    expected = 1.0 + du_dy * y
    valid = ~inval
    interior = np.zeros_like(valid)
    interior[2:-2, 2:-2] = True
    sel = valid & interior
    err = u[sel] - expected[sel]
    assert np.sqrt(np.mean(err**2)) < 0.15
    assert abs(np.mean(err)) < 0.05


def test_fused_infill_runs_in_graph():
    fa, fb = particle_pair((256, 256), displacement=(2.0, 1.0), seed=5)
    cfg = PIVConfig(
        frame_shape=(256, 256), wind_size=32, overlap=16, multipass=1,
        infill="fused",
    )
    engine = MultipassPIV(cfg)
    u, v, inval = jax.jit(engine)(jnp.asarray(fa), jnp.asarray(fb))
    assert np.isfinite(np.asarray(u)).all()
    assert np.isfinite(np.asarray(v)).all()


def test_vmap_batches_pairs():
    fa1, fb1 = particle_pair((256, 256), displacement=(2.0, 1.0), seed=1)
    fa2, fb2 = particle_pair((256, 256), displacement=(-1.5, 0.5), seed=2)
    cfg = PIVConfig(frame_shape=(256, 256), wind_size=64, overlap=32, multipass=2)
    engine = MultipassPIV(cfg)
    batched = jax.jit(jax.vmap(engine))
    fa = jnp.stack([jnp.asarray(fa1), jnp.asarray(fa2)])
    fb = jnp.stack([jnp.asarray(fb1), jnp.asarray(fb2)])
    u, v, inval = batched(fa, fb)
    single = jax.jit(engine)
    u0, v0, i0 = single(jnp.asarray(fa1), jnp.asarray(fb1))
    np.testing.assert_allclose(np.asarray(u[0]), np.asarray(u0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v[0]), np.asarray(v0), atol=1e-5)


def test_three_pass_cws_subpixel_accuracy():
    """BASELINE config #3 (scaled down): known uniform+shear flow, 3-pass
    CWS, sub-pixel accuracy on the final dense grid."""
    du_dy = 0.008
    fa, fb = particle_pair((512, 512), displacement=shear_flow(2.0, du_dy),
                           seed=31, density=0.03)
    cfg = PIVConfig(frame_shape=(512, 512), wind_size=64, overlap=32,
                    multipass=3, multipass_mode="CWS")
    engine = MultipassPIV(cfg)
    u, v, inval = jax.jit(engine)(jnp.asarray(fa), jnp.asarray(fb))
    u, inval = np.asarray(u), np.asarray(inval)
    x, y = engine.final_coordinates
    assert engine.final_field_shape == ((512 - 16) // 8 + 1,) * 2
    expected = 2.0 + du_dy * y
    sel = ~inval
    sel[:4] = sel[-4:] = False
    sel[:, :4] = sel[:, -4:] = False
    err = u[sel] - expected[sel]
    assert abs(np.mean(err)) < 0.05
    assert np.sqrt(np.mean(err**2)) < 0.25  # 16px windows are noisy


def test_dense_16px_75pct_overlap():
    """BASELINE config #5 (scaled down): final 16 px windows at 75% overlap
    — peak-fit/validation bound, stride does not divide the window."""
    fa, fb = particle_pair((256, 256), displacement=(1.2, -0.7), seed=33,
                           density=0.05)
    cfg = PIVConfig(frame_shape=(256, 256), wind_size=16, overlap=12,
                    multipass=1)
    engine = MultipassPIV(cfg)
    assert engine.final_field_shape == (61, 61)
    u, v, inval = jax.jit(engine)(jnp.asarray(fa), jnp.asarray(fb))
    u, v, inval = map(np.asarray, (u, v, inval))
    sel = ~inval
    assert sel.mean() > 0.5  # tiny windows validate aggressively
    assert abs(np.median(u[sel]) - 1.2) < 0.15
    assert abs(np.median(v[sel]) + 0.7) < 0.15


def test_degenerate_black_frames():
    """Featureless frames: outputs stay finite and validation flags
    (nearly) everything — no NaN/Inf escapes the engine."""
    fa = np.zeros((128, 128), dtype=np.uint8)
    fb = np.zeros((128, 128), dtype=np.uint8)
    cfg = PIVConfig(frame_shape=(128, 128), wind_size=32, overlap=16,
                    multipass=2)
    u, v, inval = jax.jit(MultipassPIV(cfg))(jnp.asarray(fa), jnp.asarray(fb))
    assert np.isfinite(np.asarray(u)).all()
    assert np.isfinite(np.asarray(v)).all()


def test_saturated_frames():
    fa = np.full((128, 128), 255, dtype=np.uint8)
    fb = np.full((128, 128), 255, dtype=np.uint8)
    cfg = PIVConfig(frame_shape=(128, 128), wind_size=32, overlap=16)
    u, v, inval = jax.jit(MultipassPIV(cfg))(jnp.asarray(fa), jnp.asarray(fb))
    # FFT noise on constant windows creates spurious peak structure the
    # reference algorithm may call "valid" — the contract is only that
    # nothing non-finite escapes
    assert np.isfinite(np.asarray(u)).all()
    assert np.isfinite(np.asarray(v)).all()


def test_window_deformation_beats_cws_on_strong_shear():
    """DEF mode (deforming windows, beyond the reference) reduces the
    gradient bias of pure-translation CWS on a strong shear flow."""
    du_dy = 0.03  # ~2 px velocity variation across a 64 px window
    fa, fb = particle_pair((512, 512), displacement=shear_flow(1.0, du_dy),
                           seed=41, density=0.04)
    errs = {}
    for mode in ("CWS", "DEF"):
        cfg = PIVConfig(frame_shape=(512, 512), wind_size=64, overlap=32,
                        multipass=2, multipass_mode=mode)
        engine = MultipassPIV(cfg)
        u, v, inval = jax.jit(engine)(jnp.asarray(fa), jnp.asarray(fb))
        u, inval = np.asarray(u), np.asarray(inval)
        x, y = engine.final_coordinates
        expected = 1.0 + du_dy * y
        sel = ~inval
        sel[:3] = sel[-3:] = False
        sel[:, :3] = sel[:, -3:] = False
        errs[mode] = np.sqrt(np.mean((u[sel] - expected[sel]) ** 2))
    assert errs["DEF"] < 0.3
    assert errs["DEF"] <= errs["CWS"] * 1.05  # at least as good as CWS


def test_ensemble_correlation_averaging_rescues_sparse_seeding():
    """With very sparse seeding single pairs mostly fail validation, but
    averaging correlation planes across the batch recovers the flow."""
    from torchpiv_tpu.models.ensemble_corr import EnsemblePIV

    pairs = [particle_pair((256, 256), displacement=(2.5, -1.5), seed=300 + i,
                           density=0.0015, noise=4.0) for i in range(16)]
    fa = jnp.asarray(np.stack([p[0] for p in pairs]))
    fb = jnp.asarray(np.stack([p[1] for p in pairs]))
    cfg = PIVConfig(frame_shape=(256, 256), wind_size=32, overlap=16,
                    multipass=1)

    # single-pair baseline: sparse seeding -> many invalid vectors
    single = MultipassPIV(cfg)
    _, _, iv1 = jax.jit(single)(fa[0], fb[0])
    single_invalid = float(np.asarray(iv1).mean())

    ens = EnsemblePIV(cfg)
    u, v, inval = jax.jit(ens)(fa, fb)
    u, v, inval = map(np.asarray, (u, v, inval))
    assert inval.mean() < single_invalid  # averaging helps validation
    sel = ~inval
    assert sel.mean() > 0.8
    assert abs(np.median(u[sel]) - 2.5) < 0.2
    assert abs(np.median(v[sel]) + 1.5) < 0.2

    # multipass config rejected
    with pytest.raises(ValueError, match="single-pass"):
        EnsemblePIV(PIVConfig(frame_shape=(256, 256), wind_size=32,
                              overlap=16, multipass=2))


def test_degenerate_schedule_rejected():
    with pytest.raises(ValueError, match="degenerates"):
        PIVConfig(frame_shape=(512, 512), wind_size=64, overlap=32,
                  multipass=6)  # 64->32->16->8->4->2


def test_validate_false_engine_and_sharded():
    from torchpiv_tpu.parallel import ShardedPIV, make_mesh

    fa, fb = particle_pair((256, 256), displacement=(2.0, 1.0), seed=13)
    cfg = PIVConfig(frame_shape=(256, 256), wind_size=64, overlap=32,
                    multipass=2, validate=False)
    engine = MultipassPIV(cfg)
    u, v, inval = jax.jit(engine)(jnp.asarray(fa), jnp.asarray(fb))
    assert inval is None
    assert np.isfinite(np.asarray(u)).all()

    mesh = make_mesh({"pairs": 2, "windows": 2})
    sharded = ShardedPIV(engine, mesh)
    fa_b = jnp.stack([jnp.asarray(fa)] * 2)
    fb_b = jnp.stack([jnp.asarray(fb)] * 2)
    us, vs, invs = jax.jit(sharded)(fa_b, fb_b)
    assert not np.asarray(invs).any()
    d = np.abs(np.asarray(us[0]) - np.asarray(u))
    assert np.median(d) < 1e-3


def test_gaussian_window_weighting():
    """window_weight="gaussian" (beyond the reference): runs through CWS
    multipass and stays accurate on uniform flow."""
    true_u, true_v = 2.6, -1.4
    fa, fb = particle_pair((256, 256), displacement=(true_u, true_v), seed=21)
    cfg = PIVConfig(frame_shape=(256, 256), wind_size=64, overlap=32,
                    multipass=2, multipass_mode="CWS",
                    window_weight="gaussian")
    u, v, inval = jax.jit(MultipassPIV(cfg))(jnp.asarray(fa), jnp.asarray(fb))
    u, v, inval = map(np.asarray, (u, v, inval))
    sel = ~inval
    sel[:1] = sel[-1:] = False
    sel[:, :1] = sel[:, -1:] = False
    assert sel.mean() > 0.6
    assert abs(u[sel].mean() - true_u) < 0.07
    assert abs(v[sel].mean() - true_v) < 0.07
    with pytest.raises(ValueError):
        PIVConfig(frame_shape=(256, 256), wind_size=64, overlap=32,
                  window_weight="hann")
    with pytest.raises(ValueError):
        PIVConfig(frame_shape=(256, 256), wind_size=64, overlap=32,
                  window_weight="gaussian", fused="on")


def test_bicubic_cws_interp():
    """cws_interp="bicubic" (the reference's dead piv_iteration_CWS_Fast
    capability, live here): accurate on uniform flow, not identical to
    bilinear, integer shifts degenerate to exact samples."""
    import jax.numpy as jnp

    from torchpiv_tpu.ops.shifts import (
        bicubic_cws_shift, cws_shift, per_window_origins)

    true_u, true_v = 2.7, -1.3
    fa, fb = particle_pair((256, 256), displacement=(true_u, true_v), seed=23)
    base = dict(frame_shape=(256, 256), wind_size=64, overlap=32,
                multipass=2, multipass_mode="CWS")
    eng = MultipassPIV(PIVConfig(**base, cws_interp="bicubic",
                                 use_pallas="off"))
    u, v, inval = map(np.asarray, jax.jit(eng)(jnp.asarray(fa),
                                               jnp.asarray(fb)))
    sel = ~inval
    sel[:1] = sel[-1:] = False
    sel[:, :1] = sel[:, -1:] = False
    assert abs(u[sel].mean() - true_u) < 0.05
    assert abs(v[sel].mean() + 1.3) < 0.05

    # integer shift: bicubic == bilinear == exact integer sample
    r0, c0 = per_window_origins((256, 256), 64, 32)
    n = len(r0)
    vi = jnp.full(n, 2.0)
    frame = jnp.asarray(fa, jnp.float32)
    bc = bicubic_cws_shift(frame, jnp.asarray(r0), jnp.asarray(c0), 64, vi, vi)
    bl = cws_shift(frame, jnp.asarray(r0), jnp.asarray(c0), 64, vi, vi)
    np.testing.assert_allclose(np.asarray(bc), np.asarray(bl), atol=1e-4)

    with pytest.raises(ValueError):
        PIVConfig(**base, cws_interp="lanczos")


@pytest.mark.parametrize(
    "shape,w,o,multipass,mode,validate,correlator",
    [
        # non-power-of-two windows (no reshape fast path, no 128-lane groups)
        ((192, 288), 48, 24, 2, "CWS", True, "matmul"),
        ((192, 192), 48, 12, 1, "CWS", True, "matmul"),
        # small windows, deep schedule (16 -> 8)
        ((128, 128), 16, 8, 2, "CWS", True, "matmul"),
        # non-square frame, DWS, FFT correlator
        ((160, 256), 32, 16, 2, "DWS", True, "fft"),
        # validation off
        ((192, 192), 64, 48, 2, "CWS", False, "matmul"),
    ],
)
def test_parity_config_matrix(shape, w, o, multipass, mode, validate,
                              correlator):
    """Long-tail configuration sweep vs golden: odd window sizes,
    non-square frames, deep schedules, both correlators, validate off —
    guards paths outside the headline configuration."""
    fa, fb = particle_pair(shape, displacement=(2.6, -1.4), seed=13)
    cfg = PIVConfig(
        frame_shape=shape, wind_size=w, overlap=o, multipass=multipass,
        multipass_mode=mode, validate=validate, correlator=correlator,
    )
    engine = MultipassPIV(cfg)
    u, v, inval = jax.jit(engine)(jnp.asarray(fa), jnp.asarray(fb))
    gu, gv, gval = golden_multipass(fa, fb, cfg)
    if validate:
        inval = np.asarray(inval)
        assert np.mean(inval != gval) <= 0.005
        both = ~(inval | gval)
    else:
        assert inval is None and gval is None
        both = np.ones(np.asarray(u).shape, dtype=bool)
    assert both.mean() > 0.4
    assert rms(u, gu, ~both) < 0.01
    assert rms(v, gv, ~both) < 0.01


def test_ensemble_honors_window_weight():
    """EnsemblePIV applies the Gaussian taper when configured (consistency
    with the engine; tapered windows still recover the flow)."""
    from torchpiv_tpu.models.ensemble_corr import EnsemblePIV

    pairs = [particle_pair((256, 256), displacement=(2.5, -1.5),
                           seed=500 + i, density=0.01) for i in range(8)]
    fa = jnp.asarray(np.stack([p[0] for p in pairs]))
    fb = jnp.asarray(np.stack([p[1] for p in pairs]))
    cfg = PIVConfig(frame_shape=(256, 256), wind_size=32, overlap=16,
                    multipass=1, window_weight="gaussian")
    u, v, inval = jax.jit(EnsemblePIV(cfg))(fa, fb)
    u, inval = np.asarray(u), np.asarray(inval)
    sel = ~inval
    sel[:2] = sel[-2:] = False
    sel[:, :2] = sel[:, -2:] = False
    assert abs(u[sel].mean() - 2.5) < 0.1


# ---- static region-of-interest mask (beyond the reference) ----

def test_frame_mask_engine():
    """frame_mask: masked windows come back invalid with zero displacement,
    while windows away from the mask match the unmasked engine."""
    from scipy.ndimage import binary_dilation

    fa, fb = particle_pair((256, 256), displacement=(3.0, -1.5), seed=1)
    mask = np.zeros((256, 256), bool)
    mask[96:160, :] = True  # a wall band across the frame
    cfg = PIVConfig(frame_shape=(256, 256), wind_size=32, overlap=16,
                    multipass=2, multipass_mode="CWS")
    engm = MultipassPIV(cfg, frame_mask=mask)
    eng0 = MultipassPIV(cfg)
    um, vm, im = map(np.asarray, jax.jit(engm)(jnp.asarray(fa),
                                               jnp.asarray(fb)))
    u0, v0, i0 = map(np.asarray, jax.jit(eng0)(jnp.asarray(fa),
                                               jnp.asarray(fb)))
    wm = engm.window_masked[-1]
    assert 0 < wm.sum() < wm.size
    assert im[wm].all()
    assert (um[wm] == 0).all() and (vm[wm] == 0).all()
    # away from the band (3 window rows clear) the mask is nearly
    # invisible: the spline predictor has global support, so zeroing the
    # band perturbs far vectors at the sub-0.1 px level at most
    far = ~binary_dilation(wm, iterations=3)
    du = np.abs(um[far] - u0[far])
    dv = np.abs(vm[far] - v0[far])
    assert np.median(du) < 1e-3 and np.median(dv) < 1e-3
    assert np.quantile(du, 0.95) < 0.05 and np.quantile(dv, 0.95) < 0.05
    assert du.max() < 0.15 and dv.max() < 0.15
    assert (im[far] == i0[far]).mean() > 0.99


def test_frame_mask_without_validation_and_errors():
    fa, fb = particle_pair((128, 128), displacement=(2.0, -1.0), seed=2)
    mask = np.zeros((128, 128), bool)
    mask[:, :48] = True
    cfg = PIVConfig(frame_shape=(128, 128), wind_size=32, overlap=16,
                    multipass=2, validate=False)
    eng = MultipassPIV(cfg, frame_mask=mask)
    u, v, inval = jax.jit(eng)(jnp.asarray(fa), jnp.asarray(fb))
    assert inval is not None  # the mask IS the inval field here
    assert np.asarray(inval)[eng.window_masked[-1]].all()
    with pytest.raises(ValueError):
        MultipassPIV(cfg, frame_mask=np.zeros((64, 64), bool))


def test_frame_mask_threshold():
    """mask_threshold controls when a straddling window flips invalid."""
    H = W = 128
    mask = np.zeros((H, W), bool)
    mask[:, :40] = True  # windows at col origin 32 are 8/32 = 25% masked
    cfg = PIVConfig(frame_shape=(H, W), wind_size=32, overlap=16)
    strict = MultipassPIV(cfg, frame_mask=mask, mask_threshold=0.2)
    loose = MultipassPIV(cfg, frame_mask=mask, mask_threshold=0.5)
    assert strict.window_masked[0].sum() > loose.window_masked[0].sum()
    # fully-masked windows flagged under both
    assert strict.window_masked[0][:, 0].all()
    assert loose.window_masked[0][:, 0].all()


def test_frame_mask_threshold_zero_means_any_pixel():
    """Review regression: mask_threshold=0 must mean 'any masked pixel',
    not 'every window'."""
    mask = np.zeros((128, 128), bool)
    mask[0, 0] = True  # a single masked pixel
    cfg = PIVConfig(frame_shape=(128, 128), wind_size=32, overlap=16)
    eng = MultipassPIV(cfg, frame_mask=mask, mask_threshold=0.0)
    wm = eng.window_masked[0]
    assert wm[0, 0] and wm.sum() == 1
    with pytest.raises(ValueError):
        MultipassPIV(cfg, frame_mask=mask, mask_threshold=1.5)


def test_offline_piv_mask_threshold_option(tmp_path):
    """Review regression: engine_options['mask_threshold'] must reach the
    engine instead of exploding in PIVConfig."""
    from torchpiv_tpu.io.decode import imwrite_gray
    from torchpiv_tpu.pipeline import OfflinePIV

    fa, fb = particle_pair((128, 128), displacement=(2.0, -1.0), seed=3)
    imwrite_gray(str(tmp_path / "p0_a.bmp"), fa)
    imwrite_gray(str(tmp_path / "p0_b.bmp"), fb)
    mask = np.zeros((128, 128), bool)
    mask[:, :40] = True
    piv = OfflinePIV(str(tmp_path), device="cpu", file_fmt=".bmp",
                     wind_size=32, overlap=16,
                     engine_options={"frame_mask": mask,
                                     "mask_threshold": 0.2})
    out = list(piv())
    assert len(out) == 1
