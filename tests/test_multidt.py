"""Multi-Δt PIV (models/multidt.py): dynamic-range boost on sequences."""
import numpy as np
import pytest

from torchpiv_tpu.models.multidt import (MultiDtPIV, MultiDtResult,
                                         merge_multi_dt)


def test_merge_prefers_largest_valid_separation():
    shape = (4, 4)
    zeros = np.zeros(shape)
    # true velocity 0.1 px/frame everywhere
    f1 = (np.full(shape, 0.1), zeros, np.zeros(shape))
    f4 = (np.full(shape, 0.4), zeros, np.zeros(shape))
    res = merge_multi_dt([f1, f4], [1, 4], wind_size=32)
    assert np.allclose(res.u, 0.1)
    assert (res.dt_map == 4).all()

    # a too-large displacement at dt=4 falls back to dt=1
    big = np.full(shape, 20.0)  # > 0.25 * 32
    res = merge_multi_dt([f1, (big, zeros, np.zeros(shape))], [1, 4],
                         wind_size=32)
    assert (res.dt_map == 1).all()

    # an inconsistent (peak-hopped) dt=4 vector is rejected
    hop = np.full(shape, 0.4)
    hop[1, 1] = 3.0  # implies 0.75 px/frame vs base 0.1
    res = merge_multi_dt([f1, (hop, zeros, np.zeros(shape))], [1, 4],
                         wind_size=32)
    assert res.dt_map[1, 1] == 1 and res.dt_map[0, 0] == 4

    # invalid at dt=4 falls back; invalid at both marks invalid
    bad4 = np.zeros(shape)
    bad4[2, 2] = 1
    res = merge_multi_dt([f1, (np.full(shape, 0.4), zeros, bad4)],
                         [1, 4], wind_size=32)
    assert res.dt_map[2, 2] == 1
    bad1 = np.zeros(shape)
    bad1[3, 3] = 1
    bad4[3, 3] = 1
    res = merge_multi_dt([(np.full(shape, 0.1), zeros, bad1),
                          (np.full(shape, 0.4), zeros, bad4)],
                         [1, 4], wind_size=32)
    assert res.invalid[3, 3] and not res.invalid[0, 0]
    assert res.dt_map[3, 3] == 0  # saved files keep validity info

    # invalid base + clean long-dt: the consistency check is waived and
    # the long-dt vector is USED (not rejected against garbage)
    u1g = np.full(shape, 0.1)
    u1g[1, 2] = 9.7  # garbage value under the invalid flag
    b1 = np.zeros(shape)
    b1[1, 2] = 1
    res = merge_multi_dt([(u1g, zeros, b1),
                          (np.full(shape, 0.4), zeros, np.zeros(shape))],
                         [1, 4], wind_size=32)
    assert not res.invalid[1, 2]
    assert res.dt_map[1, 2] == 4 and abs(res.u[1, 2] - 0.1) < 1e-12

    with pytest.raises(ValueError):
        merge_multi_dt([f1], [1, 4], wind_size=32)


@pytest.mark.slow
def test_multidt_reduces_slow_flow_error():
    """0.23 px/frame creeping flow in noisy sparse images: at dt=4 the
    per-separation fit error is divided by 4 (its own sub-pixel bias
    floor caps the realised gain at ~1.7x — asserted honestly)."""
    from torchpiv_tpu.models.multipass import MultipassPIV, PIVConfig
    from torchpiv_tpu.utils.synthetic import particle_pair, render_particles

    rng = np.random.default_rng(42)
    H = W = 256
    n = int(0.008 * H * W)
    xs = rng.uniform(0, W, n)
    ys = rng.uniform(0, H, n)
    inten = rng.uniform(100, 220, n)
    du = 0.23  # px/frame, uniform
    frames = []
    for t in range(5):
        f = render_particles((H, W), xs + du * t, ys, inten)
        f = f + rng.normal(0, 4.0, f.shape).astype(np.float32) + 8
        frames.append(np.clip(f, 0, 255).astype(np.uint8))
    frames = np.stack(frames)

    cfg = PIVConfig(frame_shape=(H, W), wind_size=32, overlap=16,
                    multipass=1)
    mdt = MultiDtPIV(cfg, separations=(1, 4))
    res = mdt(frames, t=0)
    assert isinstance(res, MultiDtResult)
    assert (res.dt_map == 4).mean() > 0.8  # slow flow: long dt everywhere

    import jax
    import jax.numpy as jnp

    u1, v1, bad1 = map(np.asarray, jax.jit(MultipassPIV(cfg))(
        jnp.asarray(frames[0]), jnp.asarray(frames[1])))
    ok = ~res.invalid & ~(bad1 > 0)
    err_multi = np.abs(res.u - du)[ok]
    err_single = np.abs(u1 - du)[ok]
    assert err_multi.mean() < 0.75 * err_single.mean()
    assert err_multi.mean() < 0.025

    with pytest.raises(ValueError):
        mdt(frames, t=2)  # 2 + 4 beyond the 5-frame sequence
    with pytest.raises(ValueError):
        MultiDtPIV(cfg, separations=(0, 2))


@pytest.mark.slow
def test_cli_multidt(tmp_path, capsys):
    import os

    from torchpiv_tpu.cli import main as cli_main
    from torchpiv_tpu.io.decode import imwrite_gray
    from torchpiv_tpu.utils.synthetic import render_particles

    rng = np.random.default_rng(7)
    H = W = 128
    n = int(0.01 * H * W)
    xs = rng.uniform(0, W, n)
    ys = rng.uniform(0, H, n)
    inten = rng.uniform(120, 220, n)
    folder = str(tmp_path / "frames")
    os.makedirs(folder)
    for t in range(4):
        f = render_particles((H, W), xs + 0.2 * t, ys, inten)
        f = np.clip(f + 8, 0, 255).astype(np.uint8)
        imwrite_gray(os.path.join(folder, f"f{t:03d}.bmp"), f)
    out = str(tmp_path / "out")
    rc = cli_main(["multidt", folder, "--separations", "1,2",
                   "--wind-size", "32", "--overlap", "16", "--out", out])
    assert rc == 0
    assert "dt usage" in capsys.readouterr().out
    arr = np.load(os.path.join(out, "multidt_0000.npy"))
    assert arr.shape[0] == 5
    ok = arr[4] > 0  # dt=0 marks invalid windows in the saved file
    assert ok.any()
    assert np.abs(np.median(arr[2][ok]) - 0.2) < 0.05  # px/frame

    # --max-frames below the minimum is an error, not a silent no-op
    rc = cli_main(["multidt", folder, "--separations", "1,2",
                   "--max-frames", "2", "--wind-size", "32",
                   "--overlap", "16"])
    assert rc == 1
