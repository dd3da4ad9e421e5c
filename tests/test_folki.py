"""Dense Lucas-Kanade PIV (models/folki.py) on canonical flows."""
import numpy as np
import pytest

from torchpiv_tpu.models.folki import FolkiPIV, folki_flow
from torchpiv_tpu.utils.synthetic import particle_pair


@pytest.fixture(scope="module")
def fp():
    return FolkiPIV((256, 256), wind_size=32, overlap=16)


def test_uniform_flow_dense_and_grid(fp):
    fa, fb = particle_pair((256, 256), displacement=(3.3, -2.1), seed=1,
                           density=0.05, noise=1.0)
    import jax.numpy as jnp

    u, v = map(np.asarray, folki_flow(jnp.asarray(fa), jnp.asarray(fb)))
    assert np.abs(u[24:-24, 24:-24] - 3.3).mean() < 0.03
    assert np.abs(v[24:-24, 24:-24] + 2.1).mean() < 0.03
    ug, vg, bad = fp(fa, fb)
    assert np.abs(ug[2:-2, 2:-2] - 3.3).mean() < 0.03
    assert bad.mean() < 0.2


def test_shear_and_vortex_accuracy(fp):
    gx, gy = fp.coordinates

    def shear(xs, ys):
        return 1.0 + 0.03 * ys, np.zeros_like(xs)

    fa, fb = particle_pair((256, 256), displacement=shear, seed=2,
                           density=0.05, noise=1.0)
    ug, vg, bad = fp(fa, fb)
    err = (ug - (1.0 + 0.03 * gy))[2:-2, 2:-2]
    assert np.sqrt((err**2).mean()) < 0.05

    def vort(xs, ys):
        return -0.015 * (ys - 128), 0.015 * (xs - 128)

    fa, fb = particle_pair((256, 256), displacement=vort, seed=3,
                           density=0.05, noise=1.0)
    ug, vg, bad = fp(fa, fb)
    err = (ug - (-0.015 * (gy - 128)))[2:-2, 2:-2]
    assert np.sqrt((err**2).mean()) < 0.03


def test_blank_regions_flagged(fp):
    fa, fb = particle_pair((256, 256), displacement=(2.0, 0.0), seed=4,
                           density=0.05, noise=0.5)
    fa = fa.copy()
    fb = fb.copy()
    fa[:, :128] = 8  # left half: no particles at all
    fb[:, :128] = 8
    ug, vg, bad = fp(fa, fb)
    gx, gy = fp.coordinates
    left = gx < 100
    right = gx > 156
    assert bad[left].mean() > 0.8   # no signal -> flagged
    assert bad[right].mean() < 0.3  # seeded half still fine


def test_correlation_engine_wins_beyond_capture_range():
    """Honesty pin: the pyramid's capture range (~2^levels px) is dense
    LK's hard limit — at 12 px displacement it flags most windows and is
    several times worse than correlation on the survivors, which is why
    the multipass engine remains the default.  (At SMALL displacements
    the texture-weighted plane fit keeps LK competitive even at sparse
    seeding — also pinned.)"""
    import jax
    import jax.numpy as jnp

    from torchpiv_tpu.models.multipass import MultipassPIV, PIVConfig

    cfg = PIVConfig(frame_shape=(256, 256), wind_size=64, overlap=32,
                    multipass=2)  # final pass 32/16 = folki grid
    corr = jax.jit(MultipassPIV(cfg))
    fp = FolkiPIV((256, 256), wind_size=32, overlap=16)

    # beyond capture range: correlation wins decisively
    fa, fb = particle_pair((256, 256), displacement=(12.0, -6.0), seed=5,
                           density=0.02, noise=2.0)
    uf, vf, badf = fp(fa, fb)
    uc, vc, badc = map(np.asarray, corr(jnp.asarray(fa), jnp.asarray(fb)))
    ok = (badc == 0) & ~badf
    ok[:2] = ok[-2:] = ok[:, :2] = ok[:, -2:] = False
    assert badf.mean() > 0.3  # LK itself reports the failure
    assert np.abs(uc - 12.0)[ok].mean() < 0.5 * np.abs(uf - 12.0)[ok].mean()

    # small displacement, sparse seeding: LK stays competitive
    fa, fb = particle_pair((256, 256), displacement=(3.3, -2.1), seed=6,
                           density=0.003, noise=2.0)
    uf, vf, badf = fp(fa, fb)
    uc, vc, badc = map(np.asarray, corr(jnp.asarray(fa), jnp.asarray(fb)))
    ok = (badc == 0) & ~badf
    ok[:2] = ok[-2:] = ok[:, :2] = ok[:, -2:] = False
    assert ok.sum() > 20
    assert np.abs(uf - 3.3)[ok].mean() < 1.5 * np.abs(uc - 3.3)[ok].mean()


def test_folki_validation_errors():
    import jax.numpy as jnp

    with pytest.raises(ValueError):
        folki_flow(jnp.zeros((130, 128), jnp.uint8),
                   jnp.zeros((130, 128), jnp.uint8), levels=3)


def test_cli_dense(tmp_path):
    import os

    from torchpiv_tpu.cli import main as cli_main
    from torchpiv_tpu.io.decode import imwrite_gray
    from torchpiv_tpu.utils.persistence import load_table

    fa, fb = particle_pair((256, 256), displacement=(2.0, -1.0), seed=6,
                           density=0.05, noise=1.0)
    folder = str(tmp_path / "frames")
    os.makedirs(folder)
    imwrite_gray(os.path.join(folder, "p0_a.bmp"), fa)
    imwrite_gray(os.path.join(folder, "p0_b.bmp"), fb)
    out = str(tmp_path / "out")
    assert cli_main(["dense", folder, "--out", out]) == 0
    t = load_table(os.path.join(out, "dense_0000.txt"))
    inner = np.s_[2:-2, 2:-2]
    # pipeline contract: defaults scale=dt=1 -> px*1000, Vy sign-flipped
    assert abs(np.median(t["Vx[m/s]"][inner]) / 1000 - 2.0) < 0.05
    assert abs(np.median(t["Vy[m/s]"][inner]) / 1000 - 1.0) < 0.05


def test_hybrid_predictor_corrector():
    """Correlation-anchored LK refinement: on dense seeding it reaches
    plain-LK accuracy while the anchor restores the capture range."""
    import jax
    import jax.numpy as jnp

    from torchpiv_tpu.models.multipass import MultipassPIV, PIVConfig
    from torchpiv_tpu.utils.synthetic import shear_flow

    SHAPE = (512, 512)
    cfg = PIVConfig(frame_shape=SHAPE, wind_size=64, overlap=32,
                    multipass=2)
    hyb = FolkiPIV(SHAPE, wind_size=32, overlap=16, piv_config=cfg)
    corr = jax.jit(MultipassPIV(cfg))
    gx, gy = hyb.coordinates
    inner = np.zeros(gx.shape, bool)
    inner[3:-3, 3:-3] = True

    fa, fb = particle_pair(SHAPE, displacement=shear_flow(1.0, 0.03),
                           seed=1, density=0.04)
    tru = 1.0 + 0.03 * gy
    uh, vh, bh = hyb(fa, fb)
    uc, vc, bc = map(np.asarray, corr(jnp.asarray(fa), jnp.asarray(fb)))
    rms_h = np.sqrt(np.mean((uh - tru)[inner] ** 2))
    rms_c = np.sqrt(np.mean((uc - tru)[inner & (bc == 0)] ** 2))
    assert rms_h < 0.5 * rms_c  # measured ~0.009 vs 0.055

    # beyond LK's own capture range the anchor keeps it working
    fa, fb = particle_pair(SHAPE, displacement=(12.0, -6.0), seed=2,
                           density=0.02, noise=2.0)
    uh, vh, bh = hyb(fa, fb)
    assert np.abs(np.median(uh[inner]) - 12.0) < 0.1

    with pytest.raises(ValueError):
        FolkiPIV(SHAPE, wind_size=64, overlap=32, piv_config=cfg)
    with pytest.raises(ValueError):
        FolkiPIV((128, 128), piv_config=cfg)


def test_cli_dense_hybrid(tmp_path):
    import os

    from torchpiv_tpu.cli import main as cli_main
    from torchpiv_tpu.io.decode import imwrite_gray
    from torchpiv_tpu.utils.persistence import load_table

    # displacement beyond plain LK's capture range: only works --hybrid
    fa, fb = particle_pair((256, 256), displacement=(11.0, 0.0), seed=8,
                           density=0.03, noise=1.0)
    folder = str(tmp_path / "frames")
    os.makedirs(folder)
    imwrite_gray(os.path.join(folder, "p0_a.bmp"), fa)
    imwrite_gray(os.path.join(folder, "p0_b.bmp"), fb)
    out = str(tmp_path / "out")
    assert cli_main(["dense", folder, "--hybrid", "--out", out]) == 0
    t = load_table(os.path.join(out, "dense_0000.txt"))
    assert abs(np.median(t["Vx[m/s]"][2:-2, 2:-2]) / 1000 - 11.0) < 0.1
