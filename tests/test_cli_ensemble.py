"""tpiv ensemble: correlation-averaged folder analysis (micro-PIV mode).

Sparse seeding where single-pair analysis mostly fails; the averaged
correlation over many pairs recovers the field (Meinhart et al. 2000).
Beyond the reference (no ensemble mode there).
"""
import os

import numpy as np

from torchpiv_tpu.cli import main as cli_main
from torchpiv_tpu.io.decode import imwrite_gray
from torchpiv_tpu.utils.persistence import load_table
from torchpiv_tpu.utils.synthetic import particle_pair


def _write_sparse_folder(folder, n_pairs=12, disp=(2.0, 1.0),
                         density=0.0012, shape=(128, 128)):
    os.makedirs(folder, exist_ok=True)
    for i in range(n_pairs):
        a, b = particle_pair(shape, displacement=disp, density=density,
                             noise=1.0, seed=300 + i)
        imwrite_gray(os.path.join(folder, f"e{i:03d}_a.bmp"), a)
        imwrite_gray(os.path.join(folder, f"e{i:03d}_b.bmp"), b)


def test_ensemble_recovers_sparse_flow(tmp_path):
    folder = str(tmp_path / "sparse")
    _write_sparse_folder(folder)
    out = str(tmp_path / "out")
    rc = cli_main(["ensemble", folder, "--device", "cpu",
                   "--wind-size", "32", "--overlap", "16",
                   "--batch-size", "5", "--out", out])
    assert rc == 0
    table = load_table(os.path.join(out, "ensemble_field.txt"))
    u = table["Vx[m/s]"]
    v = table["Vy[m/s]"]
    # defaults scale=dt=1: px * 1000; yielded v = -displacement_v
    assert abs(np.mean(u) / 1000 - 2.0) < 0.15
    assert abs(np.mean(v) / 1000 + 1.0) < 0.15


def test_ensemble_beats_per_pair_on_sparse_seeding(tmp_path):
    """The averaged correlation yields far fewer invalid vectors than any
    single sparse pair — the reason the mode exists."""
    import jax
    import jax.numpy as jnp

    from torchpiv_tpu.models import MultipassPIV, PIVConfig
    from torchpiv_tpu.models.ensemble_corr import EnsemblePIV

    shape, disp, density = (128, 128), (2.0, 1.0), 0.0012
    pairs = [particle_pair(shape, displacement=disp, density=density,
                           noise=1.0, seed=300 + i) for i in range(12)]
    cfg = PIVConfig(frame_shape=shape, wind_size=32, overlap=16,
                    multipass=1, use_pallas="off")
    single = MultipassPIV(cfg)
    per_pair_invalid = np.mean([
        np.asarray(jax.jit(single)(jnp.asarray(a), jnp.asarray(b))[2]).mean()
        for a, b in pairs[:4]])

    ens = EnsemblePIV(cfg)
    ba = jnp.asarray(np.stack([a for a, _ in pairs]))
    bb = jnp.asarray(np.stack([b for _, b in pairs]))
    u, v, inval = jax.jit(ens)(ba, bb)
    ens_invalid = np.asarray(inval).mean()
    assert ens_invalid < per_pair_invalid
    assert ens_invalid < 0.15
    valid = ~np.asarray(inval)
    assert abs(np.asarray(u)[valid].mean() - 2.0) < 0.2
    assert abs(np.asarray(v)[valid].mean() - 1.0) < 0.2


def test_ensemble_streaming_matches_one_shot(tmp_path):
    """corr_batch accumulation over chunks + finalize == the one-shot
    EnsemblePIV call (same planes, same fit)."""
    import jax
    import jax.numpy as jnp

    from torchpiv_tpu.models import PIVConfig
    from torchpiv_tpu.models.ensemble_corr import EnsemblePIV

    shape = (96, 96)
    pairs = [particle_pair(shape, displacement=(1.5, -0.5), density=0.004,
                           seed=40 + i) for i in range(6)]
    cfg = PIVConfig(frame_shape=shape, wind_size=32, overlap=16,
                    multipass=1, use_pallas="off")
    ens = EnsemblePIV(cfg)
    ba = jnp.asarray(np.stack([a for a, _ in pairs]))
    bb = jnp.asarray(np.stack([b for _, b in pairs]))
    u1, v1, i1 = jax.jit(ens)(ba, bb)

    csum = jax.jit(ens.corr_batch)(ba[:4], bb[:4])
    csum = csum + jax.jit(ens.corr_batch)(ba[4:], bb[4:])
    u2, v2, i2 = jax.jit(ens.finalize)(csum / 6.0)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_ensemble_cli_empty_folder(tmp_path):
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    assert cli_main(["ensemble", empty, "--device", "cpu"]) == 1
