"""Pins the headline claims of docs/ACCURACY.md (reduced protocol: the
committed table uses tools/accuracy_table.py's full 11-point sweep; here a
3-point sweep + one shear pair keep CI time bounded)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torchpiv_tpu.models import MultipassPIV, PIVConfig
from torchpiv_tpu.utils.synthetic import particle_pair, shear_flow

pytestmark = pytest.mark.slow

SHAPE = (512, 512)


def _run(cfg_kw, fa, fb):
    cfg = PIVConfig(frame_shape=SHAPE, wind_size=64, overlap=32,
                    multipass=2, **cfg_kw)
    eng = MultipassPIV(cfg)
    u, v, inval = jax.jit(eng)(jnp.asarray(fa), jnp.asarray(fb))
    x, y = eng.final_coordinates
    u, v, inval = np.asarray(u), np.asarray(v), np.asarray(inval)
    sel = ~inval
    sel[:3] = sel[-3:] = False
    sel[:, :3] = sel[:, -3:] = False
    return u, v, sel, x, y


def test_def_halves_shear_rms_vs_cws():
    """docs/ACCURACY.md row: DEF shear RMS ~0.031 px vs CWS ~0.056 px."""
    du_dy = 0.03
    fa, fb = particle_pair(SHAPE, displacement=shear_flow(1.0, du_dy),
                           density=0.04, seed=400)
    rms = {}
    for mode in ("CWS", "DEF"):
        u, v, sel, x, y = _run(dict(multipass_mode=mode), fa, fb)
        err = u[sel] - (1.0 + du_dy * y[sel])
        rms[mode] = float(np.sqrt(np.mean(err**2)))
    assert rms["DEF"] < 0.045, rms
    assert rms["DEF"] < 0.75 * rms["CWS"], rms


def test_peak_locking_bias_below_budget():
    """docs/ACCURACY.md column 1: max |bias| over the sub-pixel sweep stays
    under 0.05 px for the default config (3-point reduced sweep)."""
    worst = 0.0
    for i, frac in enumerate((0.2, 0.5, 0.8)):
        d = (2.0 + frac, -1.0)
        fa, fb = particle_pair(SHAPE, displacement=d, density=0.04,
                               seed=100 + i)
        u, v, sel, x, y = _run({}, fa, fb)
        worst = max(worst, abs(float(np.mean(u[sel] - d[0]))))
    assert worst < 0.05, worst


def test_smoothing_on_sparse_noisy_flow():
    """Pin the docs/ACCURACY.md post-smoothing claim: on sparse noisy
    seeding, robust GCV smoothn cuts the shear-flow RMS by >=30%."""
    import jax
    import jax.numpy as jnp

    from torchpiv_tpu.models import MultipassPIV, PIVConfig
    from torchpiv_tpu.stats.smoothing import smooth_vector_field
    from torchpiv_tpu.utils.synthetic import particle_pair, shear_flow

    du_dy = 0.03
    flow = shear_flow(1.0, du_dy)
    fa, fb = particle_pair((512, 512), displacement=flow, density=0.01,
                           noise=20.0, seed=400)
    cfg = PIVConfig(frame_shape=(512, 512), wind_size=64, overlap=32,
                    multipass=2)
    eng = MultipassPIV(cfg)
    u, v, inval = map(np.asarray,
                      jax.jit(eng)(jnp.asarray(fa), jnp.asarray(fb)))
    x, y = eng.final_coordinates
    ut = 1.0 + du_dy * y
    sel = ~inval
    sel[:3] = sel[-3:] = False
    sel[:, :3] = sel[:, -3:] = False

    def rms(uu, vv):
        return float(np.sqrt(np.mean((uu[sel] - ut[sel]) ** 2
                                     + vv[sel] ** 2)))

    us, vs = smooth_vector_field(u, v, mask=inval, robust=True)
    assert rms(us, vs) < 0.7 * rms(u, v)


def test_rpc_beats_scc_under_stationary_background():
    """Pin the docs/ACCURACY.md RPC claim: frame-correlated contamination
    (stationary reflections/glare) plants a spurious zero-displacement
    peak in SCC; phase normalisation suppresses it.  Measured (3-seed
    mean, bg amplitude 120): SCC ~0.10 px RMS vs RPC ~0.055 px."""
    from torchpiv_tpu.utils.synthetic import contaminated_pair

    d = (3.3, -2.1)
    rms = {}
    for corr in ("scc", "rpc"):
        errs = []
        for i in range(3):
            fa, fb = contaminated_pair(SHAPE, displacement=d,
                                       bg_amplitude=120.0, density=0.04,
                                       noise=2.0, seed=500 + i)
            u, v, sel, x, y = _run(dict(correlation=corr), fa, fb)
            errs.append(np.sqrt(np.mean((u[sel] - d[0]) ** 2
                                        + (v[sel] - d[1]) ** 2)))
        rms[corr] = float(np.mean(errs))
    assert rms["rpc"] < 0.08, rms
    assert rms["rpc"] < 0.7 * rms["scc"], rms


def test_rpc_clean_image_sanity():
    """RPC on clean images: slightly noisier than SCC (which is the
    matched filter for white noise — why SCC stays the default) but well
    inside the accuracy budget."""
    d = (2.7, -1.3)
    fa, fb = particle_pair(SHAPE, displacement=d, density=0.04, seed=510)
    u, v, sel, x, y = _run(dict(correlation="rpc"), fa, fb)
    err = np.sqrt(np.mean((u[sel] - d[0]) ** 2 + (v[sel] - d[1]) ** 2))
    assert err < 0.08, err
    assert sel.mean() > 0.3  # interior-valid fraction after border trim
