"""Fused whole-pass kernel (experimental/fused_pass.py) parity vs the XLA chain,
in interpret mode on the CPU mesh.  The XLA chain is itself anchored to the
torch reference (test_against_reference.py), so agreement here extends the
parity chain to the fused kernel."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from torchpiv_tpu.experimental.fused_pass import fused_piv_pass
from torchpiv_tpu.kernels.shift_pallas import shift_windows_pallas
from torchpiv_tpu.models import MultipassPIV, PIVConfig
from torchpiv_tpu.ops.correlate import correlate_matmul
from torchpiv_tpu.ops.peakfit import correlation_to_displacement
from torchpiv_tpu.ops.windows import extract_windows
from torchpiv_tpu.utils.synthetic import particle_pair

FS = (128, 128)
W, O = 32, 16
N = ((FS[0] - W) // (W - O) + 1) ** 2


@pytest.fixture(scope="module")
def frames():
    fa, fb = particle_pair(FS, displacement=(2.3, -1.2), seed=3)
    return jnp.asarray(fa), jnp.asarray(fb)


@pytest.fixture(scope="module")
def shifts():
    rng = np.random.default_rng(1)
    return (jnp.asarray(rng.uniform(-3, 3, N), jnp.float32),
            jnp.asarray(rng.uniform(-3, 3, N), jnp.float32))


def _xla_chain(fa, fb, vx, vy):
    aa = shift_windows_pallas(fa.astype(jnp.float32), -vx, -vy,
                              frame_shape=FS, wind_size=W, overlap=O,
                              interpret=True)
    bb = shift_windows_pallas(fb.astype(jnp.float32), vx, vy,
                              frame_shape=FS, wind_size=W, overlap=O,
                              interpret=True)
    return correlation_to_displacement(
        correlate_matmul(aa, bb), True, 1.2, 3, min_subtract=True)


def test_fused_cws_pass_matches_xla_chain(frames, shifts):
    fa, fb = frames
    vx, vy = shifts
    u, v, inval = fused_piv_pass(fa, fb, -vx, -vy, vx, vy, frame_shape=FS,
                                 wind_size=W, overlap=O, interpret=True)
    ru, rv, ri = _xla_chain(fa, fb, vx, vy)
    u, v, inval, ru, rv, ri = map(np.asarray, (u, v, inval, ru, rv, ri))
    assert (inval == ri).all()
    both = ~inval
    assert np.sqrt(np.mean((u[both] - ru[both]) ** 2)) < 1e-4
    assert np.sqrt(np.mean((v[both] - rv[both]) ** 2)) < 1e-4


def test_fused_first_pass_dc_normalize(frames):
    """Zero shifts + dc_normalize reproduce the first pass (extraction +
    batchNormalize + correlate + fit), incl. a non-multiple-of-G n_cols."""
    fa, fb = particle_pair((192, 128), displacement=(3.3, -2.1), seed=5)
    fa, fb = jnp.asarray(fa), jnp.asarray(fb)
    n_rows = (192 - 64) // 32 + 1
    n_cols = (128 - 64) // 32 + 1
    assert n_cols % 2 == 1  # exercises the clamped tail group
    z = jnp.zeros(n_rows * n_cols, jnp.float32)
    u, v, inval = fused_piv_pass(fa, fb, z, z, z, z, frame_shape=(192, 128),
                                 wind_size=64, overlap=32, dc_normalize=True,
                                 interpret=True)
    aa = extract_windows(fa, 64, 32).astype(jnp.float32)
    bb = extract_windows(fb, 64, 32).astype(jnp.float32)
    ru, rv, ri = correlation_to_displacement(
        correlate_matmul(aa, bb, dc_normalize=True), True, 1.2, 3,
        min_subtract=True)
    u, inval, ru, ri = map(np.asarray, (u, inval, ru, ri))
    assert (inval == ri).all()
    both = ~inval
    assert np.sqrt(np.mean((u[both] - np.asarray(ru)[both]) ** 2)) < 1e-4


def test_fused_validate_false(frames, shifts):
    fa, fb = frames
    vx, vy = shifts
    u, v, inval = fused_piv_pass(fa, fb, -vx, -vy, vx, vy, frame_shape=FS,
                                 wind_size=W, overlap=O, validate=False,
                                 interpret=True)
    assert inval is None
    assert np.isfinite(np.asarray(u)).all()


@pytest.mark.parametrize("mode", ["CWS", "DWS"])
def test_engine_fused_matches_unfused(mode):
    """Full 2-pass engine with the fused kernel == the XLA-chain engine."""
    fa, fb = particle_pair((256, 256), displacement=(3.3, -2.1), seed=7)
    base = dict(frame_shape=(256, 256), wind_size=64, overlap=32,
                multipass=2, multipass_mode=mode)
    ref = MultipassPIV(PIVConfig(**base, fused="off"))
    fus = MultipassPIV(PIVConfig(**base, fused="on", pallas_interpret=True))
    ru, rv, ri = map(np.asarray, ref(jnp.asarray(fa), jnp.asarray(fb)))
    fu, fv, fi = map(np.asarray, fus(jnp.asarray(fa), jnp.asarray(fb)))
    agree = fi == ri
    assert agree.mean() > 0.99
    both = ~(fi | ri) & agree
    assert np.sqrt(np.mean((fu[both] - ru[both]) ** 2)) < 1e-3
    assert np.sqrt(np.mean((fv[both] - rv[both]) ** 2)) < 1e-3


def test_corrfit_kernel_matches_xla_chain(frames, shifts):
    """Split-mode pieces: packed shift output + corrfit kernel == XLA chain."""
    from torchpiv_tpu.experimental.fused_pass import (correlate_peakfit_pallas,
                                                 pack_windows)

    fa, fb = frames
    vx, vy = shifts
    n_cols = (FS[1] - W) // (W - O) + 1
    kw = dict(frame_shape=FS, wind_size=W, overlap=O, interpret=True)
    wa = shift_windows_pallas(fa.astype(jnp.float32), -vx, -vy,
                              packed=True, **kw)
    wb = shift_windows_pallas(fb.astype(jnp.float32), vx, vy,
                              packed=True, **kw)
    # the packed layout equals the standard layout repacked
    std = shift_windows_pallas(fa.astype(jnp.float32), -vx, -vy, **kw)
    n_rows = (FS[0] - W) // (W - O) + 1
    assert np.array_equal(np.asarray(wa),
                          np.asarray(pack_windows(std, n_rows, n_cols, W)))
    u, v, inval = correlate_peakfit_pallas(
        wa, wb, wind_size=W, n_cols=n_cols, interpret=True)
    ru, rv, ri = _xla_chain(fa, fb, vx, vy)
    u, v, inval, ru, rv, ri = map(np.asarray, (u, v, inval, ru, rv, ri))
    assert (inval == ri).all()
    both = ~inval
    assert np.sqrt(np.mean((u[both] - ru[both]) ** 2)) < 1e-4
    assert np.sqrt(np.mean((v[both] - rv[both]) ** 2)) < 1e-4


@pytest.mark.parametrize("mode", ["CWS", "DWS", "DEF"])
def test_engine_split_matches_unfused(mode):
    """Full 2-pass engine in split mode (packed Pallas shift + fused
    correlate/peakfit kernel) == the XLA-chain engine, all modes."""
    fa, fb = particle_pair((256, 256), displacement=(3.3, -2.1), seed=7)
    base = dict(frame_shape=(256, 256), wind_size=64, overlap=32,
                multipass=2, multipass_mode=mode)
    # the reference engine uses the same (interpret-mode) Pallas shift/DEF
    # kernels so this test isolates the corrfit-kernel difference only
    ref = MultipassPIV(PIVConfig(**base, fused="off", use_pallas="off",
                                 pallas_interpret=True))
    spl = MultipassPIV(PIVConfig(**base, fused="split",
                                 pallas_interpret=True, use_pallas="off"))
    ru, rv, ri = map(np.asarray, ref(jnp.asarray(fa), jnp.asarray(fb)))
    su, sv, si = map(np.asarray, spl(jnp.asarray(fa), jnp.asarray(fb)))
    assert (si == ri).all()
    both = ~ri
    assert np.abs(su[both] - ru[both]).max() < 1e-4
    assert np.abs(sv[both] - rv[both]).max() < 1e-4


def test_engine_split_validate_false_and_odd_window_fallback():
    """validate=False works in split mode; non-power-of-two windows fall
    back to the XLA chain rather than tracing the packed kernel."""
    fa, fb = particle_pair((200, 200), displacement=(2.0, -1.0), seed=9)
    eng = MultipassPIV(PIVConfig(
        frame_shape=(200, 200), wind_size=64, overlap=32, multipass=2,
        validate=False, fused="split", pallas_interpret=True,
        use_pallas="off"))
    u, v, inval = eng(jnp.asarray(fa), jnp.asarray(fb))
    assert inval is None
    assert np.isfinite(np.asarray(u)).all()
    # w=40 is not a power of two: split must not apply
    eng2 = MultipassPIV(PIVConfig(
        frame_shape=(200, 200), wind_size=40, overlap=20,
        fused="split", pallas_interpret=True, use_pallas="off"))
    assert not eng2._use_split()
    u2, _, _ = eng2(jnp.asarray(fa), jnp.asarray(fb))
    assert np.isfinite(np.asarray(u2)).all()
