"""Median-family outlier validation tests."""
import numpy as np
import jax
import jax.numpy as jnp

from torchpiv_tpu.models import MultipassPIV, PIVConfig
from torchpiv_tpu.ops.validation import (
    _nanmedian8,
    _neighbors,
    median_test,
    normalized_median_test,
)
from torchpiv_tpu.utils.synthetic import particle_pair


def _ref_nanmedian(stack):
    return np.where(
        np.all(np.isnan(stack), axis=0), 0.0, np.nanmedian(stack, axis=0)
    )


def test_nanmedian8_matches_numpy(rng):
    stack = rng.normal(0, 1, (8, 6, 7))
    stack[rng.random((8, 6, 7)) < 0.3] = np.nan
    ours = np.asarray(_nanmedian8(jnp.asarray(stack)))
    theirs = _ref_nanmedian(stack)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_neighbors_edge_padding():
    f = jnp.arange(12.0).reshape(3, 4)
    nb = np.asarray(_neighbors(f))
    assert nb.shape == (8, 3, 4)
    # corner (0,0) has exactly 3 real neighbours
    assert np.sum(~np.isnan(nb[:, 0, 0])) == 3
    # interior point has all 8
    assert np.sum(~np.isnan(nb[:, 1, 1])) == 8


def test_median_test_flags_spike(rng):
    u = rng.normal(3.0, 0.05, (9, 9))
    v = rng.normal(-1.0, 0.05, (9, 9))
    u[4, 4] = 30.0  # gross outlier
    bad = np.asarray(median_test(jnp.asarray(u), jnp.asarray(v), 2.0))
    assert bad[4, 4]
    assert bad.sum() == 1


def test_normalized_median_flags_spike_in_noisy_field():
    rng = np.random.default_rng(5)
    # gradient field where an absolute threshold would misfire
    yy, xx = np.mgrid[0:15, 0:15].astype(float)
    u = 0.5 * yy + rng.normal(0, 0.05, (15, 15))
    v = 0.2 * xx + rng.normal(0, 0.05, (15, 15))
    u[7, 7] += 5.0
    bad = np.asarray(
        normalized_median_test(jnp.asarray(u), jnp.asarray(v), 2.0)
    )
    assert bad[7, 7]
    # interior of a smooth gradient field: the spike must be the only flag
    # (borders have truncated neighbourhoods and may show a few false hits)
    interior = bad[1:-1, 1:-1]
    assert interior.sum() <= 2
    assert bad.mean() < 0.2


def test_engine_with_median_filter():
    fa, fb = particle_pair((256, 256), displacement=(2.0, 1.0), seed=12)
    cfg = PIVConfig(frame_shape=(256, 256), wind_size=32, overlap=16,
                    multipass=1, median_filter="normmedian")
    u, v, inval = jax.jit(MultipassPIV(cfg))(jnp.asarray(fa), jnp.asarray(fb))
    inval = np.asarray(inval)
    # clean uniform flow: the universal test should flag almost nothing
    assert inval.mean() < 0.1
    # and it composes with peak-ratio validation (mask is a superset)
    cfg0 = PIVConfig(frame_shape=(256, 256), wind_size=32, overlap=16,
                     multipass=1)
    _, _, inval0 = jax.jit(MultipassPIV(cfg0))(jnp.asarray(fa), jnp.asarray(fb))
    assert (inval | np.asarray(inval0)).sum() == inval.sum()
