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


# ---- second-peak fallback (vector-recovery ladder, beyond the reference) --

def test_peakfit_return_second_locates_secondary_peak():
    """return_second fits the second peak with the same estimator."""
    from torchpiv_tpu.ops.peakfit import correlation_to_displacement

    k = 32
    yy, xx = np.mgrid[0:k, 0:k].astype(float)

    def gauss(cy, cx, a, s=1.3):
        return a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))

    c = k // 2
    maps = []
    truths = []
    for (p1, p2) in [(((2.25, 1.5), 1.0), ((-5.0, 6.75), 0.6)),
                     (((0.0, -4.5), 1.0), ((7.5, 7.5), 0.5))]:
        (dy1, dx1), a1 = p1
        (dy2, dx2), a2 = p2
        maps.append(gauss(c + dy1, c + dx1, a1) + gauss(c + dy2, c + dx2, a2))
        truths.append(((dx1, dy1), (dx2, dy2)))
    corr = jnp.asarray(np.stack(maps))
    u, v, inval, (u2, v2) = correlation_to_displacement(
        corr, validate=True, return_second=True)
    for i, ((du1, dv1), (du2t, dv2t)) in enumerate(truths):
        assert abs(float(u[i]) - du1) < 0.05
        assert abs(float(v[i]) - dv1) < 0.05
        assert abs(float(u2[i]) - du2t) < 0.05
        assert abs(float(v2[i]) - dv2t) < 0.05

    import pytest
    with pytest.raises(ValueError):
        correlation_to_displacement(corr, validate=False, return_second=True)


def test_second_peak_acceptance_unit():
    from torchpiv_tpu.ops.validation import second_peak_acceptance

    u = np.full((9, 9), 3.0)
    v = np.full((9, 9), -2.0)
    inval = np.zeros((9, 9), bool)
    inval[4, 4] = True
    # isolated hole in a big valid block
    good = second_peak_acceptance(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(inval),
        jnp.asarray(u + 0.05), jnp.asarray(v - 0.05))
    assert bool(good[4, 4]) and int(np.asarray(good).sum()) == 1
    # inconsistent candidate rejected
    bad = second_peak_acceptance(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(inval),
        jnp.asarray(u + 10.0), jnp.asarray(v))
    assert not np.asarray(bad).any()
    # a hole bigger than BOTH rings cannot self-certify its center
    inval2 = np.zeros((11, 11), bool)
    inval2[1:10, 1:10] = True
    ok2 = second_peak_acceptance(
        jnp.asarray(np.full((11, 11), 3.0)),
        jnp.asarray(np.full((11, 11), -2.0)), jnp.asarray(inval2),
        jnp.asarray(np.full((11, 11), 3.0)),
        jnp.asarray(np.full((11, 11), -2.0)))
    assert not bool(np.asarray(ok2)[5, 5])
    # acceptance is always a subset of the invalid set
    assert not (np.asarray(ok2) & ~inval2).any()


def test_engine_second_peak_fallback_rescues_noise_outliers():
    """Sparse seeding + heavy noise: the recovery ladder turns a good
    fraction of flagged vectors back into real (correct) measurements and
    never touches already-valid vectors."""
    d = (6.0, -4.5)
    fa, fb = particle_pair((512, 512), displacement=d, density=0.0035,
                           noise=14.0, seed=2)
    base = dict(frame_shape=(512, 512), wind_size=64, overlap=32,
                multipass=2, median_filter="normmedian")
    out = {}
    for fb_on in (False, True):
        cfg = PIVConfig(**base, second_peak_fallback=fb_on)
        u, v, inval = jax.jit(MultipassPIV(cfg))(jnp.asarray(fa),
                                                 jnp.asarray(fb))
        out[fb_on] = tuple(map(np.asarray, (u, v, inval)))
    u0, v0, i0 = out[False]
    u1, v1, i1 = out[True]
    rescued = i0 & ~i1
    assert rescued.sum() >= 5, (int(i0.sum()), int(rescued.sum()))
    # no un-rescue: the with-fallback invalid set is a subset
    assert not (i1 & ~i0).any()
    # every rescued vector is a real measurement, not a plausible error
    err = np.hypot(u1 - d[0], v1 - d[1])
    assert (err[rescued] < 1.0).all(), np.sort(err[rescued])[::-1][:5]
    # vectors that were already valid are bit-identical
    assert (u0[~i0] == u1[~i0]).all() and (v0[~i0] == v1[~i0]).all()


def test_second_peak_fallback_config_validation():
    import pytest

    base = dict(frame_shape=(256, 256), wind_size=32, overlap=16)
    with pytest.raises(ValueError):
        PIVConfig(**base, second_peak_fallback=True, validate=False)
    with pytest.raises(ValueError):
        PIVConfig(**base, second_peak_fallback=True, peakfit="pallas")
    with pytest.raises(ValueError):
        PIVConfig(**base, second_peak_fallback=True, fused="split")
    with pytest.raises(ValueError):
        PIVConfig(**base, second_peak_fallback=True, fallback_threshold=0.0)
    # valid combination constructs
    PIVConfig(**base, second_peak_fallback=True, median_filter="normmedian")
