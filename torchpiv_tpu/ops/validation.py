"""Vector-field outlier validation beyond the reference's peak ratio.

The reference validates solely by the first/second correlation-peak ratio
(PIVbackend.py:346-358, 409-413).  Standard PIV practice additionally
filters the *vector field* itself: the median test and the normalized
median (universal outlier) test of Westerweel & Scarano (Exp. Fluids 39,
2005).  Both are provided here as jit-friendly in-graph ops over the 3x3
neighbourhood and can be enabled on top of peak-ratio validation
(``PIVConfig.median_filter``); parity tests against the reference always
run with them off.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def _neighbors(field: jnp.ndarray) -> jnp.ndarray:
    """Stack of the 8 neighbours of every grid point, edge-padded with NaN
    so border points are judged only against their real neighbours.
    Returns ``[8, rows, cols]``."""
    f = jnp.pad(field, 1, constant_values=jnp.nan)
    shifts = [
        f[:-2, :-2], f[:-2, 1:-1], f[:-2, 2:],
        f[1:-1, :-2], f[1:-1, 2:],
        f[2:, :-2], f[2:, 1:-1], f[2:, 2:],
    ]
    return jnp.stack(shifts)


def _neighbors_ring2(field: jnp.ndarray) -> jnp.ndarray:
    """Stack of the 16 second-ring neighbours (Chebyshev distance 2) of
    every grid point, edge-padded with NaN.  Returns ``[16, rows, cols]``."""
    f = jnp.pad(field, 2, constant_values=jnp.nan)
    R, C = field.shape
    offs = [(di, dj) for di in range(-2, 3) for dj in range(-2, 3)
            if max(abs(di), abs(dj)) == 2]
    return jnp.stack([f[2 + di:2 + di + R, 2 + dj:2 + dj + C]
                      for di, dj in offs])


def _nanmedian8(stack: jnp.ndarray) -> jnp.ndarray:
    """NaN-aware median over the leading axis of an ``[8, ...]`` stack.

    Sorts with NaN pushed to the end (+inf) and picks the middle of the
    valid count — branch-free and jit-friendly.
    """
    n_valid = jnp.sum(~jnp.isnan(stack), axis=0)
    s = jnp.sort(jnp.where(jnp.isnan(stack), jnp.inf, stack), axis=0)
    # indices of the middle pair for the (runtime) valid count
    hi = jnp.maximum(n_valid // 2, 0)
    lo = jnp.maximum((n_valid - 1) // 2, 0)
    idx = jnp.arange(stack.shape[0]).reshape(-1, *([1] * (stack.ndim - 1)))
    take = lambda k: jnp.sum(jnp.where(idx == k[None], s, 0.0), axis=0)
    med = 0.5 * (take(lo) + take(hi))
    return jnp.where(n_valid > 0, med, 0.0)


def median_test(
    u: jnp.ndarray, v: jnp.ndarray, threshold: float = 2.0
) -> jnp.ndarray:
    """Classic median test: flag vectors deviating from the neighbourhood
    median by more than ``threshold`` (in velocity units, both components).
    Returns a bool invalid-mask of the field shape."""
    bad = jnp.zeros(u.shape, bool)
    for f in (u, v):
        med = _nanmedian8(_neighbors(f))
        bad = bad | (jnp.abs(f - med) > threshold)
    return bad

def normalized_median_test(
    u: jnp.ndarray,
    v: jnp.ndarray,
    threshold: float = 2.0,
    eps: float = 0.1,
) -> jnp.ndarray:
    """Universal outlier detection (Westerweel & Scarano 2005).

    ``r = |u - med| / (med(|u_j - med|) + eps)`` over the 3x3 neighbourhood;
    a vector is invalid when ``r > threshold`` in either component.  The
    default threshold 2 and eps 0.1 px are the published universal values.
    """
    bad = jnp.zeros(u.shape, bool)
    for f in (u, v):
        nb = _neighbors(f)
        med = _nanmedian8(nb)
        resid = _nanmedian8(jnp.abs(nb - med[None]))
        r = jnp.abs(f - med) / (resid + eps)
        bad = bad | (r > threshold)
    return bad


def apply_median_filter(
    u: jnp.ndarray,
    v: jnp.ndarray,
    invalid: Optional[jnp.ndarray],
    mode: str,
    threshold: float = 2.0,
) -> jnp.ndarray:
    """Combine the configured median-family test with an existing mask."""
    if mode == "median":
        extra = median_test(u, v, threshold)
    elif mode == "normmedian":
        extra = normalized_median_test(u, v, threshold)
    else:
        raise ValueError(f"unknown median_filter {mode!r}")
    return extra if invalid is None else (invalid | extra)


def second_peak_acceptance(
    u: jnp.ndarray,
    v: jnp.ndarray,
    invalid: jnp.ndarray,
    cand_u: jnp.ndarray,
    cand_v: jnp.ndarray,
    threshold: float = 2.0,
    eps: float = 0.1,
    min_neighbors: int = 5,
) -> jnp.ndarray:
    """Acceptance mask for secondary-peak substitution.

    A candidate vector ``(cand_u, cand_v)`` at an *invalid* site is accepted
    when it is consistent with the surrounding VALID vectors under the
    normalized-median criterion of Westerweel & Scarano (the same form as
    ``normalized_median_test``, with invalid neighbours excluded from the
    statistics): ``|cand - med| / (med(|u_j - med|) + eps) <= threshold``
    for both components, on BOTH the 3x3 ring and the second (Chebyshev
    distance 2) ring, each with at least ``min_neighbors`` valid members —
    so an isolated candidate cannot self-certify.  Returns a bool mask of
    sites to substitute (always a subset of ``invalid``).

    Both strictness levers are measured choices (static-glare + 8-seed
    noise-outlier synthetics): ``min_neighbors=3`` accepts wrong
    candidates inside contaminated regions whose 3x3 statistics are
    corrupted (mean rescued error WORSE than the infill baseline, 7.4 vs
    3.4 px); 5 removes most of those, and the second-ring requirement
    removes the rest (a compact corrupted blob cannot dominate ring 2) —
    zero rescues inside the worst coherently-corrupted glare test, 61%
    recall with zero >1 px mistakes on scattered noise outliers.
    """
    ok = jnp.ones(u.shape, bool)
    for f, c in ((u, cand_u), (v, cand_v)):
        fv = jnp.where(invalid, jnp.nan, f)
        for nb in (_neighbors(fv), _neighbors_ring2(fv)):
            n_valid = jnp.sum(~jnp.isnan(nb), axis=0)
            med = _nanmedian8(nb)
            resid = _nanmedian8(jnp.abs(nb - med[None]))
            r = jnp.abs(c - med) / (resid + eps)
            ok = ok & (r <= threshold) & (n_valid >= min_neighbors)
    return ok & invalid


def velocity_limits_test(
    u: jnp.ndarray,
    v: jnp.ndarray,
    u_limits: Optional[tuple] = None,
    v_limits: Optional[tuple] = None,
) -> jnp.ndarray:
    """Global velocity-limits filter (standard PIV practice, e.g. PIVlab's
    first validation stage; no reference counterpart): flag vectors whose
    components fall outside user-set [min, max] bounds, in the engine's
    pixel-displacement units."""
    bad = jnp.zeros(u.shape, bool)
    if u_limits is not None:
        bad = bad | (u < u_limits[0]) | (u > u_limits[1])
    if v_limits is not None:
        bad = bad | (v < v_limits[0]) | (v > v_limits[1])
    return bad


def global_std_test(
    u: jnp.ndarray,
    v: jnp.ndarray,
    k: float = 5.0,
    invalid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Global mean +- k*sigma filter per component (the classic global
    outlier test), with the statistics computed over currently-VALID
    vectors only so existing outliers cannot inflate sigma."""
    w = (jnp.ones(u.shape) if invalid is None
         else (~invalid).astype(u.dtype))
    n = jnp.maximum(w.sum(), 1.0)

    def bounds(f):
        mean = (w * f).sum() / n
        var = (w * (f - mean) ** 2).sum() / n
        sd = jnp.sqrt(var)
        return mean - k * sd, mean + k * sd

    ulo, uhi = bounds(u)
    vlo, vhi = bounds(v)
    bad = (u < ulo) | (u > uhi) | (v < vlo) | (v > vhi)
    return bad if invalid is None else (invalid | bad)
