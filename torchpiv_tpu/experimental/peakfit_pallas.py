"""Fused Pallas peak-fit kernel: argmax + 3-point Gaussian fit + peak-ratio
validation in one pass over VMEM-resident correlation maps.

The XLA path (`ops.peakfit`) materialises several ``[N, d*k]`` index/mask
tensors in HBM (argmax, neighbour gathers, the second-peak exclusion mask) —
~6 HBM passes over the correlation tensor.  This kernel loads a block of
correlation maps into VMEM once and computes everything with 2-D masked
reductions:

* first peak: ``m = min(flat_iota where x == max(x))`` — the *first* maximal
  flat index, exactly like the reference's argmax tie-breaking;
* neighbour values: ``value_at(i) = max(where(flat_iota == i, x, -inf))`` —
  a reduction instead of a gather (single-position mask);
* second peak: the closed-form flat-offset exclusion neighbourhood of
  ``ops.peakfit`` evaluated in-register.

Semantics identical to ``ops.correlation_to_displacement`` (which itself
mirrors reference PIVbackend.py:346-422); parity-tested in interpret mode
and against the XLA path.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-7


def _peakfit_kernel(
    corr_ref, u_ref, v_ref, inval_ref, *,
    d: int, k: int, validate: bool, val_ratio: float, vw: int,
    min_subtract: bool,
):
    x = corr_ref[...]  # [B, d, k]
    B = x.shape[0]
    kd = k * d
    fdt = x.dtype

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (1, d, k), 1)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (1, d, k), 2)
    flat = r_iota * k + c_iota  # [1, d, k]

    def max2(t):  # Mosaic crashes on multi-axis reductions; chain them
        return jnp.max(jnp.max(t, axis=2, keepdims=True), axis=1, keepdims=True)

    def min2(t):
        return jnp.min(jnp.min(t, axis=2, keepdims=True), axis=1, keepdims=True)

    if min_subtract:
        # fold the reference's per-window `corr - amin(corr)` in here so the
        # correlation tensor makes one HBM round-trip fewer
        x = x - min2(x)
    x = x + EPS

    cm = max2(x)  # [B,1,1]
    big = jnp.int32(kd)
    # first maximal flat index (reference argmax takes the first occurrence)
    m = min2(jnp.where(x >= cm, flat, big))

    def value_at(idx):  # [B,1,1] flat index -> [B,1,1] value
        return max2(jnp.where(flat == idx, x, 0.0))

    # flat-index neighbours with the reference's edge replacement
    left = jnp.where(m + 1 >= kd - 1, m, m + 1)
    right = jnp.where(m - 1 <= 0, m, m - 1)
    top = jnp.where(m + k >= kd - 1, m, m + k)
    bot = jnp.where(m - k <= 0, m, m - k)

    cl = value_at(left)
    cr = value_at(right)
    ct = value_at(top)
    cb = value_at(bot)

    lcm, lcl, lcr, lct, lcb = (jnp.log(c) for c in (cm, cl, cr, ct, cb))
    du = (lcr - lcl) / (2.0 * (lcl + lcr) - 4.0 * lcm)
    dv = (lcb - lct) / (2.0 * (lcb + lct) - 4.0 * lcm)

    row = (m // d).astype(fdt)  # maps are square (d == k)
    col = (m % k).astype(fdt)
    u = jnp.nan_to_num(col + du - (k // 2))
    v = jnp.nan_to_num(row + dv - (d // 2))
    # Everything stays rank-3: Mosaic's layout inference crashes on
    # rank-reducing reshapes/squeezes, so the outputs are [B, 1, 1] blocks.
    u_ref[...] = u
    v_ref[...] = v

    if validate:
        dd = flat - m  # [B, d, k]
        j = jnp.round(dd.astype(fdt) / k).astype(jnp.int32)
        excl = (jnp.abs(j) <= vw) & (jnp.abs(dd - k * j) <= vw)
        lo = (m - (vw + k * vw)) < 0
        hi = (m + (vw + k * vw)) > kd - 1
        excl = excl | ((flat == 0) & lo) | ((flat == kd - 1) & hi)
        c2 = max2(jnp.where(excl, 0.0, x))
        invalid = (cm / c2) < val_ratio
        degenerate = (
            (left >= kd - 1) & (right <= 0) & (top >= kd - 1) & (bot <= 0)
        )
        invalid = invalid | degenerate
        inval_ref[...] = invalid.astype(fdt)
    else:
        inval_ref[...] = jnp.zeros((B, 1, 1), fdt)


@functools.partial(
    jax.jit,
    static_argnames=("validate", "val_ratio", "validation_window",
                     "block", "interpret", "min_subtract"),
)
def correlation_to_displacement_pallas(
    corr: jnp.ndarray,
    validate: bool = True,
    val_ratio: float = 1.2,
    validation_window: int = 3,
    block: Optional[int] = None,
    interpret: bool = False,
    min_subtract: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Drop-in fused version of ``ops.correlation_to_displacement``.

    With ``min_subtract`` the kernel also applies the reference's per-window
    min subtraction (pass it the raw correlation and skip
    ``ops.min_subtract``).  Returns ``(u, v, invalid)`` flat ``[N]`` arrays
    (invalid is None when ``validate`` is False).
    """
    n, d, k = corr.shape
    if block is None:
        # Mosaic keeps 30+ block-sized live intermediates on the VMEM stack
        # (measured: 17.3 MB scoped usage at block*d*k*4 = 512 KB); cap the
        # block tensor at ~384 KB.
        block = max(8, min(128, (384 << 10) // (d * k * 4) // 8 * 8))
    npad = -(-n // block) * block
    x = corr.astype(jnp.float32)
    if npad != n:
        # pad with constant maps (peak at 0, fit degenerates to nan->0)
        x = jnp.concatenate(
            [x, jnp.ones((npad - n, d, k), x.dtype)], axis=0
        )

    kernel = functools.partial(
        _peakfit_kernel, d=d, k=k, validate=validate,
        val_ratio=val_ratio, vw=validation_window,
        min_subtract=min_subtract,
    )
    out_sds = jax.ShapeDtypeStruct((npad, 1, 1), jnp.float32)
    u, v, inval = pl.pallas_call(
        kernel,
        grid=(npad // block,),
        in_specs=[
            pl.BlockSpec((block, d, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 3,
        out_shape=[out_sds] * 3,
        interpret=interpret,
    )(x)
    u, v, inval = u[:n, 0, 0], v[:n, 0, 0], inval[:n, 0, 0]
    return u, v, (inval > 0.5) if validate else None
