"""Experimental SAD (sum-of-absolute-differences) correlators.

The reference ships two unused experimental matchers alongside the FFT
correlator (/root/reference/src/torchPIV/PIVbackend.py:20-81): a separable
"fast SAD" on row/column mean profiles and an FFT-domain SAD approximation
via a cosine/sine Fourier series.  Neither is reachable from its pipeline
(dead code), but they are part of the reference's component surface, so the
TPU build carries jit-friendly equivalents — usable as alternative matchers
for research, not wired into the default multipass path.
"""
from __future__ import annotations

import jax.numpy as jnp


def batch_normalize(windows: jnp.ndarray) -> jnp.ndarray:
    """Per-window min-max normalisation to [0, 1] (reference
    ``batchNormalize``, PIVbackend.py:20-25)."""
    w = windows.astype(jnp.float32)
    lo = jnp.min(w, axis=(-2, -1), keepdims=True)
    w = w - lo
    hi = jnp.max(w, axis=(-2, -1), keepdims=True)
    return w / hi


def fast_sad(images_a: jnp.ndarray, images_b: jnp.ndarray):
    """Separable SAD on row/column mean profiles (reference ``fastSAD``,
    PIVbackend.py:27-55).

    Collapses each window to its column-mean and row-mean 1-D profiles, then
    computes the SAD between B's profile and every cyclic x-/y-placement of
    A's profile in a zero-padded double-width strip.  Returns
    ``(sad_x, sad_y)`` of shape ``[N, n+1]``: the SAD curve over the n+1
    sliding placements (minimum locates the integer displacement).
    """
    a = batch_normalize(images_a)
    b = batch_normalize(images_b)
    n = a.shape[-1]
    m = a.shape[-2]

    def profile_sad(pa, pb, size):
        # pad A's profile into a double-length strip, slide a size-window
        strip = jnp.zeros((pa.shape[0], 2 * size), pa.dtype)
        strip = strip.at[:, size // 2 : size // 2 + size].set(pa)
        # windows of length `size` at offsets 0..size -> [N, size+1, size]
        idx = jnp.arange(size + 1)[:, None] + jnp.arange(size)[None, :]
        windows = strip[:, idx]
        return jnp.sum(jnp.abs(pb[:, None, :] - windows), axis=-1)

    aa_x = jnp.mean(a, axis=-2)
    bb_x = jnp.mean(b, axis=-2)
    aa_y = jnp.mean(a, axis=-1)
    bb_y = jnp.mean(b, axis=-1)
    return profile_sad(aa_x, bb_x, n), profile_sad(aa_y, bb_y, m)


def sad_fft(images_a: jnp.ndarray, images_b: jnp.ndarray, p: int = 5) -> jnp.ndarray:
    """FFT-domain SAD approximation via a Fourier cosine/sine series
    (reference ``sadFFTReal``, PIVbackend.py:57-81).

    |x - y| expands in odd harmonics of cos/sin cross-terms; each term is a
    circular correlation computed in the spectral domain.  Returns the
    fftshifted accumulated map ``[N, h, w]`` whose *minimum* locates the
    displacement.
    """
    a = batch_normalize(images_a)
    b = batch_normalize(images_b)
    acc = None
    for i in range(1, p + 1):
        base = 2 * i - 1
        sa = a * base
        sb = b * base
        term = (
            jnp.conj(jnp.fft.rfft2(jnp.cos(sa))) * jnp.fft.rfft2(jnp.cos(sb))
            + jnp.conj(jnp.fft.rfft2(jnp.sin(sa))) * jnp.fft.rfft2(jnp.sin(sb))
        ) / base**2
        acc = term if acc is None else acc + term
    out = jnp.fft.irfft2(acc, s=a.shape[-2:])
    return jnp.fft.fftshift(out, axes=(-2, -1))
