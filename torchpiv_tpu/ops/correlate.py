"""FFT cross-correlation of interrogation-window batches.

The hot kernel: ``fftshift(irfft2(conj(rfft2(a)) * rfft2(b)))`` batched over
``[N, win, win]`` — the direct XLA mapping of the reference's correlation core
(/root/reference/src/torchPIV/PIVbackend.py:249-257).  Window sizes are powers
of two (64/32/16) so XLA's TPU FFT runs at full efficiency; everything around
the FFT (normalisation, min-subtraction) fuses into neighbouring elementwise
ops.
"""
from __future__ import annotations

import jax.numpy as jnp


def correlate_fft(images_a: jnp.ndarray, images_b: jnp.ndarray) -> jnp.ndarray:
    """Batched circular cross-correlation via rFFT over the last two dims.

    Peak at the (fftshifted) center means zero displacement.  Mirrors
    reference ``correalte_fft`` (PIVbackend.py:249-257).
    """
    fa = jnp.fft.rfft2(images_a)
    fb = jnp.fft.rfft2(images_b)
    corr = jnp.fft.irfft2(jnp.conj(fa) * fb, s=images_a.shape[-2:])
    return jnp.fft.fftshift(corr, axes=(-2, -1))


def mean_normalize(windows: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Divide each window by its own mean intensity.

    First-pass normalisation (reference PIVbackend.py:513-514; the reference
    computes the mean in float64 — on TPU we use float32, which parity tests
    hold to <0.01 px RMS).
    """
    w = windows.astype(dtype)
    m = jnp.mean(w, axis=(-2, -1), keepdims=True)
    return w / m


def min_subtract(corr: jnp.ndarray) -> jnp.ndarray:
    """Shift each correlation map so its minimum is zero.

    Mirrors the per-window ``corr - amin(corr)`` (reference PIVbackend.py:518,
    :724, :796) so the log-Gaussian peak fit sees strictly positive values
    once the epsilon is added.
    """
    return corr - jnp.min(corr, axis=(-2, -1), keepdims=True)
