"""FFT cross-correlation of interrogation-window batches.

The hot kernel: ``fftshift(irfft2(conj(rfft2(a)) * rfft2(b)))`` batched over
``[N, win, win]`` — the direct XLA mapping of the reference's correlation core
(/root/reference/src/torchPIV/PIVbackend.py:249-257).  Window sizes are powers
of two (64/32/16) so XLA's TPU FFT runs at full efficiency; everything around
the FFT (normalisation, min-subtraction) fuses into neighbouring elementwise
ops.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def correlate_fft(images_a: jnp.ndarray, images_b: jnp.ndarray) -> jnp.ndarray:
    """Batched circular cross-correlation via rFFT over the last two dims.

    Peak at the (fftshifted) center means zero displacement.  Mirrors
    reference ``correalte_fft`` (PIVbackend.py:249-257).
    """
    fa = jnp.fft.rfft2(images_a)
    fb = jnp.fft.rfft2(images_b)
    corr = jnp.fft.irfft2(jnp.conj(fa) * fb, s=images_a.shape[-2:])
    return jnp.fft.fftshift(corr, axes=(-2, -1))


@lru_cache(maxsize=8)
def _dft_matrices(n: int):
    """(F, Fs): forward DFT matrix and inverse-with-fftshift matrix.

    ``DFT2(x) = F @ x @ F.T`` (F is symmetric, so F.T == F) and
    ``fftshift(IDFT2(X)) = Fs @ X @ Fs.T`` — the fftshift is free because the
    circular output shift folds into a per-column phase ``(-1)^k`` of the
    inverse matrix.
    """
    k = np.arange(n)
    F = np.exp(-2j * np.pi * np.outer(k, k) / n).astype(np.complex64)
    Fs = (np.conj(F) * ((-1.0) ** k)[None, :] / n).astype(np.complex64)
    return F, Fs


def correlate_matmul(images_a: jnp.ndarray, images_b: jnp.ndarray) -> jnp.ndarray:
    """Cross-correlation with the DFTs computed as dense matmuls on the MXU.

    Mathematically identical to ``correlate_fft`` (up to f32 rounding): the
    transform size is the window (16-64), where a dense ``n^2``-matmul DFT
    runs far faster on the TPU's systolic array than XLA's FFT lowering
    (measured ~6x on the correlation stage).  fftshift is folded into the
    inverse transform matrix.
    """
    n = images_a.shape[-1]
    F_np, Fs_np = _dft_matrices(n)
    F = jnp.asarray(F_np)
    Fs = jnp.asarray(Fs_np)
    Fr = jnp.asarray(np.real(F_np).astype(np.float32))
    Fi = jnp.asarray(np.imag(F_np).astype(np.float32))

    # precision='high' = bf16_3x passes (~f32 accuracy, half the cost of
    # 'highest'/bf16_6x on the MXU); parity impact ~1e-6 relative, verified
    # against the FFT path in tests.
    def mm(a, b):
        return jnp.matmul(a, b, precision="high")

    def dft2(x):
        # Stage 1 on REAL input as two real matmuls — avoids materialising
        # an explicitly-zero imaginary plane (the f32->c64 convert alone
        # cost ~2.6 ms/pair at 4 MP) and its wasted MXU work.  Stage 2 stays
        # complex64: XLA's complex dot lowering is the fastest variant
        # measured on v5e.
        y = jax.lax.complex(mm(Fr, x), mm(Fi, x))
        return mm(y, F)

    A = dft2(images_a.reshape(-1, n, n).astype(jnp.float32))
    B = dft2(images_b.reshape(-1, n, n).astype(jnp.float32))
    C = jnp.conj(A) * B
    out = mm(mm(Fs, C), Fs.T)
    return jnp.real(out).reshape(images_a.shape)


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
