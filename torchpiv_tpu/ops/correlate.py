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


def correlate_fft(
    images_a: jnp.ndarray, images_b: jnp.ndarray, dc_normalize: bool = False,
    phase_filter: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Batched circular cross-correlation via rFFT over the last two dims.

    Peak at the (fftshifted) center means zero displacement.  Mirrors
    reference ``correalte_fft`` (PIVbackend.py:249-257).

    ``dc_normalize`` folds the reference's per-window mean normalisation
    (``batchNormalize``, PIVbackend.py:513-514) into the spectrum product:
    correlation is bilinear, so ``corr(a/mean_a, b/mean_b) ==
    corr(a, b) * w^4 / (A00 * B00)`` with ``A00 = sum(a)`` the DC
    coefficient — one scalar multiply per window instead of materialising a
    normalised copy of the whole window tensor.

    ``phase_filter`` (an ``[n, n//2+1]`` real array) switches the product to
    robust phase correlation (see ``rpc_filter``): the cross-spectrum is
    normalised to unit magnitude per frequency bin, then weighted by the
    filter.  Any per-window scale (so also ``dc_normalize``) cancels.
    """
    fa = jnp.fft.rfft2(images_a)
    fb = jnp.fft.rfft2(images_b)
    prod = jnp.conj(fa) * fb
    if phase_filter is not None:
        prod = _phase_normalize(prod) * phase_filter
    elif dc_normalize:
        n2 = float(images_a.shape[-2] * images_a.shape[-1])
        dc = jnp.real(fa[..., :1, :1]) * jnp.real(fb[..., :1, :1])
        prod = prod * (n2 * n2 / dc)
    corr = jnp.fft.irfft2(prod, s=images_a.shape[-2:])
    return jnp.fft.fftshift(corr, axes=(-2, -1))


def _phase_normalize(prod: jnp.ndarray) -> jnp.ndarray:
    """Cross-spectrum -> unit-magnitude phasors, guarded per window.

    The guard epsilon is RELATIVE to each window's mean spectral magnitude
    (absolute epsilons are meaningless across grey-level scales); bins that
    are structurally zero (e.g. uniform windows) stay zero instead of
    amplifying to unit magnitude.
    """
    mag = jnp.abs(prod)
    eps = 1e-8 * jnp.mean(mag, axis=(-2, -1), keepdims=True) + 1e-30
    return prod / (mag + eps)


@lru_cache(maxsize=8)
def _rpc_filter_np(n: int, diameter: float) -> np.ndarray:
    """[n, n//2+1] spectral energy filter of an ideal Gaussian particle
    image of effective diameter ``diameter`` px (rows full spectrum in
    natural DFT order, columns rfft half spectrum).

    RPC (Eckstein & Vlachos, Meas. Sci. Technol. 19, 2008): phase-only
    correlation whitens the spectrum, turning the correlation peak into a
    delta plus amplified high-frequency noise; weighting the phasors by the
    expected particle-image energy spectrum restores a Gaussian-shaped peak
    (matched filter) while keeping the phase normalisation's robustness to
    illumination and window-overlap bias.  A particle image
    ``exp(-8 r^2 / d^2)`` has energy spectrum ``exp(-omega^2 d^2 / 16)``
    with ``omega = 2 pi k / n``.
    """
    k_row = ((np.arange(n) + n // 2) % n) - n // 2  # signed frequencies
    k_col = np.arange(n // 2 + 1)
    k2 = (k_row.astype(np.float64) ** 2)[:, None] + \
        (k_col.astype(np.float64) ** 2)[None, :]
    w = np.exp(-(np.pi * diameter / n) ** 2 / 4.0 * k2)
    return w.astype(np.float32)


def rpc_filter(n: int, diameter: float = 2.8) -> jnp.ndarray:
    """The RPC spectral filter as a device array (see ``_rpc_filter_np``)."""
    return jnp.asarray(_rpc_filter_np(n, float(diameter)))


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


@lru_cache(maxsize=8)
def _dft_matrices_half(n: int):
    """Half-spectrum (rfft-style) constants for real-input correlation.

    Real windows give a Hermitian spectrum along the transformed axis, so
    only ``h = n//2 + 1`` columns are computed.  ``Mh`` is the
    Hermitian-doubled inverse column transform such that
    ``real(D_half @ Mh) == real(D_full @ Fs.T)`` when ``D_full`` has the
    symmetry ``D[:, j] == conj(D[:, n-j])`` — one matmul at half width
    replaces the full-width complex product.
    """
    h = n // 2 + 1
    F, Fs = _dft_matrices(n)
    F = np.asarray(F, dtype=np.complex64)
    FsT = np.asarray(Fs, dtype=np.complex64).T  # [n, n]
    w = np.ones(h, dtype=np.complex64)
    w[0] = 0.0
    if n % 2 == 0:
        w[h - 1] = 0.0
    Mh = FsT[:h] + w[:, None] * np.conj(FsT[(n - np.arange(h)) % n])
    return F[:, :h].copy(), Mh.astype(np.complex64)


@lru_cache(maxsize=8)
def _complex_parts(n: int):
    """Real/imag planes of the complex DFT operators (f32 numpy), plus the
    precomputed ``real+imag`` sums the Gauss 3-multiplication product needs
    (one operand of every complex matmul in the chain is a constant, so its
    operand sum costs nothing at trace time)."""
    F, Fs = _dft_matrices(n)
    _, Mh = _dft_matrices_half(n)
    f32 = np.float32
    Fr, Fi = np.real(F).astype(f32), np.imag(F).astype(f32)
    Fsr, Fsi = np.real(Fs).astype(f32), np.imag(Fs).astype(f32)
    Mhr, Mhi = np.real(Mh).astype(f32), np.imag(Mh).astype(f32)
    return Fr, Fi, Fr + Fi, Fsr, Fsi, Fsr + Fsi, Mhr, Mhi


def correlate_matmul(
    images_a: jnp.ndarray, images_b: jnp.ndarray, dc_normalize: bool = False,
    precision: str = "high", phase_filter: jnp.ndarray | None = None,
    complex_mm: str = "real",
) -> jnp.ndarray:
    """Cross-correlation with the DFTs computed as dense matmuls on the MXU.

    Mathematically identical to ``correlate_fft`` (up to f32 rounding): the
    transform size is the window (16-64), where a dense ``n^2``-matmul DFT
    runs far faster on the TPU's systolic array than XLA's FFT lowering
    (measured ~6x on the correlation stage).  fftshift is folded into the
    inverse transform matrix.

    ``dc_normalize``: fold the per-window mean normalisation into the
    spectrum product (see ``correlate_fft``) — the scalar multiply fuses
    into the conj-product elementwise op, so the reference's
    ``batchNormalize`` pass over the window tensor disappears entirely.

    ``complex_mm`` selects how the three complex-operand matmul stages
    lower:

    * ``"real"`` (shipped default) — the products written as explicit
      real matmuls, plus a real-part-only final stage (``Dr@Mhr -
      Di@Mhi``): the correlation map is real, and XLA's complex
      expansion does NOT prune the dead imaginary half of the last
      complex product — measured 12.7-12.8 vs 13.1-13.3 ms/pair for
      ``"direct"`` at the headline 4 MP config (two fresh-process
      back-to-back A/Bs, Aug 19), identical products, |du| max
      2.5e-5 px, zero validation-mask flips.
    * ``"direct"`` — ``jnp.matmul`` on complex64 (XLA's own complex
      expansion; the pre-round-5 lowering).
    * ``"gauss"`` — Gauss/Karatsuba 3-multiplication complex products
      (``m1=Br@tr, m2=Bi@ti, m3=(Br+Bi)@(tr+ti)``; real ``m1-m2``, imag
      ``m3-m1-m2``) for the two constant-operand complex stages, plus
      the real-part-only final stage: 10 real matmul-equivalents per
      correlation vs direct's 12-14.  Measured SLOWER than ``"real"``
      (13.13 ms/pair same protocol): the extra elementwise
      adds/cancellations cost more than the one saved MXU pass, and the
      ``m3 - m1 - m2`` imaginary reconstruction loses accuracy where
      ``|imag| << |m1|+|m2|`` (still only 6.8e-5 px max vs direct at
      ``precision="high"``).
    """
    n = images_a.shape[-1]
    F_np, Fs_np = _dft_matrices(n)
    Fh_np, Mh_np = _dft_matrices_half(n)
    F = jnp.asarray(F_np)
    Fs = jnp.asarray(Fs_np)
    Mh = jnp.asarray(Mh_np)
    Fhr = jnp.asarray(np.real(Fh_np).astype(np.float32))
    Fhi = jnp.asarray(np.imag(Fh_np).astype(np.float32))

    # precision='high' = bf16_3x passes (~f32 accuracy, half the cost of
    # 'highest'/bf16_6x on the MXU); parity impact ~1e-6 relative, verified
    # against the FFT path in tests.  'default' = single bf16 pass: window
    # grey levels (<= 255) are bf16-EXACT, only the DFT operator rounds —
    # measured 4.4e-4 px RMS / ~1e-2 px max vs the f32 chain at the
    # headline config (20x inside the 0.01 px parity budget), for ~2/3
    # less MXU work (see PIVConfig.dft_precision).
    def mm(a, b):
        return jnp.matmul(a, b, precision=precision)

    if complex_mm != "direct":
        return _correlate_matmul_real(
            images_a, images_b, mm, dc_normalize, phase_filter, complex_mm)

    def dft2_half(x):
        # Columns first, at half width (real input -> Hermitian spectrum;
        # two real matmuls, no materialised zero-imag plane), then the row
        # transform on the already-halved complex tensor.
        t = jax.lax.complex(mm(x, Fhr), mm(x, Fhi))
        return mm(F, t)

    A = dft2_half(images_a.reshape(-1, n, n).astype(jnp.float32))
    B = dft2_half(images_b.reshape(-1, n, n).astype(jnp.float32))
    C = jnp.conj(A) * B  # inherits the half-spectrum symmetry
    if phase_filter is not None:
        # robust phase correlation: |.|-normalisation and the (symmetric,
        # real) filter both preserve the Hermitian column symmetry the
        # half-spectrum inverse (Mh) relies on; per-window scales (so also
        # dc_normalize) cancel in the normalisation.
        C = _phase_normalize(C) * phase_filter
    elif dc_normalize:
        # mean normalisation as one per-window scalar on the spectrum
        # product: A00 = sum(a), mean_a = A00 / n^2.
        dc = jnp.real(A[..., :1, :1]) * jnp.real(B[..., :1, :1])
        C = C * (float(n * n) ** 2 / dc)
    # inverse: rows at half width, then the Hermitian-doubled column
    # transform recovers the (real) correlation map directly.
    D = mm(Fs, C)
    out = jnp.real(mm(D, Mh))
    return out.reshape(images_a.shape)


def _correlate_matmul_real(
    images_a, images_b, mm, dc_normalize, phase_filter, complex_mm,
):
    """``correlate_matmul``'s explicit-real lowerings ("real" / "gauss").

    Same transform chain as the direct path, with every complex matmul
    hand-expanded over real planes so the matmul count is explicit rather
    than left to XLA's complex expansion; see ``correlate_matmul``'s
    docstring for the variant semantics and the Gauss accuracy caveat.
    """
    n = images_a.shape[-1]
    Fh_np, _ = _dft_matrices_half(n)
    Fhr = jnp.asarray(np.real(Fh_np).astype(np.float32))
    Fhi = jnp.asarray(np.imag(Fh_np).astype(np.float32))
    Fr_np, Fi_np, Fri_np, Fsr_np, Fsi_np, Fsri_np, Mhr_np, Mhi_np = \
        _complex_parts(n)
    Fr, Fi, Fri = map(jnp.asarray, (Fr_np, Fi_np, Fri_np))
    Fsr, Fsi, Fsri = map(jnp.asarray, (Fsr_np, Fsi_np, Fsri_np))
    Mhr, Mhi = jnp.asarray(Mhr_np), jnp.asarray(Mhi_np)

    def cmm(br, bi, bri, xr, xi):
        # (br + i*bi) @ (xr + i*xi) with a CONSTANT left operand.
        if complex_mm == "gauss":
            m1 = mm(br, xr)
            m2 = mm(bi, xi)
            return m1 - m2, mm(bri, xr + xi) - m1 - m2
        return mm(br, xr) - mm(bi, xi), mm(br, xi) + mm(bi, xr)

    def dft2_half(x):
        tr, ti = mm(x, Fhr), mm(x, Fhi)
        return cmm(Fr, Fi, Fri, tr, ti)

    Ar, Ai = dft2_half(images_a.reshape(-1, n, n).astype(jnp.float32))
    Br, Bi = dft2_half(images_b.reshape(-1, n, n).astype(jnp.float32))
    # C = conj(A) * B, elementwise over the half spectrum.
    Cr = Ar * Br + Ai * Bi
    Ci = Ar * Bi - Ai * Br
    if phase_filter is not None:
        C = _phase_normalize(jax.lax.complex(Cr, Ci)) * phase_filter
        Cr, Ci = jnp.real(C), jnp.imag(C)
    elif dc_normalize:
        scale = float(n * n) ** 2 / (Ar[..., :1, :1] * Br[..., :1, :1])
        Cr, Ci = Cr * scale, Ci * scale
    Dr, Di = cmm(Fsr, Fsi, Fsri, Cr, Ci)
    # The correlation map is real: only the real plane of D @ Mh exists.
    out = mm(Dr, Mhr) - mm(Di, Mhi)
    return out.reshape(images_a.shape)


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
