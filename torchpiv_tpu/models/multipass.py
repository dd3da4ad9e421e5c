"""The fused multipass PIV graph — the flagship "model" of the framework.

One jitted XLA program maps a pair of raw uint8 frames to the final
displacement field: first pass (window extraction, mean normalisation, FFT
correlation, sub-pixel peak fit + validation) followed by N-1 refinement
passes (in-graph spline predictor upsample as matmuls, CWS/DWS window
shifting, correlation, peak fit, anti-divergence guards).  No host round-trip
anywhere — this removes the reference's per-pass GPU<->CPU ping-pong
(/root/reference/src/torchPIV/PIVbackend.py:690-740, where every pass runs
scipy splines and guard masks on the host between torch kernels).

Pass semantics mirror the reference exactly:

* first pass: per-window mean normalisation, min-subtracted correlation,
  validated peak fit (``extended_search_area_piv``, PIVbackend.py:459-520);
* CWS pass: half-shift computed from the *pre-validation-zeroed* predictor
  (reference computes u2 = u0/2 before zeroing, :705-713), symmetric ±u/2
  bilinear shifts, total ``u = 2*(u0/2) + du`` (:728-729);
* DWS pass: predictor zeroed *before* halving/rounding (:779-786), integer
  shifts, total ``u = 2*rint(u0/2) + du`` (:800-801);
* anti-divergence guard: revert to the (zeroed) predictor where
  ``du > u0 and rint(u0) > 0`` or where the window failed validation
  (:731-738).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.correlate import correlate_fft, correlate_matmul, rpc_filter
from ..ops.geometry import get_coordinates, get_field_shape
from ..ops.infill import fused_infill
from ..ops.peakfit import correlation_to_displacement
from ..ops.shifts import (
    bicubic_cws_shift,
    cws_shift,
    dws_shift,
    per_window_origins,
)
from ..ops.spline import upsample_matrices
from ..ops.windows import extract_windows


@dataclasses.dataclass(frozen=True)
class PIVConfig:
    """Static configuration of a multipass run (trace-time constants)."""

    frame_shape: Tuple[int, int]
    wind_size: int = 64
    overlap: int = 32
    multipass: int = 1
    multipass_mode: str = "CWS"  # "CWS" | "DWS" | "DEF" (deforming windows)
    multipass_scale: float = 2.0
    validate: bool = True
    val_ratio: float = 1.2
    validation_window: int = 3
    infill: str = "host"  # "host" (exact, after device) | "fused" (in-graph) | "none"
    dtype: str = "float32"
    # Pallas shift kernel: "auto" uses it on TPU backends only.  The kernel
    # clamps shifts to max_shift (default wind//2) and uses per-window scalar
    # frac weights; with edge_exact (default) it samples a flat-wrap padded
    # frame so the reference's flat-index frame-edge addressing is
    # reproduced exactly.
    use_pallas: str = "auto"  # "auto" | "on" | "off"
    pallas_interpret: bool = False
    edge_exact: bool = True
    max_shift: Optional[int] = None
    # shift-kernel variant: "rolls" (f32 band) | "bf16" (half-width band,
    # two row phases, i32-bitcast rotates) | "phases" (16-phase bf16 table)
    shift_variant: str = "rolls"
    # How the kernels' per-window shift maps reach SMEM: "rows" streams a
    # (1, n_cols) block per grid step (any vector-grid size compiles);
    # "prefetch" is the legacy whole-array scalar prefetch, which overflows
    # the 1 MB SMEM at >=255x255 grids (kept for A/B timing; rolls/bicubic/
    # DEF kernels only — experimental shift variants always use prefetch).
    shift_maps: str = "rows"  # "rows" | "prefetch"
    # "matmul" computes the window DFTs as dense MXU matmuls (fastest on
    # TPU, ~1e-6 relative difference vs FFT); "fft" uses jnp.fft; "auto"
    # picks matmul on TPU backends.
    correlator: str = "auto"  # "auto" | "fft" | "matmul"
    # "xla" (default) lowers the peak fit with XLA; "pallas" uses the fused
    # kernel (bit-exact, currently slower in-graph on v5e — see _peakfit).
    peakfit: str = "xla"  # "xla" | "pallas"
    # Sub-pixel estimator: "gauss3" (reference parity: two independent
    # 3-point log-Gaussian axis fits) | "gauss2d" (9-point log-paraboloid
    # least squares — models the cross term, reducing bias on
    # elliptical/tilted peaks; beyond the reference, XLA peak fit only).
    subpixel: str = "gauss3"  # "gauss3" | "gauss2d"
    # MXU pass count for the DFT matmuls (ops.correlate.correlate_matmul).
    # "high" (default) = bf16_3x (~f32-accurate): measured worst single
    # vector 3.0e-4 px / RMS 8.7e-6 px vs the bf16_6x chain over 16 seeds
    # (uniform + shear) at the headline 4 MP config, zero validation-mask
    # flips — the shipped default IS the parity configuration (VERDICT r4
    # item 3).  "default" = single bf16 pass: grey levels are bf16-exact
    # and only the DFT operator rounds, worth ~-1.8 ms/pair — but the
    # worst single vector reaches 3.1e-2 px (same 16-seed sweep), outside
    # the 0.01 px per-vector budget: opt in only when throughput matters
    # more than single-vector accuracy.  "highest" = bf16_6x.  A per-pass
    # "mixed" scheme (final pass high, earlier bf16) is a measured dead
    # end: pass-1 bf16 predictor error flips discrete decisions (the
    # anti-divergence guard's du > u0 comparison, CWS integer-crossing),
    # so its worst vector (3.3e-2 px) is no better than "default" while
    # costing nearly as much as "high" (tools/precision_ab.py, Aug 19;
    # docs/ROADMAP.md ledger).
    dft_precision: str = "high"  # "default" | "high" | "highest"
    # Lowering of the correlator's complex-operand matmul stages
    # (ops.correlate.correlate_matmul): "real" (default) = explicit
    # real-plane matmuls + real-part-only inverse tail — the correlation
    # map is real, and XLA's complex expansion does NOT prune the dead
    # imaginary half of the last complex product (measured: 12.7-12.8 vs
    # direct's 13.1-13.3 ms/pair at the headline config in two fresh
    # processes, identical products, |du| max 2.5e-5 px, zero mask
    # flips).  "direct" = jnp.matmul on complex64 (XLA's own expansion).
    # "gauss" = 3-multiplication complex products on the constant-operand
    # stages — measured SLOWER than "real" (13.13 ms/pair) despite one
    # fewer matmul: the extra elementwise adds/cancellations cost more
    # than the saved MXU pass (docs/ROADMAP.md, Aug 19).
    complex_mm: str = "real"  # "real" | "direct" | "gauss"
    # Pass-fusion strategy (experimental/fused_pass.py).  Both fusion modes are
    # measured reference points that LOSE to the XLA chain on v5e ("auto"
    # resolves to off; see docs/ROADMAP.md "pass fusion attempts"):
    #   "split" — packed-layout Pallas shift + fused correlate+peakfit
    #     kernel (no HBM correlation maps, no XLA layout copies), but the
    #     per-group matmul/fit chains are latency-bound in one kernel while
    #     XLA batches the DFT matmuls over all 16k windows at once.
    #   "on" — the whole pass (extraction included) in ONE Pallas kernel;
    #     extraction is dynamic-roll-bound with no big stores to hide under.
    fused: str = "auto"  # "auto" (= off) | "split" | "on" | "off"
    # Optional vector-field outlier test on top of the reference's
    # peak-ratio validation (applied after the final pass, in-graph):
    # None (reference parity) | "median" | "normmedian" (Westerweel-Scarano).
    median_filter: Optional[str] = None
    median_threshold: float = 2.0
    # Global validators (standard PIV practice, no reference counterpart;
    # applied after the final pass, before the median filter, in the
    # engine's pixel-displacement units): component [min, max] bounds and
    # a mean +- k*sigma test over currently-valid vectors.
    u_limits: Optional[Tuple[float, float]] = None
    v_limits: Optional[Tuple[float, float]] = None
    global_std: Optional[float] = None
    # CWS/DEF resampling kernel: "bilinear" (reference parity) or
    # "bicubic" (cubic convolution a=-0.5 — the capability of the
    # reference's dead piv_iteration_CWS_Fast, PIVbackend.py:599-675;
    # XLA gather path, quality mode).
    cws_interp: str = "bilinear"  # "bilinear" | "bicubic"
    # DEF Pallas kernel per-pixel residual margin M (kernels/def_pallas.py):
    # deformations steeper than ~2*M/wind_size px/px saturate.  Larger M =
    # more accumulation terms ((2M+2)^2) = slower kernel.  The exact XLA
    # dense-gather path remains available via use_pallas="off" (two orders
    # of magnitude slower at 4 MP on TPU).
    def_margin: int = 2
    # Optional sub-window weighting before correlation (beyond the
    # reference): "gaussian" multiplies each window by a separable Gaussian
    # (sigma = wind/4), the standard anti-leakage taper — reduces the bias
    # from particles entering/leaving the window.  Weighted windows use the
    # explicit mean normalisation (the DC-fold shortcut assumes unweighted
    # windows) and the XLA chain (fused kernel rejects the combination).
    window_weight: Optional[str] = None
    # Correlation estimator (beyond the reference, which is SCC-only):
    #   "scc" — standard cross-correlation (reference parity);
    #   "rpc" — robust phase correlation (Eckstein & Vlachos 2008): the
    #     cross-spectrum is normalised to unit magnitude per frequency bin
    #     and weighted by the energy spectrum of an ideal Gaussian particle
    #     image of diameter ``rpc_diameter`` px (matched filter).  Robust
    #     to broadband image noise and illumination; an elementwise insert
    #     on the spectrum product in the XLA chain (ops/correlate.py), so
    #     it composes with every pass mode — the experimental fused-pass
    #     kernels reject it.
    correlation: str = "scc"  # "scc" | "rpc"
    rpc_diameter: float = 2.8
    # Vector-recovery ladder (beyond the reference; standard
    # production-PIV practice, e.g. PIVlab's revalidation + secondary-peak
    # substitution): after the final pass and all validators, each invalid
    # site tries (1) the vector already in place (ambiguous peak-ratio
    # windows are usually correct) and (2) the displacement fit at the
    # SECOND correlation peak; a candidate is accepted only when it passes
    # a normalized-median test against >=5 VALID neighbours (threshold
    # ``fallback_threshold``, Westerweel-Scarano form) and the configured
    # velocity limits.  Rescued vectors are marked valid, so they
    # contribute real measurements where infill would otherwise
    # interpolate.  Measured: 63-71% of noise-induced outliers recovered
    # with zero >1 px mistakes; contaminated regions with corrupted
    # neighbour statistics are (correctly) left to infill.  Runs in the
    # XLA peak-fit chain only.
    second_peak_fallback: bool = False
    fallback_threshold: float = 2.0
    # Pass-1 window-extraction assembly (ops/windows.py, divisible-stride
    # path; both bit-identical): "stack" transposes the assembled WINDOW
    # tensor (~4x frame bytes at 50% overlap); "tilemajor" transposes the
    # FRAME to tile-major first and stacks straight into window order.
    # A/B lever for the measured ~0.59 ms/pair pass-1 transpose
    # (docs/ROADMAP.md round-4 levers).
    extract_variant: str = "stack"  # "stack" | "tilemajor"

    def pass_schedule(self) -> List[Tuple[int, int]]:
        """Per-pass (wind_size, overlap), shrunk by int floor-division per
        pass exactly like the reference constructor (PIVbackend.py:853-858)."""
        sched = [(self.wind_size, self.overlap)]
        w, o = self.wind_size, self.overlap
        for _ in range(self.multipass - 1):
            w = int(w // self.multipass_scale)
            o = int(o // self.multipass_scale)
            sched.append((w, o))
        return sched

    def __post_init__(self):
        if self.overlap >= self.wind_size:
            raise ValueError("Overlap has to be smaller than the window_size")
        H, W = self.frame_shape
        if self.wind_size > H or self.wind_size > W:
            raise ValueError("window size cannot be larger than the image")
        if self.multipass_mode not in ("CWS", "DWS", "DEF"):
            raise ValueError(f"unknown multipass_mode {self.multipass_mode!r}")
        if self.infill not in ("host", "fused", "none"):
            # must be closed: the pipelines gate the host NaN+infill tail
            # on infill == "host", so an unrecognized value would silently
            # disable validation output instead of erroring
            raise ValueError(f"unknown infill {self.infill!r}")
        if self.use_pallas not in ("auto", "on", "off"):
            raise ValueError(f"unknown use_pallas {self.use_pallas!r}")
        if self.fused not in ("auto", "split", "on", "off"):
            raise ValueError(f"unknown fused {self.fused!r}")
        if self.window_weight not in (None, "gaussian"):
            raise ValueError(f"unknown window_weight {self.window_weight!r}")
        if self.cws_interp not in ("bilinear", "bicubic"):
            raise ValueError(f"unknown cws_interp {self.cws_interp!r}")
        if self.window_weight is not None and self.fused == "on":
            raise ValueError("window_weight is not supported by the fused "
                             "pass kernel; use fused='off'")
        if self.correlator not in ("auto", "fft", "matmul"):
            raise ValueError(f"unknown correlator {self.correlator!r}")
        if self.correlation not in ("scc", "rpc"):
            raise ValueError(f"unknown correlation {self.correlation!r}")
        if self.correlation == "rpc":
            if self.fused in ("split", "on"):
                raise ValueError("correlation='rpc' runs in the XLA chain; "
                                 "the fused pass kernels do not support it "
                                 "(use fused='off')")
            if not self.rpc_diameter > 0:
                raise ValueError("rpc_diameter must be a positive particle "
                                 "image diameter in px")
        if self.second_peak_fallback:
            if not self.validate:
                raise ValueError("second_peak_fallback requires validate="
                                 "True (the candidate comes from the "
                                 "validation's second-peak search)")
            if self.peakfit == "pallas":
                raise ValueError("second_peak_fallback runs in the XLA "
                                 "peak-fit chain; use peakfit='xla'")
            if self.fused in ("split", "on"):
                raise ValueError("second_peak_fallback is not supported by "
                                 "the fused pass kernels (use fused='off')")
            if not self.fallback_threshold > 0:
                raise ValueError("fallback_threshold must be positive")
        if self.dft_precision not in ("default", "high", "highest"):
            raise ValueError(f"unknown dft_precision {self.dft_precision!r}")
        if self.complex_mm not in ("direct", "real", "gauss"):
            raise ValueError(f"unknown complex_mm {self.complex_mm!r}")
        if self.subpixel not in ("gauss3", "gauss2d"):
            raise ValueError(f"unknown subpixel {self.subpixel!r}")
        if self.subpixel != "gauss3" and self.peakfit == "pallas":
            raise ValueError("subpixel='gauss2d' requires peakfit='xla'")
        if self.extract_variant not in ("stack", "tilemajor"):
            raise ValueError(
                f"unknown extract_variant {self.extract_variant!r}")
        if self.shift_maps not in ("rows", "prefetch"):
            raise ValueError(f"unknown shift_maps {self.shift_maps!r}")
        if not 1 <= self.def_margin <= 8:
            raise ValueError("def_margin must be in [1, 8]")
        for name, lim in (("u_limits", self.u_limits),
                          ("v_limits", self.v_limits)):
            if lim is not None and (len(lim) != 2 or not lim[0] < lim[1]):
                raise ValueError(f"{name} must be (min, max) with min < max")
        if self.global_std is not None and self.global_std <= 0:
            raise ValueError("global_std must be a positive sigma multiple")
        for p, (w, o) in enumerate(self.pass_schedule()):
            # the reference would crash obscurely when the //scale schedule
            # shrinks a window to nothing (PIVbackend.py:855-857)
            if w < 4 or o >= w or o < 0:
                raise ValueError(
                    f"pass {p + 1} degenerates to window {w}, overlap {o} — "
                    f"reduce multipass/multipass_scale"
                )


class MultipassPIV:
    """Builds and applies the fused multipass graph for one frame shape.

    The instance precomputes all static per-pass constants (grids, window
    origins, spline upsample operators); ``__call__`` is a pure jittable
    function ``(frame_a, frame_b) -> (u, v, invalid)`` over 2-D uint8 frames
    returning final-pass fields of shape ``(n_rows, n_cols)``.  Use
    ``jax.vmap`` over a leading pair axis for batched throughput.
    """

    def __init__(
        self,
        config: PIVConfig,
        frame_mask: Optional[np.ndarray] = None,
        mask_threshold: float = 0.5,
    ):
        self.config = config
        self.schedule = config.pass_schedule()
        H, W = config.frame_shape

        self.coords = [get_coordinates((H, W), w, o) for w, o in self.schedule]
        self.field_shapes = [get_field_shape((H, W), w, o) for w, o in self.schedule]
        self.origins = [per_window_origins((H, W), w, o) for w, o in self.schedule]

        # Static region-of-interest mask (beyond the reference): ``True``
        # marks excluded pixels (walls, model surfaces).  Masked pixels are
        # zeroed before window extraction so they cannot bias the
        # correlation of straddling windows, and any window whose masked
        # fraction reaches ``mask_threshold`` is flagged invalid on every
        # pass (its displacement forced to 0 so the predictor upsample
        # cannot leak garbage into neighbours).  Downstream, masked windows
        # behave exactly like validation failures: infill fills them and
        # ``inval`` reports them.
        self.frame_mask = None
        self.window_masked: List[Optional[np.ndarray]] = [
            None for _ in self.schedule]
        if frame_mask is not None:
            if not 0.0 <= mask_threshold <= 1.0:
                raise ValueError("mask_threshold must be in [0, 1]")
            fm = np.asarray(frame_mask).astype(bool)
            if fm.shape != (H, W):
                raise ValueError(
                    f"frame_mask shape {fm.shape} != frame {config.frame_shape}")
            self.frame_mask = fm
            ii = np.zeros((H + 1, W + 1), np.int64)
            ii[1:, 1:] = fm.astype(np.int64).cumsum(0).cumsum(1)
            for p, (w, o) in enumerate(self.schedule):
                r0, c0 = self.origins[p]
                cnt = (ii[r0 + w, c0 + w] - ii[r0, c0 + w]
                       - ii[r0 + w, c0] + ii[r0, c0])
                # threshold 0 means "any masked pixel", not "every window"
                need = max(1, int(np.ceil(mask_threshold * w * w)))
                self.window_masked[p] = (
                    cnt >= need
                ).reshape(self.field_shapes[p])

        # Spline upsample operators between consecutive pass grids.
        self.upsamplers = []
        for p in range(1, len(self.schedule)):
            x0, y0 = self.coords[p - 1]
            x1, y1 = self.coords[p]
            Ay, Ax = upsample_matrices(y0[:, 0], x0[0, :], y1[:, 0], x1[0, :])
            dt = jnp.dtype(config.dtype)
            self.upsamplers.append((jnp.asarray(Ay, dt), jnp.asarray(Ax, dt)))

    def _masked_frame(self, frame):
        """Zero the excluded pixels (no-op without a mask)."""
        if self.frame_mask is None:
            return frame
        return jnp.where(jnp.asarray(self.frame_mask),
                         jnp.zeros((), frame.dtype), frame)

    def _apply_window_mask(self, p, u, v, inval):
        """Force pass-p masked windows invalid with zero displacement."""
        if self.window_masked[p] is None:
            return u, v, inval
        m = jnp.asarray(self.window_masked[p])
        u = jnp.where(m, 0.0, u)
        v = jnp.where(m, 0.0, v)
        inval = m if inval is None else (inval | m)
        return u, v, inval

    def _correlate(self, aa, bb, dc_normalize=False):
        """Raw circular cross-correlation (min subtraction happens in
        ``_peakfit`` so the fused kernel can fold it in; ``dc_normalize``
        folds the first-pass mean normalisation into the spectrum product).

        ``correlation="rpc"`` swaps the spectrum product for robust phase
        correlation (unit-magnitude phasors x matched Gaussian filter) —
        an elementwise insert between the forward and inverse transforms
        in either correlator backend."""
        cfg = self.config
        pf = None
        if cfg.correlation == "rpc":
            pf = rpc_filter(aa.shape[-1], cfg.rpc_diameter)
        c = cfg.correlator
        if c == "matmul" or (c == "auto" and jax.default_backend() == "tpu"):
            return correlate_matmul(aa, bb, dc_normalize,
                                    precision=cfg.dft_precision,
                                    phase_filter=pf,
                                    complex_mm=cfg.complex_mm)
        return correlate_fft(aa, bb, dc_normalize, phase_filter=pf)

    def _peakfit(self, corr, validate, want_second=False):
        """Min-subtraction + sub-pixel fit + validation on raw corr maps.
        ``want_second`` additionally returns the second-peak candidate
        displacements (XLA chain only — config validation guarantees the
        Pallas peak fit is never combined with the fallback)."""
        cfg = self.config
        if not want_second and (cfg.peakfit == "pallas" or (
            cfg.pallas_interpret and cfg.peakfit != "xla"
        )):
            from ..experimental.peakfit_pallas import (
                correlation_to_displacement_pallas,
            )

            return correlation_to_displacement_pallas(
                corr, validate, cfg.val_ratio, cfg.validation_window,
                interpret=cfg.pallas_interpret, min_subtract=True,
            )
        return correlation_to_displacement(
            corr, validate, cfg.val_ratio, cfg.validation_window,
            min_subtract=True, fit=cfg.subpixel,
            return_second=want_second,
        )

    def _use_pallas(self) -> bool:
        cfg = self.config
        if cfg.use_pallas == "on":
            return True
        if cfg.use_pallas == "off":
            return False
        return jax.default_backend() == "tpu"

    def _window_store_dtype(self):
        """Element type the shift/DEF kernels should store windows in.

        bfloat16 when the consumer is the single-pass bf16 DFT
        (``dft_precision="default"`` on the matmul correlator): the kernel
        blend still computes in f32 and only the store rounds — the SAME
        rounding the correlator's bf16 matmul pass would apply, so results
        are bit-identical while the kernel's HBM store traffic (its
        measured floor) halves.  f32 whenever anything consumes the
        windows at higher precision (3/6-pass DFT, FFT correlator, window
        weighting)."""
        cfg = self.config
        c = cfg.correlator
        matmul = c == "matmul" or (
            c == "auto" and jax.default_backend() == "tpu")
        if (matmul and cfg.dft_precision == "default"
                and cfg.window_weight is None):
            return jnp.bfloat16
        return jnp.float32

    def _use_fused(self) -> bool:
        """Whole-pass fused kernel applicability (CWS/DWS shifts with the
        reference's flat-index edge semantics).  Only "on" forces it: the
        monolithic kernel measures slower than the split pipeline on v5e
        (extraction-bound; see PIVConfig.fused / docs/ROADMAP.md)."""
        cfg = self.config
        if cfg.fused != "on" or not cfg.edge_exact:
            return False
        return (cfg.window_weight is None and cfg.cws_interp == "bilinear"
                and cfg.subpixel == "gauss3")

    def _use_split(self) -> bool:
        """Split pass-fusion applicability: packed Pallas shift + fused
        correlate/peak-fit kernel (``fused_pass.correlate_peakfit_pallas``).
        Opt-in only ("split"): measured SLOWER than the XLA chain on v5e —
        the per-group matmul/fit chains are latency-bound in one kernel,
        while XLA batches the DFT matmuls over all windows at once (see
        docs/ROADMAP.md "pass fusion attempts")."""
        cfg = self.config
        if cfg.window_weight is not None:
            return False  # weights apply after the shift; XLA chain handles
        # the lane-packed group layout needs power-of-two windows <= 128
        # (G = 128//w whole windows per vreg; the fit's suffix/propagate
        # trees assume power-of-two block widths)
        if not all(4 <= w <= 128 and (w & (w - 1)) == 0
                   for w, _ in self.schedule):
            return False
        return cfg.fused == "split" and cfg.subpixel == "gauss3"

    def _corrfit(self, p, wa, wb, validate, dc_normalize=False):
        """Fused correlate+peakfit over lane-packed windows (split mode)."""
        from ..experimental.fused_pass import correlate_peakfit_pallas

        cfg = self.config
        w, o = self.schedule[p]
        n_rows, n_cols = self.field_shapes[p]
        return correlate_peakfit_pallas(
            wa, wb,
            wind_size=w,
            n_cols=n_cols,
            validate=validate,
            val_ratio=cfg.val_ratio,
            validation_window=cfg.validation_window,
            dc_normalize=dc_normalize,
            interpret=cfg.pallas_interpret,
        )

    def _pack(self, windows, p):
        """[N, w, w] windows -> the lane-packed corrfit layout (XLA)."""
        from ..experimental.fused_pass import pack_windows

        w, o = self.schedule[p]
        n_rows, n_cols = self.field_shapes[p]
        return pack_windows(windows, n_rows, n_cols, w)

    def _shift_packed(self, p, frame, vel_x, vel_y, dt, mode):
        """Shifted windows in the lane-packed layout: straight from the
        Pallas shift kernel when available (zero layout copies), otherwise
        via the XLA shift + repack."""
        cfg = self.config
        w, o = self.schedule[p]
        if (self._use_pallas() or cfg.pallas_interpret) and \
                cfg.shift_variant == "rolls" and cfg.cws_interp == "bilinear":
            from ..kernels.shift_pallas import shift_windows_pallas

            return shift_windows_pallas(
                frame.astype(dt),
                vel_x.astype(dt),
                vel_y.astype(dt),
                frame_shape=cfg.frame_shape,
                wind_size=w,
                overlap=o,
                max_shift=cfg.max_shift,
                interpret=cfg.pallas_interpret,
                flat_wrap=cfg.edge_exact,
                packed=True,
                maps=cfg.shift_maps,
            )
        if mode == "DWS":
            vel_x = vel_x.astype(jnp.int32)
            vel_y = vel_y.astype(jnp.int32)
        return self._pack(self._shift(p, frame, vel_x, vel_y, dt, mode), p)

    def _window_weight(self, p):
        """Static separable Gaussian taper for pass p (None when off)."""
        cfg = self.config
        if cfg.window_weight is None:
            return None
        w = self.schedule[p][0]
        x = (np.arange(w) - (w - 1) / 2.0) / (w / 4.0)
        g = np.exp(-0.5 * x * x).astype(np.float32)
        return jnp.asarray(np.outer(g, g))

    def _fused_pass(self, p, frame_a, frame_b, vxa, vya, vxb, vyb,
                    dc_normalize):
        """Run pass p through the fused kernel; returns flat (u, v, inval)."""
        from ..experimental.fused_pass import fused_piv_pass

        cfg = self.config
        w, o = self.schedule[p]
        return fused_piv_pass(
            frame_a, frame_b, vxa, vya, vxb, vyb,
            frame_shape=cfg.frame_shape,
            wind_size=w,
            overlap=o,
            validate=cfg.validate,
            val_ratio=cfg.val_ratio,
            validation_window=cfg.validation_window,
            max_shift=cfg.max_shift,
            dc_normalize=dc_normalize,
            interpret=cfg.pallas_interpret,
        )

    def _shift(self, p, frame, vel_x, vel_y, dt, mode):
        """Shifted window extraction for pass p: Pallas fast path (with
        flat-wrap padding for exact reference edge semantics) or pure XLA
        fallback."""
        cfg = self.config
        w, o = self.schedule[p]
        row0w, col0w = self.origins[p]

        def xla_shift(r0, c0, vx, vy):
            if mode == "CWS":
                if cfg.cws_interp == "bicubic":
                    return bicubic_cws_shift(frame, r0, c0, w, vx, vy, dt)
                return cws_shift(frame, r0, c0, w, vx, vy, dt)
            return dws_shift(frame, r0, c0, w, vx, vy, dt)

        if not (self._use_pallas() or cfg.pallas_interpret):
            return xla_shift(jnp.asarray(row0w), jnp.asarray(col0w), vel_x, vel_y)

        bicubic = mode == "CWS" and cfg.cws_interp == "bicubic"
        from ..kernels.shift_pallas import (shift_pallas_supported,
                                            shift_windows_pallas)

        if (bicubic and cfg.shift_variant != "rolls") or \
                not shift_pallas_supported(
                    w, "bicubic" if bicubic else "bilinear"):
            # the bicubic kernel exists only for the plain rolls variant,
            # and windows beyond the kernel's 256-lane block (w > 128, or
            # w > 125 bicubic) must take the XLA shift path
            return xla_shift(jnp.asarray(row0w), jnp.asarray(col0w),
                             vel_x, vel_y)

        # edge_exact -> flat_wrap padding inside the kernel reproduces the
        # reference's flat-index frame-edge addressing exactly (no separate
        # gather needed); otherwise tiles clamp to the frame rectangle.
        return shift_windows_pallas(
            frame.astype(dt),
            vel_x.astype(dt),
            vel_y.astype(dt),
            frame_shape=cfg.frame_shape,
            wind_size=w,
            overlap=o,
            max_shift=cfg.max_shift,
            interpret=cfg.pallas_interpret,
            flat_wrap=cfg.edge_exact,
            variant=cfg.shift_variant,
            interp="bicubic" if bicubic else "bilinear",
            out_dtype=(self._window_store_dtype()
                       if cfg.shift_variant == "rolls" else jnp.float32),
            maps=cfg.shift_maps,
        )

    # -- public static info ------------------------------------------------
    @property
    def final_coordinates(self) -> Tuple[np.ndarray, np.ndarray]:
        """(x, y) window-center pixel coordinates of the final pass."""
        return self.coords[-1]

    @property
    def final_field_shape(self) -> Tuple[int, int]:
        return self.field_shapes[-1]

    # -- the graph ----------------------------------------------------------
    def first_pass(self, frame_a: jnp.ndarray, frame_b: jnp.ndarray,
                   want_second: bool = False):
        """Zero-order pass (reference ``extended_search_area_piv``).
        ``want_second`` (single-pass runs with the second-peak fallback)
        appends the candidate displacement fields to the return."""
        cfg = self.config
        w, o = self.schedule[0]
        n_rows, n_cols = self.field_shapes[0]
        dt = jnp.dtype(cfg.dtype)
        frame_a = self._masked_frame(frame_a)
        frame_b = self._masked_frame(frame_b)

        # Pass 1 through the fused kernel only when forced: at w=64 the
        # XLA chain (reshape-assembled windows + DC-normalised matmul DFTs)
        # measures faster than the fused kernel's per-window extraction.
        if self._use_fused() and cfg.fused == "on":
            # whole pass in one Pallas kernel (zero shifts = plain
            # extraction; dc_normalize = reference batchNormalize)
            z = jnp.zeros(n_rows * n_cols, jnp.float32)
            u, v, inval = self._fused_pass(
                0, frame_a, frame_b, z, z, z, z, dc_normalize=True)
        elif self._use_split():
            # reshape-assembled windows -> lane-packed -> fused
            # correlate+peakfit kernel (mean normalisation via the DC fold)
            aa = self._pack(
                extract_windows(frame_a, w, o, cfg.extract_variant)
                .astype(dt), 0)
            bb = self._pack(
                extract_windows(frame_b, w, o, cfg.extract_variant)
                .astype(dt), 0)
            u, v, inval = self._corrfit(
                0, aa, bb, cfg.validate, dc_normalize=True)
        else:
            # Mean normalisation (reference batchNormalize,
            # PIVbackend.py:513) is folded into the correlator's spectrum
            # product (dc_normalize): bilinearity makes it one scalar per
            # window there, instead of a full read+write pass over the
            # window tensor here.
            aa = extract_windows(frame_a, w, o, cfg.extract_variant).astype(dt)
            bb = extract_windows(frame_b, w, o, cfg.extract_variant).astype(dt)
            wgt = self._window_weight(0)
            if wgt is None:
                corr = self._correlate(aa, bb, dc_normalize=True)
            else:
                # weighting needs the explicit normalisation (the DC fold
                # assumes unweighted windows)
                from ..ops.correlate import mean_normalize

                aa = mean_normalize(aa, dt) * wgt
                bb = mean_normalize(bb, dt) * wgt
                corr = self._correlate(aa, bb)
            if want_second:
                u, v, inval, (cu, cv) = self._peakfit(
                    corr, cfg.validate, want_second=True)
            else:
                u, v, inval = self._peakfit(corr, cfg.validate)
        u = u.reshape(n_rows, n_cols)
        v = v.reshape(n_rows, n_cols)
        if inval is not None:
            inval = inval.reshape(n_rows, n_cols)
        u, v, inval = self._apply_window_mask(0, u, v, inval)
        if want_second:
            return u, v, inval, (cu.reshape(n_rows, n_cols),
                                 cv.reshape(n_rows, n_cols))
        return u, v, inval

    def _refine_pass(self, p, frame_a, frame_b, u, v, inval,
                     want_second=False):
        """One CWS/DWS refinement pass from grid p-1 to grid p, in-graph.
        ``want_second`` (final pass with the second-peak fallback) appends
        the candidate displacement fields ``2*u_half + du2`` to the
        return."""
        cfg = self.config
        w, o = self.schedule[p]
        n_rows, n_cols = self.field_shapes[p]
        dt = jnp.dtype(cfg.dtype)
        Ay, Ax = self.upsamplers[p - 1]

        # In-graph spline predictor upsample (two matmuls on the MXU).
        # precision='highest' is essential: the TPU default (bf16 inputs)
        # perturbs the predictor by ~1e-2 px, which flips integer-crossing
        # decisions in the CWS resampler and wrecks sub-pixel parity.
        def up(field):
            return jnp.matmul(
                jnp.matmul(Ay, field.astype(dt), precision="highest"),
                Ax.T,
                precision="highest",
            )

        frame_a = self._masked_frame(frame_a)
        frame_b = self._masked_frame(frame_b)
        u0 = up(u)
        v0 = up(v)

        # "validate" drives the peak-ratio test inside the pass; an inval
        # field can exist without it (frame_mask with validate=False), and
        # either way it zeroes the predictor like the reference does.
        validate = self.config.validate
        if inval is not None:
            val0 = up(inval) >= 0.5

        fused_result = None
        if cfg.multipass_mode == "CWS":
            # Half-shift from the PRE-zeroed predictor (reference :705-713).
            u2 = u0 / 2.0
            v2 = v0 / 2.0
            if inval is not None:
                u0 = jnp.where(val0, 0.0, u0)
                v0 = jnp.where(val0, 0.0, v0)
            if self._use_fused():
                fused_result = self._fused_pass(
                    p, frame_a, frame_b,
                    -u2.reshape(-1), -v2.reshape(-1),
                    u2.reshape(-1), v2.reshape(-1), dc_normalize=False)
            elif self._use_split() and cfg.cws_interp == "bilinear":
                wa = self._shift_packed(
                    p, frame_a, -u2.reshape(-1), -v2.reshape(-1), dt, "CWS")
                wb = self._shift_packed(
                    p, frame_b, u2.reshape(-1), v2.reshape(-1), dt, "CWS")
                fused_result = self._corrfit(p, wa, wb, validate)
            else:
                aa = self._shift(p, frame_a, -u2.reshape(-1), -v2.reshape(-1), dt, "CWS")
                bb = self._shift(p, frame_b, u2.reshape(-1), v2.reshape(-1), dt, "CWS")
        elif cfg.multipass_mode == "DEF":
            # Window deformation (Scarano 2002, beyond the reference): each
            # window is resampled with a locally-linearised displacement
            # field — the per-window half shift plus its spatial gradient
            # across the window, symmetric between frames.  Eliminates the
            # gradient bias of pure-translation CWS in shear/rotation.
            u2 = u0 / 2.0
            v2 = v0 / 2.0
            if inval is not None:
                u0 = jnp.where(val0, 0.0, u0)
                v0 = jnp.where(val0, 0.0, v0)
            step = w - o
            dudy, dudx = jnp.gradient(u2, step, step)
            dvdy, dvdx = jnp.gradient(v2, step, step)
            from ..kernels.def_pallas import (def_pallas_supported,
                                              def_windows_pallas)

            if (self._use_pallas() or cfg.pallas_interpret) and \
                    def_pallas_supported(w, cfg.def_margin, cfg.cws_interp):
                # Pallas DEF kernel: exact per-pixel bilinear (or Keys
                # bicubic) via a static shift table — the XLA dense-gather
                # path below measures ~1.1 s/pair (bilinear) / ~4.4 s/pair
                # (bicubic) at 4 MP on v5e (kernels/def_pallas.py).  Windows
                # beyond the kernel's 256-lane block fall through to XLA.

                kw = dict(
                    frame_shape=cfg.frame_shape, wind_size=w, overlap=o,
                    max_shift=cfg.max_shift, margin=cfg.def_margin,
                    interpret=cfg.pallas_interpret, flat_wrap=cfg.edge_exact,
                    interp=cfg.cws_interp,
                    out_dtype=self._window_store_dtype(),
                    maps=cfg.shift_maps,
                )

                def flatg(x):
                    return x.reshape(-1)

                aa = def_windows_pallas(
                    frame_a.astype(dt), -flatg(u2), -flatg(v2),
                    -flatg(dudx), -flatg(dudy), -flatg(dvdx), -flatg(dvdy),
                    **kw)
                bb = def_windows_pallas(
                    frame_b.astype(dt), flatg(u2), flatg(v2),
                    flatg(dudx), flatg(dudy), flatg(dvdx), flatg(dvdy),
                    **kw)
            else:
                off = jnp.arange(w, dtype=dt) - (w - 1) / 2.0
                n_w = n_rows * n_cols

                def dense(center, gx_, gy_):
                    return (
                        center.reshape(n_w, 1, 1)
                        + gx_.reshape(n_w, 1, 1) * off[None, None, :]
                        + gy_.reshape(n_w, 1, 1) * off[None, :, None]
                    )

                du_d = dense(u2, dudx, dudy)
                dv_d = dense(v2, dvdx, dvdy)
                row0w, col0w = self.origins[p]
                resample = (bicubic_cws_shift if cfg.cws_interp == "bicubic"
                            else cws_shift)
                aa = resample(frame_a, jnp.asarray(row0w),
                              jnp.asarray(col0w), w, -du_d, -dv_d, dt)
                bb = resample(frame_b, jnp.asarray(row0w),
                              jnp.asarray(col0w), w, du_d, dv_d, dt)
        else:  # DWS: predictor zeroed BEFORE rounding (reference :779-786)
            if inval is not None:
                u0 = jnp.where(val0, 0.0, u0)
                v0 = jnp.where(val0, 0.0, v0)
            u2 = jnp.rint(u0 / 2.0)
            v2 = jnp.rint(v0 / 2.0)
            if self._use_fused():
                # integer-valued floats: the kernel's fractional blend
                # degenerates to the pure integer tile copy (DWS semantics)
                fused_result = self._fused_pass(
                    p, frame_a, frame_b,
                    -u2.reshape(-1), -v2.reshape(-1),
                    u2.reshape(-1), v2.reshape(-1), dc_normalize=False)
            elif self._use_split():
                wa = self._shift_packed(
                    p, frame_a, -u2.reshape(-1), -v2.reshape(-1), dt, "DWS")
                wb = self._shift_packed(
                    p, frame_b, u2.reshape(-1), v2.reshape(-1), dt, "DWS")
                fused_result = self._corrfit(p, wa, wb, validate)
            else:
                ui = u2.reshape(-1).astype(jnp.int32)
                vi = v2.reshape(-1).astype(jnp.int32)
                aa = self._shift(p, frame_a, -ui, -vi, dt, "DWS")
                bb = self._shift(p, frame_b, ui, vi, dt, "DWS")

        cand = None
        if fused_result is not None:
            du, dv, new_inval = fused_result
        else:
            wgt = self._window_weight(p)
            if wgt is not None:
                aa = aa * wgt
                bb = bb * wgt
            if self._use_split() and wgt is None:
                # DEF / bicubic windows: repack and use the fused
                # correlate+peakfit kernel for the rest of the pass
                du, dv, new_inval = self._corrfit(
                    p, self._pack(aa, p), self._pack(bb, p), validate)
            elif want_second:
                corr = self._correlate(aa, bb)
                du, dv, new_inval, (du2, dv2) = self._peakfit(
                    corr, validate, want_second=True)
                # candidate total = the same half-shift the primary fit
                # refines, plus the second-peak residual fit
                cand = (2.0 * u2 + du2.reshape(n_rows, n_cols),
                        2.0 * v2 + dv2.reshape(n_rows, n_cols))
            else:
                corr = self._correlate(aa, bb)
                du, dv, new_inval = self._peakfit(corr, validate)
        du = du.reshape(n_rows, n_cols)
        dv = dv.reshape(n_rows, n_cols)
        if new_inval is not None:
            new_inval = new_inval.reshape(n_rows, n_cols)

        u_new = 2.0 * u2 + du
        v_new = 2.0 * v2 + dv

        # Anti-divergence guards (reference :731-738).
        mask_u = (du > u0) & (jnp.rint(u0) > 0)
        mask_v = (dv > v0) & (jnp.rint(v0) > 0)
        if new_inval is not None:
            mask_u = mask_u | new_inval
            mask_v = mask_v | new_inval
        u = jnp.where(mask_u, u0, u_new)
        v = jnp.where(mask_v, v0, v_new)
        u, v, new_inval = self._apply_window_mask(p, u, v, new_inval)
        if want_second:
            return u, v, new_inval, cand
        return u, v, new_inval

    def _apply_global_filters(self, u, v, inval):
        """Velocity-limits + global mean +- k*sigma tests (PIVConfig
        ``u_limits``/``v_limits``/``global_std``); static-ROI windows are
        excluded from the sigma statistics via ``inval``."""
        cfg = self.config
        if cfg.u_limits is not None or cfg.v_limits is not None:
            from ..ops.validation import velocity_limits_test

            extra = velocity_limits_test(u, v, cfg.u_limits, cfg.v_limits)
            inval = extra if inval is None else (inval | extra)
        if cfg.global_std is not None:
            from ..ops.validation import global_std_test

            inval = global_std_test(u, v, cfg.global_std, inval)
        return inval

    def __call__(self, frame_a: jnp.ndarray, frame_b: jnp.ndarray):
        """Full multipass: raw frames -> (u, v, invalid) on the final grid."""
        cfg = self.config
        want = cfg.second_peak_fallback
        last = len(self.schedule) - 1
        cand = None
        res = self.first_pass(frame_a, frame_b,
                              want_second=want and last == 0)
        if want and last == 0:
            u, v, inval, cand = res
        else:
            u, v, inval = res
        for p in range(1, len(self.schedule)):
            res = self._refine_pass(p, frame_a, frame_b, u, v, inval,
                                    want_second=want and p == last)
            if want and p == last:
                u, v, inval, cand = res
            else:
                u, v, inval = res
        inval = self._apply_global_filters(u, v, inval)
        if cfg.median_filter is not None:
            from ..ops.validation import apply_median_filter

            inval = apply_median_filter(
                u, v, inval, cfg.median_filter, cfg.median_threshold,
            )
        if want and cand is not None and inval is not None:
            u, v, inval = self._apply_second_peak_fallback(
                u, v, inval, cand)
        if cfg.infill == "fused" and inval is not None:
            u = fused_infill(jnp.where(inval, jnp.nan, u), inval)
            v = fused_infill(jnp.where(inval, jnp.nan, v), inval)
        return u, v, inval

    def _apply_second_peak_fallback(self, u, v, inval, cand):
        """Vector-recovery ladder at invalid sites (see PIVConfig).

        Two candidates are tried per site, each accepted only when it
        passes the normalized-median test against VALID neighbours
        (``ops.validation.second_peak_acceptance``) and the configured
        velocity limits; static-ROI windows are never rescued:

        1. the vector already in place — at a peak-ratio-flagged site this
           is the predictor-reverted value (the anti-divergence guard), and
           ambiguous peak-ratio windows are usually *correct*: measured
           recall 71% vs 1% for the secondary peak alone on scattered
           noise outliers (8-seed sweep, zero >1 px mistakes);
        2. the displacement fit at the SECOND correlation peak.

        Progressive substitution: vectors rescued in one round become
        valid neighbours for the next, so clusters heal from the outside
        in (3 rounds; the fields are tiny [R, C], negligible in-graph).
        """
        cfg = self.config
        from ..ops.validation import (second_peak_acceptance,
                                      velocity_limits_test)

        cu, cv = cand

        def hard_reject(fu, fv):
            bad = jnp.zeros(u.shape, bool)
            if cfg.u_limits is not None or cfg.v_limits is not None:
                bad = velocity_limits_test(fu, fv, cfg.u_limits,
                                           cfg.v_limits)
            if self.window_masked[-1] is not None:
                bad = bad | jnp.asarray(self.window_masked[-1])
            return bad

        for _ in range(3):
            for ccu, ccv in ((u, v), (cu, cv)):
                ok = second_peak_acceptance(u, v, inval, ccu, ccv,
                                            cfg.fallback_threshold)
                ok = ok & ~hard_reject(ccu, ccv)
                u = jnp.where(ok, ccu, u)
                v = jnp.where(ok, ccv, v)
                inval = inval & ~ok
        return u, v, inval
