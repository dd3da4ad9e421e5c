"""Hand-written Pallas TPU kernels for ops where XLA's lowering is the
bottleneck (measured, not assumed): per-window shift resampling
(bilinear/bicubic, several variants), deforming-window (DEF) resampling,
the fused correlate+peakfit stages, and the fused peak-fit.  Every kernel
has an XLA reference implementation in ``torchpiv_tpu.ops`` it is
parity-tested against."""

from .def_pallas import def_windows_pallas
from .peakfit_pallas import correlation_to_displacement_pallas
from .shift_pallas import shift_windows_pallas

__all__ = [
    "def_windows_pallas",
    "shift_windows_pallas",
    "correlation_to_displacement_pallas",
]
