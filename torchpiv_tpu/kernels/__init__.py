"""Hand-written Pallas TPU kernels for ops where XLA's lowering is the
bottleneck (measured, not assumed): per-window shift resampling (two
variants) and the fused peak-fit (bit-exact, opt-in).  Every kernel has an
XLA reference implementation in ``torchpiv_tpu.ops`` it is parity-tested
against."""

from .peakfit_pallas import correlation_to_displacement_pallas
from .shift_pallas import shift_windows_pallas

__all__ = ["shift_windows_pallas", "correlation_to_displacement_pallas"]
