"""Hand-written Pallas TPU kernels for ops where XLA's lowering is the
bottleneck (measured, not assumed): per-window shift resampling
(bilinear/bicubic, several variants) and deforming-window (DEF)
resampling.  Every kernel has an XLA reference implementation in
``torchpiv_tpu.ops`` it is parity-tested against.  Measured-dead-end
kernels (whole-pass fusion, fused peak fit, exotic shift variants) are
quarantined in ``torchpiv_tpu.experimental``."""

from .def_pallas import def_windows_pallas
from .shift_pallas import shift_windows_pallas

__all__ = [
    "def_windows_pallas",
    "shift_windows_pallas",
]
