"""Hand-written Pallas TPU kernels for ops where XLA's lowering is the
bottleneck (measured, not assumed): per-window shift resampling (random
gathers) and — planned — the fused peak-fit.  Every kernel has an XLA
reference implementation in ``torchpiv_tpu.ops`` it is parity-tested against.
"""

from .shift_pallas import shift_windows_pallas

__all__ = ["shift_windows_pallas"]
