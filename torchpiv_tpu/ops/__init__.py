"""Pure compute ops (L2 of the layer map): geometry, window extraction,
FFT correlation, sub-pixel peak fit, CWS/DWS shifts, spline upsampling,
outlier infill.  Everything here is jit-friendly (static shapes, functional)
and backend-agnostic (CPU for tests, TPU for production)."""

from .correlate import correlate_fft, mean_normalize, min_subtract
from .geometry import get_coordinates, get_field_shape, window_origins
from .infill import fill_missing_values, fused_infill, interpolate_borders
from .particles import detect_particles
from .peakfit import correlation_to_displacement
from .shifts import cws_shift, dws_shift, per_window_origins
from .spline import spline_matrix, upsample_matrices
from .windows import extract_windows, flat_window_grid, window_index_1d

__all__ = [
    "correlate_fft",
    "mean_normalize",
    "min_subtract",
    "get_coordinates",
    "get_field_shape",
    "window_origins",
    "fill_missing_values",
    "fused_infill",
    "interpolate_borders",
    "correlation_to_displacement",
    "detect_particles",
    "cws_shift",
    "dws_shift",
    "per_window_origins",
    "spline_matrix",
    "upsample_matrices",
    "extract_windows",
    "flat_window_grid",
    "window_index_1d",
]
