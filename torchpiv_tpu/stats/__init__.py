"""Ensemble statistics (L4): means, Reynolds stresses, vorticity/shear;
measurement-quality diagnostics (peak locking, SNR maps, uncertainty);
robust field smoothing (smoothn); snapshot POD; spatial energy
spectra; derived maps (divergence, swirling strength, Okubo-Weiss);
temporal analysis for time-resolved runs (probe PSDs, integral time
scale, convergence)."""

from .derived import (derived_fields, divergence, okubo_weiss,
                      swirling_strength, velocity_gradients, vorticity)
from .ensemble import EnsembleAccumulator, compute_statistics
from .pod import PODResult, compute_pod
from .quality import (fractional_histogram, peak_locking_degree,
                      peak_width_map, snr_map, uncertainty_map)
from .smoothing import smooth_field, smooth_vector_field
from .spectra import energy_spectrum, spatial_spectrum
from .temporal import (autocorrelation, convergence_report,
                       integral_time_scale, load_pair_stack, probe_series,
                       running_mean, welch_psd)

__all__ = [
    "EnsembleAccumulator",
    "PODResult",
    "autocorrelation",
    "compute_pod",
    "compute_statistics",
    "convergence_report",
    "integral_time_scale",
    "load_pair_stack",
    "probe_series",
    "running_mean",
    "welch_psd",
    "derived_fields",
    "divergence",
    "energy_spectrum",
    "fractional_histogram",
    "peak_locking_degree",
    "peak_width_map",
    "okubo_weiss",
    "smooth_field",
    "smooth_vector_field",
    "snr_map",
    "spatial_spectrum",
    "swirling_strength",
    "uncertainty_map",
    "velocity_gradients",
    "vorticity",
]
