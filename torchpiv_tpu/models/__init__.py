"""Pass/pipeline compute graphs (L3): the fused multipass PIV model,
ensemble (correlation-averaged) PIV, and PIV-guided particle tracking."""

from .ensemble_corr import EnsemblePIV
from .multipass import MultipassPIV, PIVConfig
from .ptv import PTV, PTVResult, bin_to_grid, match_particles

__all__ = ["MultipassPIV", "PIVConfig", "EnsemblePIV", "PTV", "PTVResult",
           "bin_to_grid", "match_particles"]
