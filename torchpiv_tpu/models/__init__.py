"""Pass/pipeline compute graphs (L3): the fused multipass PIV model."""

from .ensemble_corr import EnsemblePIV
from .multipass import MultipassPIV, PIVConfig

__all__ = ["MultipassPIV", "PIVConfig", "EnsemblePIV"]
