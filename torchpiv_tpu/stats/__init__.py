"""Ensemble statistics (L4): means, Reynolds stresses, vorticity/shear."""

from .ensemble import EnsembleAccumulator, compute_statistics

__all__ = ["EnsembleAccumulator", "compute_statistics"]
