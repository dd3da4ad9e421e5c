"""torchpiv_tpu — a TPU-native Particle Image Velocimetry engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of TorchPIV
(NikNazarov/TorchPIV): FFT cross-correlation of interrogation windows,
multipass CWS/DWS refinement, sub-pixel Gaussian peak fitting, peak-ratio
validation with NaN infill, ensemble turbulence statistics, and an
``OfflinePIV``-compatible API.  The entire multipass loop is one jitted XLA
graph; pair batches shard over a device mesh.
"""

__version__ = "0.2.0"

from .models import MultipassPIV, PIVConfig, PTV  # noqa: F401

__all__ = ["MultipassPIV", "PIVConfig", "PTV", "OfflinePIV", "OnlinePIV",
           "PIVClient", "runGUI"]


def __getattr__(name):
    # Pipeline/GUI layers import IO and optional deps; load them lazily so
    # `import torchpiv_tpu` stays cheap for pure-compute users.
    if name in ("OfflinePIV", "OnlinePIV"):
        from . import pipeline

        return getattr(pipeline, name)
    if name == "PIVClient":
        from .client import PIVClient

        return PIVClient
    if name == "runGUI":
        from .gui import runGUI

        return runGUI
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
