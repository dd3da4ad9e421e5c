"""Camera calibration and stereo reconstruction (beyond the reference).

The reference is strictly single-camera planar 2C-2D PIV in pixel units.
This layer adds the standard lab workflow on top of the same engine
output: polynomial (Soloff) camera mappings fitted from calibration-target
images, image->world dewarping of displacement fields, and two-camera
stereo reconstruction of the full three-component displacement vector.
"""
from .mapping import CameraMapping, dewarp_field
from .stereo import stereo_reconstruct

__all__ = ["CameraMapping", "dewarp_field", "stereo_reconstruct"]
