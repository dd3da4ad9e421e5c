"""Two-camera stereo reconstruction of three-component displacement.

Standard Soloff-style stereo PIV: each camera observes an in-plane pixel
displacement field of the SAME world grid; linearising each camera's
mapping around the measurement plane gives two equations per camera,

    (du_px, dv_px)_cam = J_cam @ (dx, dy, dz),        J_cam = d(image)/d(world),

and the four equations are solved per grid point in least squares for the
three world displacement components.  The condition of the stacked system
reflects the stereo angle (cameras viewing from the same direction cannot
resolve dz — ``stereo_reconstruct`` reports that via the residual).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from .mapping import CameraMapping


def stereo_reconstruct(
    cam1: CameraMapping,
    cam2: CameraMapping,
    x_world: np.ndarray,
    y_world: np.ndarray,
    uv1_px: Tuple[np.ndarray, np.ndarray],
    uv2_px: Tuple[np.ndarray, np.ndarray],
    z: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-point least-squares 3C displacement from two camera fields.

    Args:
      cam1, cam2: fitted ``CameraMapping`` for each camera (MUST be
        calibrated with multiple z planes, otherwise dz is unobservable).
      x_world, y_world: the common analysis grid in world units — run both
        cameras' PIV on DEWARPED frames or map the vectors to this grid
        first.
      uv1_px, uv2_px: each camera's pixel displacement fields on that grid.

    Returns ``(dx, dy, dz, residual)`` in world units; ``residual`` is the
    per-point RMS of the 4-equation system (a data-quality map).
    """
    u1, v1 = (np.asarray(a, np.float64) for a in uv1_px)
    u2, v2 = (np.asarray(a, np.float64) for a in uv2_px)
    J1 = cam1.jacobian(x_world, y_world, z)  # [..., 2, 3]
    J2 = cam2.jacobian(x_world, y_world, z)
    A = np.concatenate([J1, J2], axis=-2)  # [..., 4, 3]
    b = np.stack([u1, v1, u2, v2], axis=-1)[..., None]  # [..., 4, 1]

    # batched least squares via normal equations (4x3 systems; the stereo
    # angle keeps them well-conditioned in practice)
    At = np.swapaxes(A, -1, -2)
    sol = np.linalg.solve(At @ A, At @ b)  # [..., 3, 1]
    resid = A @ sol - b
    rms = np.sqrt(np.mean(resid[..., 0] ** 2, axis=-1))
    d = sol[..., 0]
    return d[..., 0], d[..., 1], d[..., 2], rms
