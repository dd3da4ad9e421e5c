"""Polynomial camera mappings (Soloff calibration).

The standard stereo-PIV camera model (Soloff, Adrian & Liu, Meas. Sci.
Technol. 8 1997): each camera's world->image projection is fitted as a
polynomial — cubic in the in-plane world coordinates (x, y), quadratic in
the out-of-plane coordinate z — from images of a calibration target at a
few known z positions.  No pinhole parameters are needed; lens distortion
and oblique viewing are absorbed by the polynomial.

Everything here is host-side numpy: calibration runs once per experiment
and dewarping/reconstruction operate on the tiny final vector fields, not
on the image stream (the hot path stays in the jitted engine).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

# Soloff basis: all monomials x^i y^j z^k with i+j <= 3, k <= 2, and
# total degree capped so the classic 19-term basis is reproduced.
_EXPONENTS = [
    (i, j, k)
    for k in range(3)
    for i in range(4)
    for j in range(4)
    if i + j <= 3 and (k < 2 or i + j <= 1)
]


def _basis(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    """[N, n_terms] Soloff monomial matrix."""
    x = np.asarray(x, np.float64).ravel()
    y = np.asarray(y, np.float64).ravel()
    z = np.asarray(z, np.float64).ravel()
    return np.stack([x**i * y**j * z**k for i, j, k in _EXPONENTS], axis=1)


def _basis_grad(x, y, z):
    """d(basis)/dx, /dy, /dz — each [N, n_terms]."""
    x = np.asarray(x, np.float64).ravel()
    y = np.asarray(y, np.float64).ravel()
    z = np.asarray(z, np.float64).ravel()
    gx, gy, gz = [], [], []
    for i, j, k in _EXPONENTS:
        gx.append(i * x ** max(i - 1, 0) * y**j * z**k if i else 0 * x)
        gy.append(x**i * j * y ** max(j - 1, 0) * z**k if j else 0 * x)
        gz.append(x**i * y**j * k * z ** max(k - 1, 0) if k else 0 * x)
    return (np.stack(gx, 1), np.stack(gy, 1), np.stack(gz, 1))


class CameraMapping:
    """World (x, y, z) -> image (X, Y) polynomial mapping for one camera.

    Fit from calibration-target points with ``fit``; evaluate with
    ``project``; differentiate with ``jacobian`` (the quantity stereo
    reconstruction needs).  Units are whatever the calibration target used
    (typically mm for world, px for image).
    """

    def __init__(self, coef_x: np.ndarray, coef_y: np.ndarray):
        self.coef_x = np.asarray(coef_x, np.float64)
        self.coef_y = np.asarray(coef_y, np.float64)

    @classmethod
    def fit(
        cls,
        world: np.ndarray,
        image: np.ndarray,
    ) -> "CameraMapping":
        """Least-squares Soloff fit.

        Args:
          world: ``[N, 3]`` target-point world coordinates (x, y, z) —
            include at least two z planes for stereo use (a single plane
            leaves the z terms unconstrained; they are then zeroed).
          image: ``[N, 2]`` the corresponding detected image points (X, Y).
        """
        world = np.asarray(world, np.float64)
        image = np.asarray(image, np.float64)
        if world.ndim != 2 or world.shape[1] != 3:
            raise ValueError("world must be [N, 3]")
        if image.shape != (world.shape[0], 2):
            raise ValueError("image must be [N, 2] matching world")
        A = _basis(world[:, 0], world[:, 1], world[:, 2])
        # single-plane calibration: z columns are constant -> rank-deficient;
        # drop the z-dependent terms and zero their coefficients
        z_dependent = np.array([k > 0 for _, _, k in _EXPONENTS])
        single_plane = np.ptp(world[:, 2]) == 0
        cols = ~z_dependent if single_plane else np.ones(len(_EXPONENTS), bool)
        cx = np.zeros(len(_EXPONENTS))
        cy = np.zeros(len(_EXPONENTS))
        sol, *_ = np.linalg.lstsq(A[:, cols], image, rcond=None)
        cx[cols] = sol[:, 0]
        cy[cols] = sol[:, 1]
        return cls(cx, cy)

    def project(self, x, y, z=0.0) -> Tuple[np.ndarray, np.ndarray]:
        """World points -> image points, preserving the input shape."""
        shape = np.broadcast(np.asarray(x), np.asarray(y)).shape
        z = np.broadcast_to(np.asarray(z, np.float64), shape)
        A = _basis(np.broadcast_to(x, shape), np.broadcast_to(y, shape), z)
        return (A @ self.coef_x).reshape(shape), (A @ self.coef_y).reshape(shape)

    def jacobian(self, x, y, z=0.0) -> np.ndarray:
        """``[..., 2, 3]`` d(image)/d(world) at the given world points."""
        shape = np.broadcast(np.asarray(x), np.asarray(y)).shape
        z = np.broadcast_to(np.asarray(z, np.float64), shape)
        gx, gy, gz = _basis_grad(
            np.broadcast_to(x, shape), np.broadcast_to(y, shape), z)
        J = np.empty(shape + (2, 3))
        for col, g in enumerate((gx, gy, gz)):
            J[..., 0, col] = (g @ self.coef_x).reshape(shape)
            J[..., 1, col] = (g @ self.coef_y).reshape(shape)
        return J


def dewarp_field(
    mapping: CameraMapping,
    x_world: np.ndarray,
    y_world: np.ndarray,
    u_px: np.ndarray,
    v_px: np.ndarray,
    z: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Convert one camera's pixel displacements to in-plane world units.

    Inverts the local 2x2 in-plane Jacobian at each grid point:
    ``(du_px, dv_px) = J[:, :2] @ (dx, dy)``.  Out-of-plane motion is
    unobservable with one camera (use ``stereo_reconstruct`` for 3C).
    """
    J = mapping.jacobian(x_world, y_world, z)[..., :, :2]  # [..., 2, 2]
    rhs = np.stack([np.asarray(u_px, np.float64),
                    np.asarray(v_px, np.float64)], axis=-1)[..., None]
    sol = np.linalg.solve(J, rhs)[..., 0]
    return sol[..., 0], sol[..., 1]
