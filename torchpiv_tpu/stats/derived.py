"""Derived instantaneous-field quantities beyond the reference's table.

The reference's 13-column statistics stop at vorticity ``W = dVx - dUy``
and shear ``S = dVx + dUy`` of the ENSEMBLE mean (workers.py:100-118,
with its axis-name swap preserved in stats/ensemble.py).  These are the
remaining standard single-snapshot diagnostics (cf. PIVlab's derived
parameters):

* **divergence** — ``du/dx + dv/dy``; should vanish for planar
  incompressible flow, so its magnitude doubles as a data-quality map
  (out-of-plane motion / bad vectors).
* **swirling strength** (lambda_ci) — imaginary part of the 2-D velocity
  gradient tensor's complex eigenvalue (Zhou et al. 1999); unlike
  vorticity it is zero in pure shear, making it the standard vortex
  detector.
* **Okubo-Weiss parameter** — ``s_n^2 + s_s^2 - w^2`` (strain beats
  rotation > 0, rotation-dominated < 0).

Host-side numpy on final [R, C] fields; gradients use ``np.gradient``
with ``edge_order=2`` like the reference's statistics tail.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def velocity_gradients(u, v, dx: float = 1.0, dy: float = 1.0):
    """(du/dx, du/dy, dv/dx, dv/dy) on the grid (row axis = y)."""
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    dudy, dudx = np.gradient(u, dy, dx, edge_order=2)
    dvdy, dvdx = np.gradient(v, dy, dx, edge_order=2)
    return dudx, dudy, dvdx, dvdy


def divergence(u, v, dx: float = 1.0, dy: float = 1.0, *, grads=None
               ) -> np.ndarray:
    dudx, _, _, dvdy = grads or velocity_gradients(u, v, dx, dy)
    return dudx + dvdy


def vorticity(u, v, dx: float = 1.0, dy: float = 1.0, *, grads=None
              ) -> np.ndarray:
    """Out-of-plane vorticity ``dv/dx - du/dy`` (the physically-standard
    definition; the reference's table quantity carries its axis-name swap,
    documented in stats/ensemble.py)."""
    _, dudy, dvdx, _ = grads or velocity_gradients(u, v, dx, dy)
    return dvdx - dudy


def swirling_strength(u, v, dx: float = 1.0, dy: float = 1.0, *, grads=None
                      ) -> np.ndarray:
    """lambda_ci: imaginary part of the complex eigenvalue of the 2-D
    velocity-gradient tensor (0 where eigenvalues are real — pure
    shear/strain; > 0 inside vortices)."""
    dudx, dudy, dvdx, dvdy = grads or velocity_gradients(u, v, dx, dy)
    # eigenvalues of [[dudx, dudy], [dvdx, dvdy]]: lambda = tr/2 +- sqrt(D),
    # D = (tr/2)^2 - det; complex pair when D < 0, lambda_ci = sqrt(-D)
    half_tr = 0.5 * (dudx + dvdy)
    det = dudx * dvdy - dudy * dvdx
    disc = half_tr * half_tr - det
    return np.where(disc < 0, np.sqrt(np.maximum(-disc, 0.0)), 0.0)


def okubo_weiss(u, v, dx: float = 1.0, dy: float = 1.0, *, grads=None
                ) -> np.ndarray:
    dudx, dudy, dvdx, dvdy = grads or velocity_gradients(u, v, dx, dy)
    s_n = dudx - dvdy
    s_s = dvdx + dudy
    w = dvdx - dudy
    return s_n * s_n + s_s * s_s - w * w


def derived_fields(u, v, dx: float = 1.0, dy: float = 1.0
                   ) -> Dict[str, np.ndarray]:
    """All derived maps from one gradient pass: divergence, vorticity,
    swirling strength, Okubo-Weiss."""
    g = velocity_gradients(u, v, dx, dy)
    return {
        "divergence": divergence(u, v, grads=g),
        "vorticity": vorticity(u, v, grads=g),
        "swirling_strength": swirling_strength(u, v, grads=g),
        "okubo_weiss": okubo_weiss(u, v, grads=g),
    }
