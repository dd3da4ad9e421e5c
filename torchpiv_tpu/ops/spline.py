"""Predictor upsampling between pass grids as precomputed matmuls.

The reference upsamples the coarse (u, v) predictor field onto the next
pass's finer grid with scipy ``RectBivariateSpline`` on the host between every
pass (/root/reference/src/torchPIV/PIVbackend.py:700-713) — the main
structural host<->device ping-pong of the torch engine.

A tensor-product interpolating spline on *fixed* grids is a linear operator:
``fine = A_y @ coarse @ A_x.T``.  We extract the exact per-axis operators once
at setup time (by evaluating scipy's own spline on rank-one basis fields, so
parity with the reference is by construction) and the per-pass upsample
becomes two small dense matmuls inside the jitted graph — MXU work instead of
host scipy.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np


def _as_key(a: np.ndarray) -> tuple:
    return tuple(np.asarray(a, dtype=np.float64).ravel().tolist())


@lru_cache(maxsize=64)
def _spline_matrix_cached(coarse_key, fine_key, k) -> np.ndarray:
    from scipy.interpolate import RectBivariateSpline

    coarse = np.asarray(coarse_key, dtype=np.float64)
    fine = np.asarray(fine_key, dtype=np.float64)
    n = len(coarse)
    kk = min(k, n - 1)
    # RectBivariateSpline needs both axes; build a dummy second axis of the
    # same length and exploit that an interpolating spline reproduces
    # constants exactly: RBS(e_i ⊗ 1) == (A e_i) ⊗ 1, so column i of A is the
    # spline of the i-th one-hot data vector evaluated on the fine grid.
    A = np.empty((len(fine), n), dtype=np.float64)
    dummy = coarse  # second-axis grid (values irrelevant for constant data)
    for i in range(n):
        U = np.zeros((n, n))
        U[i, :] = 1.0
        A[:, i] = RectBivariateSpline(coarse, dummy, U, ky=kk, kx=kk)(
            fine, dummy[:1]
        )[:, 0]
    return A


def spline_matrix(coarse: np.ndarray, fine: np.ndarray, k: int = 3) -> np.ndarray:
    """Exact linear operator of scipy's interpolating spline on fixed grids.

    ``A @ data`` equals ``RectBivariateSpline(coarse, ·, data, s=0)`` sampled
    at ``fine`` along that axis (cubic by default; degree drops to
    ``len(coarse)-1`` on tiny grids, where the reference would raise).
    Evaluation outside the coarse range extrapolates the end polynomial,
    exactly as FITPACK does.
    """
    return _spline_matrix_cached(_as_key(coarse), _as_key(fine), k)


def upsample_matrices(
    y_coarse: np.ndarray,
    x_coarse: np.ndarray,
    y_fine: np.ndarray,
    x_fine: np.ndarray,
    k: int = 3,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-axis operators ``(A_y, A_x)`` with ``fine = A_y @ U @ A_x.T``."""
    return spline_matrix(y_coarse, y_fine, k), spline_matrix(x_coarse, x_fine, k)
