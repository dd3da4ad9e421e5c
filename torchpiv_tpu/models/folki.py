"""FOLKI-style dense Lucas-Kanade PIV (Champagnat et al., Exp. Fluids 50
(2011)): iterative windowed least squares instead of FFT correlation.

Beyond the reference.  The estimator minimises, independently at every
pixel, the windowed SSD between frame A and the warped frame B; the
Gauss-Newton update solves one 2x2 system per pixel whose entries are
separable window sums of gradient products.  A mean pyramid handles
displacements beyond the linearisation range.

TPU-nativeness is the point: the whole solver is elementwise math,
separable box filters, and bilinear gathers — no FFTs, no scatter, fully
static shapes — so XLA fuses the entire iteration into a handful of
kernels.  It complements the correlation engine: per-PIXEL dense output
(the correlation engine is per-window), at its best on smooth flows with
good seeding density; correlation remains the robust default for sparse
or noisy imaging (measured in tests/test_folki.py).

Conventions match the engine: u = +x (cols), v = +y (rows), px units.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _box(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Separable (2r+1)^2 windowed sum with edge-clamped ('SAME') extent."""
    w = 2 * radius + 1
    return lax.reduce_window(x, 0.0, lax.add, (w, w), (1, 1), "SAME")


def _blur(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """PIV particle images are only ~2-3 px wide, so they alias away
    under plain decimation and their gradients under-sample; smoothing
    is what makes LK converge on them (shared full-precision op)."""
    from ..ops.filters import gaussian_blur

    return gaussian_blur(x, sigma, truncate=2.5)


def _warp(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    from jax.scipy.ndimage import map_coordinates

    H, W = img.shape
    yy, xx = jnp.mgrid[0:H, 0:W]
    return map_coordinates(img, [yy + v, xx + u], order=1, mode="nearest")


def _level_flow(a, b, u, v, radius, iters):
    """Gauss-Newton iterations at one pyramid level.

    The linearisation gradient is the AVERAGE of frame A's and the
    warped frame B's (the symmetric/central-difference-in-time form):
    the fixed-template gradient alone converges in ~2 iterations and
    then oscillates (measured), while the symmetric form is stable and
    second-order accurate in the displacement.
    """
    dya, dxa = jnp.gradient(a)

    def body(_, uv):
        u, v = uv
        bw = _warp(b, u, v)
        dyb, dxb = jnp.gradient(bw)
        gx = 0.5 * (dxa + dxb)
        gy = 0.5 * (dya + dyb)
        a11 = _box(gx * gx, radius) + 1e-4
        a12 = _box(gx * gy, radius)
        a22 = _box(gy * gy, radius) + 1e-4
        det = a11 * a22 - a12 * a12
        # TOTAL-flow normal equations (FOLKI form): solving for the
        # increment instead accumulates window-inconsistency and
        # oscillates (measured); the total form re-projects the whole
        # field through the windowed system each sweep, which is the
        # fixed-point-stable formulation.
        r1 = _box(gx * (a - bw) + gx * gx * u + gx * gy * v, radius)
        r2 = _box(gy * (a - bw) + gx * gy * u + gy * gy * v, radius)
        un = (a22 * r1 - a12 * r2) / det
        vn = (a11 * r2 - a12 * r1) / det
        # bounded move per sweep keeps the linearisation honest
        return (u + jnp.clip(un - u, -1.0, 1.0),
                v + jnp.clip(vn - v, -1.0, 1.0))

    return lax.fori_loop(0, iters, body, (u, v))


@partial(jax.jit, static_argnames=("radius", "iters", "levels"))
def folki_flow(
    frame_a: jnp.ndarray,
    frame_b: jnp.ndarray,
    radius: int = 8,
    iters: int = 8,
    levels: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense per-pixel flow ``(u, v)`` [H, W] from A to B (px).

    ``radius``: window half-size of the local least squares (the
    resolution/robustness trade-off, ~wind_size/4 of the equivalent
    correlation setup); ``levels``: mean-pyramid depth — level L handles
    displacements up to ~2^L px before the fine levels refine.
    Frame dimensions must be divisible by ``2**(levels-1)``.
    """
    a = frame_a.astype(jnp.float32) / 255.0
    b = frame_b.astype(jnp.float32) / 255.0
    H, W = a.shape
    f = 2 ** (levels - 1)
    if H % f or W % f:
        raise ValueError(f"frame {a.shape} not divisible by {f} "
                         f"(levels={levels})")

    # solve-time smoothing at every level + anti-aliased decimation
    pyr = [(_blur(a, 1.0), _blur(b, 1.0))]
    for _ in range(levels - 1):
        a = _blur(a, 1.0)
        b = _blur(b, 1.0)
        a = a.reshape(a.shape[0] // 2, 2, a.shape[1] // 2, 2).mean((1, 3))
        b = b.reshape(b.shape[0] // 2, 2, b.shape[1] // 2, 2).mean((1, 3))
        pyr.append((_blur(a, 1.0), _blur(b, 1.0)))

    al, bl = pyr[-1]
    u = jnp.zeros_like(al)
    v = jnp.zeros_like(al)
    for lev in range(levels - 1, -1, -1):
        al, bl = pyr[lev]
        if u.shape != al.shape:
            u = 2.0 * jax.image.resize(u, al.shape, "bilinear")
            v = 2.0 * jax.image.resize(v, al.shape, "bilinear")
        # coarser levels see shrunken windows of the same physical size
        r = max(2, radius >> lev)
        u, v = _level_flow(al, bl, u, v, r, iters)
    return u, v


class FolkiPIV:
    """Engine-shaped wrapper: dense flow window-averaged onto the PIV
    grid, with a residual-based validity mask.

    >>> fp = FolkiPIV((1024, 1024), wind_size=32, overlap=16)
    >>> u, v, invalid = fp(frame_a, frame_b)     # [R, C] like MultipassPIV
    """

    def __init__(self, frame_shape: Tuple[int, int], wind_size: int = 32,
                 overlap: int = 16, radius: Optional[int] = None,
                 iters: int = 8, levels: int = 3,
                 residual_threshold: float = 0.12,
                 min_contrast: float = 0.01,
                 piv_config=None):
        from ..ops.geometry import get_coordinates

        self.frame_shape = tuple(frame_shape)
        # hybrid predictor-corrector: the correlation engine supplies the
        # initial field (robust at any seeding), dense LK polishes it,
        # and windows LK cannot trust fall back to the correlation value
        self._engine = None
        if piv_config is not None:
            import jax as _jax

            from .multipass import MultipassPIV

            if tuple(piv_config.frame_shape) != self.frame_shape:
                raise ValueError("piv_config.frame_shape "
                                 f"{piv_config.frame_shape} != "
                                 f"{self.frame_shape}")
            self._engine = _jax.jit(MultipassPIV(piv_config))
            ew, eo = piv_config.pass_schedule()[-1]
            egx, egy = get_coordinates(self.frame_shape, ew, eo)
            dgx, dgy = get_coordinates(self.frame_shape, wind_size, overlap)
            if not (np.array_equal(egx, dgx) and np.array_equal(egy, dgy)):
                raise ValueError(
                    "hybrid mode needs IDENTICAL grids (node positions, "
                    f"not just counts): engine final pass ({ew}, {eo}) vs "
                    f"dense output ({wind_size}, {overlap}) — pick "
                    "wind_size/overlap equal to the engine's final pass")
        self.wind_size = int(wind_size)
        self.radius = int(radius if radius is not None else wind_size // 4)
        self.iters = int(iters)
        self.levels = int(levels)
        self.residual_threshold = float(residual_threshold)
        self.min_contrast = float(min_contrast)
        gx, gy = get_coordinates(self.frame_shape, wind_size, overlap)
        self._rows = jnp.asarray(np.rint(gy[:, 0]).astype(np.int64))
        self._cols = jnp.asarray(np.rint(gx[0, :]).astype(np.int64))
        self.coordinates = (gx, gy)
        # strided-window bookkeeping: node k's window starts at
        # off + k*step (windows are fully inside the frame by
        # get_field_shape construction)
        self._step = wind_size - overlap
        self._off_y = int(round(float(gy[0, 0]))) - wind_size // 2
        self._off_x = int(round(float(gx[0, 0]))) - wind_size // 2
        self._grid_shape = gx.shape

        def grid_output(a, b, u, v):
            """Dense flow -> PIV grid: texture-weighted window average
            (the flow is only OBSERVED at gradients — uniform averaging
            lets the drift between sparse particles dominate, measured
            2x worse at density 0.003) + residual/contrast validity."""
            af = a.astype(jnp.float32) / 255.0
            bf = b.astype(jnp.float32) / 255.0
            res = jnp.abs(_warp(bf, u, v) - af)
            w = self.wind_size
            area = float(w * w)
            step = self._step
            R, C = self._grid_shape

            def avg(x):
                # one complete w x w window per grid node (strided VALID
                # windows: ~step^2 cheaper than full-frame SAME sums, and
                # edge nodes average over their FULL window instead of a
                # zero-padded truncation)
                s = lax.reduce_window(x[self._off_y:, self._off_x:], 0.0,
                                      lax.add, (w, w), (step, step),
                                      "VALID") / area
                return s[:R, :C]

            gy_, gx_ = jnp.gradient(_blur(af, 1.0))
            tex = gx_ * gx_ + gy_ * gy_

            # weighted LINEAR fit per window, evaluated at the node: a
            # plain texture-weighted mean is biased on sheared flows
            # (the texture centroid shifts off-node), while uniform
            # averaging lets inter-particle drift dominate at sparse
            # seeding — the plane fit is unbiased for linear flows under
            # ANY weight distribution (both measured).
            H_, W_ = af.shape
            yy, xx = jnp.mgrid[0:H_, 0:W_]
            xs = (xx - W_ / 2.0) / w  # conditioned coordinates
            ys = (yy - H_ / 2.0) / w
            s0 = avg(tex) + 1e-12
            sx_g = avg(tex * xs)
            sy_g = avg(tex * ys)
            sxx_g = avg(tex * xs * xs)
            sxy_g = avg(tex * xs * ys)
            syy_g = avg(tex * ys * ys)
            xc = xs[self._rows][:, self._cols]
            yc = ys[self._rows][:, self._cols]
            # recenter the moments on each node (f32 conditioning: the
            # recentered coordinates are O(window/w), not O(frame/w))
            sx = sx_g - xc * s0
            sy = sy_g - yc * s0
            sxx = sxx_g - 2 * xc * sx_g + xc * xc * s0
            sxy = sxy_g - xc * sy_g - yc * sx_g + xc * yc * s0
            syy = syy_g - 2 * yc * sy_g + yc * yc * s0
            c11 = sxx * syy - sxy * sxy
            c12 = sy * sxy - sx * syy
            c13 = sx * sxy - sy * sxx
            det = s0 * c11 + sx * c12 + sy * c13
            ok = jnp.abs(det) > 1e-6 * jnp.maximum(s0, 1e-12) ** 3

            def fit_at_node(f):
                s1 = avg(tex * f)
                s1x = avg(tex * xs * f) - xc * s1
                s1y = avg(tex * ys * f) - yc * s1
                val = (c11 * s1 + c12 * s1x + c13 * s1y) / det
                # degenerate texture (too few/collinear particles):
                # fall back to the weighted mean
                return jnp.where(ok, val, s1 / s0)

            uw = fit_at_node(u)
            vw = fit_at_node(v)
            # two ways a window can be untrustworthy: the fit didn't
            # explain the data (high residual relative to contrast), or
            # there is no texture at all (flow unobservable — residual is
            # deceptively ZERO on a blank region, so contrast must gate)
            contrast = jnp.sqrt(jnp.maximum(
                avg(af * af) - avg(af) ** 2, 1e-8))
            bad = ((avg(res) / contrast > self.residual_threshold)
                   | (contrast < self.min_contrast))
            return uw, vw, bad

        @jax.jit
        def run(a, b):
            u, v = folki_flow(a, b, radius=self.radius, iters=self.iters,
                              levels=self.levels)
            return grid_output(a, b, u, v)

        self._run = run

        @jax.jit
        def refine(a, b, u0d, v0d):
            af = _blur(a.astype(jnp.float32) / 255.0, 1.0)
            bf = _blur(b.astype(jnp.float32) / 255.0, 1.0)
            u, v = _level_flow(af, bf, u0d, v0d, self.radius, self.iters)
            return grid_output(a, b, u, v)

        self._refine = refine

    def __call__(self, frame_a, frame_b):
        a = jnp.asarray(frame_a)
        b = jnp.asarray(frame_b)
        if self._engine is None:
            u, v, bad = self._run(a, b)
            return np.asarray(u), np.asarray(v), np.asarray(bad)
        u0, v0, inval = self._engine(a, b)
        u0 = np.asarray(u0, dtype=np.float64)
        v0 = np.asarray(v0, dtype=np.float64)
        bad0 = np.asarray(inval, dtype=bool)
        if bad0.any():
            fill_u = np.median(u0[~bad0]) if (~bad0).any() else 0.0
            fill_v = np.median(v0[~bad0]) if (~bad0).any() else 0.0
            u0 = np.where(bad0, fill_u, u0)
            v0 = np.where(bad0, fill_v, v0)
        u0d = jax.image.resize(jnp.asarray(u0, jnp.float32),
                               self.frame_shape, "bilinear")
        v0d = jax.image.resize(jnp.asarray(v0, jnp.float32),
                               self.frame_shape, "bilinear")
        u, v, bad = (np.asarray(x) for x in self._refine(a, b, u0d, v0d))
        # LK is a sub-pixel REFINEMENT of the correlation anchor: keep it
        # only where it stayed near the anchor and passed its own gates —
        # a large deviation means LK drifted (texture gaps), not that it
        # found a better answer (measured on sparse seeding)
        keep = (~bad & (np.abs(u - u0) < 0.5) & (np.abs(v - v0) < 0.5))
        u = np.where(keep, u, u0)
        v = np.where(keep, v, v0)
        return u, v, ~keep & bad0
