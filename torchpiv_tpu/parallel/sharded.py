"""Multi-chip PIV: pair-batch data parallelism + window-axis model
parallelism over a ``jax.sharding.Mesh``.

Decomposition (TPU-native; nothing like this exists in the single-device
reference):

* **pairs axis (DP)** — the batch of image pairs splits across mesh axis
  ``pairs``; pairs are independent, so no communication at all.
* **windows axis (model/sequence parallel)** — within one pair, the window
  grid's *rows* split across mesh axis ``windows``.  Window extraction,
  correlation and peak fit are per-window local; the only cross-window
  coupling is the spline predictor upsample between passes, which needs the
  full coarse field — one ``all_gather`` of a tiny ``[R, C]`` float field per
  pass, riding ICI.  Frames are replicated (a 4 MP uint8 frame is 4 MB —
  cheap next to the window tensors, which are what actually shard).

Any window-row count works for any axis size: each shard computes a clamped
contiguous block (standard dynamic-slice clamping), and a static permutation
rebuilds the exact field after the gather — duplicated tail rows are
recomputed, never wrong.

Feature parity with the single-device engine: CWS / DWS / DEF multipass
modes, median-filter validation and fused infill (cross-shard field ops run
on the gathered full field), the engine's configured peak fit, and the
Pallas band-DMA shift kernel per shard (each shard's kernel streams bands
for its own window-row block via ``row_start``/``n_rows_local``).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.multipass import MultipassPIV
from ..ops.infill import fused_infill
from ..ops.shifts import bicubic_cws_shift, cws_shift, dws_shift
from ..ops.validation import apply_median_filter
from ..ops.windows import extract_windows


def _block_layout(R: int, n_shards: int):
    """Clamped contiguous block per shard + static gather-reconstruction map.

    Shard ``s`` computes rows ``origin(s) .. origin(s)+rloc-1`` with
    ``origin(s) = min(s*rloc, R-rloc)``; ``pos`` maps global row -> position
    in the concatenated ``[n_shards*rloc]`` gather.
    """
    rloc = -(-R // n_shards)
    rloc = min(rloc, R)
    origins = [min(s * rloc, R - rloc) for s in range(n_shards)]
    pos = np.empty(R, dtype=np.int32)
    for s in reversed(range(n_shards)):
        for i in range(rloc):
            r = origins[s] + i
            pos[r] = s * rloc + i
    return rloc, np.array(origins, dtype=np.int32), pos


class ShardedPIV:
    """Sharded multipass PIV over a mesh.

    Args:
      engine: a built ``MultipassPIV`` (its static schedule/operators are
        reused; its Pallas path applies per-device in DP mode).
      mesh: mesh with a ``pair_axis`` and optionally a ``window_axis``.

    ``__call__(batch_a, batch_b)``: ``[B, H, W]`` uint8 batches (B divisible
    by the pairs-axis size) -> ``(u, v, invalid)`` of shape ``[B, R, C]``.
    """

    def __init__(
        self,
        engine: MultipassPIV,
        mesh: Mesh,
        pair_axis: str = "pairs",
        window_axis: Optional[str] = "windows",
    ):
        self.engine = engine
        self.mesh = mesh
        self.pair_axis = pair_axis
        self.window_axis = window_axis if window_axis in mesh.axis_names else None
        self.nw = mesh.shape[self.window_axis] if self.window_axis else 1
        # Per-pass block layouts for the windows axis.
        self.layouts = [
            _block_layout(fs[0], self.nw) for fs in engine.field_shapes
        ]

    # ---- public ----------------------------------------------------------
    def __call__(self, batch_a: jnp.ndarray, batch_b: jnp.ndarray):
        spec_in = P(self.pair_axis, None, None)
        if self.window_axis:
            spec_out = P(self.pair_axis, self.window_axis, None)
        else:
            spec_out = P(self.pair_axis, None, None)
        f = jax.shard_map(
            self._local_batch,
            mesh=self.mesh,
            in_specs=(spec_in, spec_in),
            out_specs=(spec_out, spec_out, spec_out),
            check_vma=False,
        )
        u, v, inval = f(batch_a, batch_b)
        if self.window_axis:
            # undo block clamping: select the true rows from the gathered dim
            pos = jnp.asarray(self.layouts[-1][2])
            u, v, inval = (t[:, pos, :] for t in (u, v, inval))
        return u, v, inval.astype(bool)

    def jit(self):
        """Jitted callable with sharded-in/sharded-out placement."""
        s_in = NamedSharding(self.mesh, P(self.pair_axis, None, None))
        return jax.jit(self, in_shardings=(s_in, s_in))

    def jit_packed(self):
        """Like :meth:`jit` but returns ONE packed ``[B, 3, R, C]`` f32
        buffer instead of three — one device->host transfer per dispatch
        (each output buffer pays a fixed round trip on network-attached
        hosts; see ``OfflinePIV``'s batched dispatch)."""
        s_in = NamedSharding(self.mesh, P(self.pair_axis, None, None))

        def packed(a, b):
            u, v, inval = self(a, b)
            return jnp.stack([u, v, inval.astype(jnp.float32)], axis=1)

        return jax.jit(packed, in_shardings=(s_in, s_in))

    # ---- local (per-device) program -------------------------------------
    def _local_batch(self, a_local, b_local):
        if not self.window_axis:
            def one(fa, fb):
                u, v, inval = self.engine(fa, fb)
                if inval is None:
                    inval = jnp.zeros(u.shape, bool)
                return u, v, inval.astype(jnp.int8)

            return jax.vmap(one)(a_local, b_local)
        return jax.vmap(self._local_pair_window_sharded)(a_local, b_local)

    def _local_pair_window_sharded(self, frame_a, frame_b):
        eng = self.engine
        cfg = eng.config
        dt = jnp.dtype(cfg.dtype)
        wa = self.window_axis
        wr = jax.lax.axis_index(wa)
        H, W = cfg.frame_shape
        frame_a = eng._masked_frame(frame_a)
        frame_b = eng._masked_frame(frame_b)

        # ---- pass 1 on the local window-row block ----
        w, o = eng.schedule[0]
        R, C = eng.field_shapes[0]
        step = w - o
        rloc, origins, _ = self.layouts[0]
        org = jnp.asarray(origins)[wr]
        slice_h = (rloc - 1) * step + w
        fa = jax.lax.dynamic_slice(frame_a, (org * step, 0), (slice_h, W))
        fb = jax.lax.dynamic_slice(frame_b, (org * step, 0), (slice_h, W))
        aa = extract_windows(fa, w, o, cfg.extract_variant).astype(dt)
        bb = extract_windows(fb, w, o, cfg.extract_variant).astype(dt)
        wgt = eng._window_weight(0)
        if wgt is None:
            corr = eng._correlate(aa, bb, dc_normalize=True)
        else:
            # same as the single-device engine: weighting needs the
            # explicit mean normalisation (the DC fold assumes unweighted
            # windows, models/multipass.py pass 1)
            from ..ops.correlate import mean_normalize

            aa = mean_normalize(aa, dt) * wgt
            bb = mean_normalize(bb, dt) * wgt
            corr = eng._correlate(aa, bb)
        want = cfg.second_peak_fallback
        last = len(eng.schedule) - 1
        cand = None
        if want and last == 0:
            u, v, inval, (cu, cv) = eng._peakfit(
                corr, cfg.validate, want_second=True)
            cand = (cu.reshape(rloc, C), cv.reshape(rloc, C))
        else:
            u, v, inval = eng._peakfit(corr, cfg.validate)
        u = u.reshape(rloc, C)
        v = v.reshape(rloc, C)
        inval = (
            inval.reshape(rloc, C).astype(dt)
            if inval is not None
            else jnp.zeros((rloc, C), dt)
        )
        u, v, inval = self._mask_local(0, u, v, inval, wr)

        # ---- refinement passes ----
        for p in range(1, len(eng.schedule)):
            res = self._refine_local(p, frame_a, frame_b, u, v, inval, wr,
                                     want_second=want and p == last)
            if want and p == last:
                u, v, inval, cand = res
            else:
                u, v, inval = res

        # ---- post-pass field ops (global filters, median filter, fused
        # infill) ---- all need cross-shard context (global statistics /
        # neighbourhoods), so run them on the gathered full field (tiny
        # [R, C] tensors) and slice the local block back out.
        needs_full = (cfg.median_filter is not None or cfg.infill == "fused"
                      or cfg.u_limits is not None or cfg.v_limits is not None
                      or cfg.global_std is not None
                      or cfg.second_peak_fallback)
        if needs_full:
            pl_ = len(eng.schedule) - 1
            Rf, Cf = eng.field_shapes[pl_]
            rloc, origins, _ = self.layouts[pl_]
            org = jnp.asarray(origins)[wr]
            u_full = self._gather_full(u, pl_)
            v_full = self._gather_full(v, pl_)
            inval_full = self._gather_full(inval, pl_) >= 0.5
            new_inval = eng._apply_global_filters(
                u_full, v_full,
                inval_full if (cfg.validate or eng.frame_mask is not None)
                else None)
            if new_inval is not None:
                inval_full = new_inval
            if cfg.median_filter is not None:
                inval_full = apply_median_filter(
                    u_full, v_full,
                    # inval also carries the static ROI mask: keep it even
                    # when peak-ratio validation is off (engine parity)
                    inval_full
                    if (cfg.validate or eng.frame_mask is not None)
                    else None,
                    cfg.median_filter, cfg.median_threshold,
                )
            if cfg.second_peak_fallback and cand is not None:
                # vector-recovery ladder on the gathered full field (the
                # acceptance statistics need cross-shard neighbourhoods),
                # same placement as the engine: after all validators,
                # before infill
                cu_full = self._gather_full(cand[0], pl_)
                cv_full = self._gather_full(cand[1], pl_)
                u_full, v_full, inval_full = eng._apply_second_peak_fallback(
                    u_full, v_full, inval_full, (cu_full, cv_full))
            if cfg.infill == "fused":
                u_full = fused_infill(
                    jnp.where(inval_full, jnp.nan, u_full), inval_full)
                v_full = fused_infill(
                    jnp.where(inval_full, jnp.nan, v_full), inval_full)
            u = jax.lax.dynamic_slice(u_full, (org, 0), (rloc, Cf))
            v = jax.lax.dynamic_slice(v_full, (org, 0), (rloc, Cf))
            inval = jax.lax.dynamic_slice(
                inval_full.astype(dt), (org, 0), (rloc, Cf))

        return u, v, inval.astype(jnp.int8)

    def _mask_local(self, p, u, v, inval, wr):
        """Apply the engine's pass-p window mask on this shard's row block
        (inval carried as float dt in the sharded path)."""
        wm = self.engine.window_masked[p]
        if wm is None:
            return u, v, inval
        rloc, origins, _ = self.layouts[p]
        org = jnp.asarray(origins)[wr]
        m = jax.lax.dynamic_slice(
            jnp.asarray(wm), (org, 0), (rloc, wm.shape[1]))
        u = jnp.where(m, 0.0, u)
        v = jnp.where(m, 0.0, v)
        return u, v, jnp.maximum(inval, m.astype(inval.dtype))

    def _gather_full(self, field, p):
        """all_gather a locally-computed block field into the full [R, C]."""
        R = self.engine.field_shapes[p][0]
        pos = jnp.asarray(self.layouts[p][2])
        gathered = jax.lax.all_gather(
            field, self.window_axis, axis=0, tiled=True
        )
        return gathered[pos]

    def _refine_local(self, p, frame_a, frame_b, u, v, inval, wr,
                      want_second=False):
        eng = self.engine
        cfg = eng.config
        dt = jnp.dtype(cfg.dtype)
        w, o = eng.schedule[p]
        step = w - o
        Rf, Cf = eng.field_shapes[p]
        rloc, origins, _ = self.layouts[p]
        org = jnp.asarray(origins)[wr]

        # Full coarse predictor via one tiny all_gather per field (ICI).
        u_full = self._gather_full(u, p - 1)
        v_full = self._gather_full(v, p - 1)
        val_full = self._gather_full(inval, p - 1)

        Ay, Ax = eng.upsamplers[p - 1]
        Ay_loc = jax.lax.dynamic_slice(Ay, (org, 0), (rloc, Ay.shape[1]))

        def up(full, A_rows=None):
            return jnp.matmul(
                jnp.matmul(Ay_loc if A_rows is None else A_rows,
                           full.astype(dt), precision="highest"),
                Ax.T,
                precision="highest",
            )

        u0 = up(u_full)
        v0 = up(v_full)
        validate = cfg.validate
        # the inval field also carries the static window mask, which must
        # zero the predictor even when peak-ratio validation is off
        has_inval = validate or eng.frame_mask is not None
        if has_inval:
            val0 = up(val_full) >= 0.5

        # Local window origins (global pixel coordinates, traced values).
        r0 = ((org + jnp.arange(rloc)) * step).astype(jnp.int32)
        c0 = (jnp.arange(Cf) * step).astype(jnp.int32)
        r0w = jnp.repeat(r0, Cf)
        c0w = jnp.tile(c0, rloc)

        def shift(frame, vx, vy):
            """Per-shard window shift: the Pallas band-DMA kernel over this
            shard's window-row block when enabled (frames are replicated,
            so the kernel just starts its bands at the shard's rows), the
            XLA flat-gather path otherwise."""
            bicubic = (cfg.multipass_mode == "CWS"
                       and cfg.cws_interp == "bicubic")
            from ..kernels.shift_pallas import (shift_pallas_supported,
                                                shift_windows_pallas)

            use_pallas = (
                (eng._use_pallas() or cfg.pallas_interpret)
                and not (bicubic and cfg.shift_variant != "rolls")
                and shift_pallas_supported(
                    w, "bicubic" if bicubic else "bilinear"))
            if use_pallas:
                return shift_windows_pallas(
                    frame.astype(dt), vx, vy,
                    frame_shape=cfg.frame_shape,
                    wind_size=w, overlap=o,
                    max_shift=cfg.max_shift,
                    interpret=cfg.pallas_interpret,
                    flat_wrap=cfg.edge_exact,
                    variant=cfg.shift_variant,
                    maps=cfg.shift_maps,
                    row_start=org, n_rows_local=rloc,
                    interp="bicubic" if bicubic else "bilinear",
                    out_dtype=(eng._window_store_dtype()
                               if cfg.shift_variant == "rolls"
                               else jnp.float32),
                )
            if cfg.multipass_mode == "DWS":
                return dws_shift(frame, r0w, c0w, w,
                                 vx.astype(jnp.int32), vy.astype(jnp.int32),
                                 dt)
            if bicubic:
                return bicubic_cws_shift(frame, r0w, c0w, w, vx, vy, dt)
            return cws_shift(frame, r0w, c0w, w, vx, vy, dt)

        if cfg.multipass_mode == "CWS":
            u2 = u0 / 2.0
            v2 = v0 / 2.0
            if has_inval:
                u0 = jnp.where(val0, 0.0, u0)
                v0 = jnp.where(val0, 0.0, v0)
            aa = shift(frame_a, -u2.reshape(-1), -v2.reshape(-1))
            bb = shift(frame_b, u2.reshape(-1), v2.reshape(-1))
        elif cfg.multipass_mode == "DEF":
            # Window deformation (models/multipass.py:281): gradients need
            # cross-shard neighbour rows, so upsample the FULL fine predictor
            # (tiny [Rf, Cf] matmuls), differentiate, then slice the local
            # block of centers and gradients.
            u0f = up(u_full, Ay)
            v0f = up(v_full, Ay)
            u2f = u0f / 2.0
            v2f = v0f / 2.0
            if has_inval:
                u0 = jnp.where(val0, 0.0, u0)
                v0 = jnp.where(val0, 0.0, v0)
            dudy_f, dudx_f = jnp.gradient(u2f, step, step)
            dvdy_f, dvdx_f = jnp.gradient(v2f, step, step)

            def loc(full):
                return jax.lax.dynamic_slice(full, (org, 0), (rloc, Cf))

            u2 = loc(u2f)
            v2 = loc(v2f)
            from ..kernels.def_pallas import (def_pallas_supported,
                                              def_windows_pallas)

            if (eng._use_pallas() or cfg.pallas_interpret) and \
                    def_pallas_supported(w, cfg.def_margin, cfg.cws_interp):
                # per-shard DEF kernel over this shard's window-row block
                # (kernels/def_pallas.py — the XLA dense-gather path below
                # is ~2 orders of magnitude slower at production sizes);
                # windows beyond the 256-lane block fall through to XLA

                kw = dict(
                    frame_shape=cfg.frame_shape, wind_size=w, overlap=o,
                    max_shift=cfg.max_shift, margin=cfg.def_margin,
                    interpret=cfg.pallas_interpret,
                    flat_wrap=cfg.edge_exact, interp=cfg.cws_interp,
                    maps=cfg.shift_maps,
                    row_start=org, n_rows_local=rloc,
                    out_dtype=eng._window_store_dtype(),
                )
                args = [loc(x).reshape(-1) for x in
                        (u2f, v2f, dudx_f, dudy_f, dvdx_f, dvdy_f)]
                aa = def_windows_pallas(
                    frame_a.astype(dt), *(-x for x in args), **kw)
                bb = def_windows_pallas(frame_b.astype(dt), *args, **kw)
            else:
                off = jnp.arange(w, dtype=dt) - (w - 1) / 2.0
                n_w = rloc * Cf

                def dense(center, gx_, gy_):
                    return (
                        center.reshape(n_w, 1, 1)
                        + gx_.reshape(n_w, 1, 1) * off[None, None, :]
                        + gy_.reshape(n_w, 1, 1) * off[None, :, None]
                    )

                du_d = dense(u2, loc(dudx_f), loc(dudy_f))
                dv_d = dense(v2, loc(dvdx_f), loc(dvdy_f))
                resample = (bicubic_cws_shift
                            if cfg.cws_interp == "bicubic" else cws_shift)
                aa = resample(frame_a, r0w, c0w, w, -du_d, -dv_d, dt)
                bb = resample(frame_b, r0w, c0w, w, du_d, dv_d, dt)
        else:  # DWS
            if has_inval:
                u0 = jnp.where(val0, 0.0, u0)
                v0 = jnp.where(val0, 0.0, v0)
            u2 = jnp.rint(u0 / 2.0)
            v2 = jnp.rint(v0 / 2.0)
            aa = shift(frame_a, -u2.reshape(-1), -v2.reshape(-1))
            bb = shift(frame_b, u2.reshape(-1), v2.reshape(-1))

        wgt = eng._window_weight(p)
        if wgt is not None:  # anti-leakage taper, as in the engine's pass
            aa = aa * wgt
            bb = bb * wgt
        corr = eng._correlate(aa, bb)
        cand = None
        if want_second:
            du, dv, new_inval, (du2, dv2) = eng._peakfit(
                corr, validate, want_second=True)
            cand = (2.0 * u2 + du2.reshape(rloc, Cf),
                    2.0 * v2 + dv2.reshape(rloc, Cf))
        else:
            du, dv, new_inval = eng._peakfit(corr, validate)
        du = du.reshape(rloc, Cf)
        dv = dv.reshape(rloc, Cf)
        u_new = 2.0 * u2 + du
        v_new = 2.0 * v2 + dv
        mask_u = (du > u0) & (jnp.rint(u0) > 0)
        mask_v = (dv > v0) & (jnp.rint(v0) > 0)
        if new_inval is not None:
            new_inval = new_inval.reshape(rloc, Cf)
            mask_u = mask_u | new_inval
            mask_v = mask_v | new_inval
            out_inval = new_inval.astype(dt)
        else:
            out_inval = jnp.zeros((rloc, Cf), dt)
        u = jnp.where(mask_u, u0, u_new)
        v = jnp.where(mask_v, v0, v_new)
        u, v, out_inval = self._mask_local(p, u, v, out_inval, wr)
        if want_second:
            return u, v, out_inval, cand
        return u, v, out_inval
