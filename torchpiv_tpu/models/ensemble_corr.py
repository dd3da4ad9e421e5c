"""Ensemble (correlation-averaged) PIV.

For sparsely-seeded flows (micro-PIV) individual image pairs carry too few
particles for reliable peaks; the standard remedy is averaging the
*correlation planes* across many pairs before the peak fit (Meinhart et al.
2000).  The reference has no such mode; with this engine's batched
``[B, N, w, w]`` correlation tensor it is a single mean-reduction away.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.correlate import mean_normalize
from ..ops.windows import extract_windows
from .multipass import MultipassPIV, PIVConfig


class EnsemblePIV:
    """Correlation-averaged single-pass PIV over a batch of pairs.

    ``__call__(batch_a, batch_b)``: uint8 ``[B, H, W]`` batches ->
    ``(u, v, invalid)`` of the field shape — ONE averaged field for the
    whole batch.  Jittable; vmap/scan-free (the batch reduces inside).
    """

    def __init__(self, config: PIVConfig):
        if config.multipass != 1:
            raise ValueError(
                "ensemble correlation averaging is a single-pass method"
            )
        self.config = config
        self.engine = MultipassPIV(config)

    @property
    def final_coordinates(self):
        return self.engine.final_coordinates

    def __call__(self, batch_a: jnp.ndarray, batch_b: jnp.ndarray):
        cfg = self.config
        eng = self.engine
        w, o = eng.schedule[0]
        n_rows, n_cols = eng.field_shapes[0]
        dt = jnp.dtype(cfg.dtype)

        wgt = eng._window_weight(0)  # optional anti-leakage taper

        def corr_one(fa, fb):
            aa = mean_normalize(extract_windows(fa, w, o), dt)
            bb = mean_normalize(extract_windows(fb, w, o), dt)
            if wgt is not None:
                aa = aa * wgt
                bb = bb * wgt
            return eng._correlate(aa, bb)

        corr = jnp.mean(jax.vmap(corr_one)(batch_a, batch_b), axis=0)
        return self.finalize(corr)

    # ----- streaming accumulation (folders larger than one device batch) --

    def corr_batch(self, batch_a: jnp.ndarray, batch_b: jnp.ndarray
                   ) -> jnp.ndarray:
        """Summed correlation planes ``[N, w, w]`` for one uint8 pair batch.

        Jittable; accumulate sums across batches on device and divide by
        the total pair count before :meth:`finalize` (the Gaussian fit and
        the peak-ratio validation are scale-invariant, but the mean keeps
        the planes in a float32-friendly range for long runs)."""
        cfg = self.config
        eng = self.engine
        w, o = eng.schedule[0]
        dt = jnp.dtype(cfg.dtype)
        wgt = eng._window_weight(0)

        def corr_one(fa, fb):
            aa = mean_normalize(extract_windows(fa, w, o), dt)
            bb = mean_normalize(extract_windows(fb, w, o), dt)
            if wgt is not None:
                aa = aa * wgt
                bb = bb * wgt
            return eng._correlate(aa, bb)

        return jnp.sum(jax.vmap(corr_one)(batch_a, batch_b), axis=0)

    def finalize(self, corr: jnp.ndarray):
        """Peak-fit an (averaged) correlation stack ``[N, w, w]`` into the
        ``(u, v, invalid)`` field triple.  Jittable."""
        eng = self.engine
        n_rows, n_cols = eng.field_shapes[0]
        u, v, inval = eng._peakfit(corr, self.config.validate)
        u = u.reshape(n_rows, n_cols)
        v = v.reshape(n_rows, n_cols)
        if inval is not None:
            inval = inval.reshape(n_rows, n_cols)
        return u, v, inval
