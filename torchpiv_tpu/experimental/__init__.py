"""Measured-dead-end TPU kernel paths, quarantined but kept honest.

Everything here is BUILT, PARITY-TESTED, and MEASURED SLOWER than the
production XLA/Pallas chain on TPU v5e (measurement ledger:
docs/ROADMAP.md "pass fusion attempts" / round-3 levers).  They are kept
as opt-in reference points for future hardware or Mosaic revisions — no
production module imports this package unless the corresponding
``PIVConfig`` knob is explicitly set:

* ``fused_pass`` — whole-pass fused kernel (``PIVConfig.fused="on"``,
  80.3 vs 85.2 pairs/s: extraction-bound) and the split packed-layout
  correlate+peakfit kernel (``fused="split"``, 32.6 vs 11.2 ms/pair:
  latency-bound per-group chains lose to XLA's globally-batched DFT).
* ``peakfit_pallas`` — fused peak-fit kernel (``PIVConfig.peakfit="pallas"``,
  bit-exact but slower in-graph: layout copies at the pallas boundary).
* experimental shift-kernel variants (``PIVConfig.shift_variant`` in
  {"phases", "bf16", "mxu", "lanephases"}) live in
  ``kernels.shift_pallas`` behind the same opt-in knob.
"""

__all__ = ["fused_pass", "peakfit_pallas"]
