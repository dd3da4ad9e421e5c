"""Config-matrix smoke test: every SUPPORTED PIVConfig knob combination
must build and trace.

``PIVConfig`` carries ~25 knobs; the parity suites cover each feature in
isolation, this sweep pins that the *combinations* compose — every config
here must construct, and the engine graph must trace (``jax.eval_shape`` —
no execution, stays quick).  Experimental knobs (``fused``, ``peakfit``,
non-default ``shift_variant``) route to ``torchpiv_tpu.experimental`` and
are traced once each to keep the quarantined paths importable.
"""
import itertools

import jax
import jax.numpy as jnp
import pytest

from torchpiv_tpu.models import MultipassPIV, PIVConfig

FRAME = (192, 256)
F = jax.ShapeDtypeStruct(FRAME, jnp.float32)


def _trace(**kw):
    cfg = PIVConfig(frame_shape=FRAME, wind_size=32, overlap=16,
                    multipass=2, **kw)
    eng = MultipassPIV(cfg)
    u, v, inval = jax.eval_shape(eng, F, F)
    assert u.shape == v.shape == eng.final_field_shape
    return u, v, inval


CORE = list(itertools.product(
    ["CWS", "DWS", "DEF"],          # multipass_mode
    ["bilinear", "bicubic"],        # cws_interp
    ["gauss3", "gauss2d"],          # subpixel
    ["on", "off"],                  # use_pallas (on = kernels trace)
))


@pytest.mark.parametrize("mode,interp,fit,pallas", CORE)
def test_core_matrix_traces(mode, interp, fit, pallas):
    _trace(multipass_mode=mode, cws_interp=interp, subpixel=fit,
           use_pallas=pallas)


@pytest.mark.parametrize("median", [None, "median", "normmedian"])
@pytest.mark.parametrize("weight", [None, "gaussian"])
@pytest.mark.parametrize("infill", ["host", "fused", "none"])
def test_postprocess_matrix_traces(median, weight, infill):
    _trace(median_filter=median, window_weight=weight, infill=infill,
           use_pallas="on")


@pytest.mark.parametrize("correlator", ["fft", "matmul"])
@pytest.mark.parametrize("precision", ["default", "high", "highest"])
def test_correlator_matrix_traces(correlator, precision):
    _trace(correlator=correlator, dft_precision=precision)


@pytest.mark.parametrize("kw", [
    dict(correlator="fft"),
    dict(correlator="matmul"),
    dict(multipass_mode="DEF", use_pallas="on"),
    dict(cws_interp="bicubic", subpixel="gauss2d"),
    dict(window_weight="gaussian", median_filter="normmedian"),
    dict(infill="fused", peakfit="pallas"),
])
def test_rpc_matrix_traces(kw):
    """correlation='rpc' composes with both correlator backends and the
    quality knobs (it is an elementwise insert on the spectrum product)."""
    _trace(correlation="rpc", **kw)


def test_rpc_rejects_fused_and_bad_diameter():
    with pytest.raises(ValueError):
        _trace(correlation="rpc", fused="split")
    with pytest.raises(ValueError):
        _trace(correlation="rpc", fused="on")
    with pytest.raises(ValueError):
        _trace(correlation="rpc", rpc_diameter=0.0)
    with pytest.raises(ValueError):
        _trace(correlation="nope")


@pytest.mark.parametrize("kw", [
    dict(fused="on"),
    dict(fused="split"),
    dict(peakfit="pallas"),
    dict(shift_variant="phases", use_pallas="on"),
    dict(shift_variant="bf16", use_pallas="on"),
    dict(shift_variant="mxu", use_pallas="on"),
    dict(shift_variant="lanephases", use_pallas="on"),
])
def test_experimental_knobs_still_trace(kw):
    """The quarantined paths stay importable and traceable behind their
    opt-in knobs (measured numbers: docs/ROADMAP.md)."""
    _trace(**kw)


@pytest.mark.parametrize("kw", [
    dict(validate=False),
    dict(edge_exact=False, use_pallas="on"),
    dict(max_shift=8, use_pallas="on"),
    dict(def_margin=4, multipass_mode="DEF", use_pallas="on"),
    dict(multipass_mode="DEF", cws_interp="bicubic", use_pallas="on"),
    dict(window_weight="gaussian", cws_interp="bicubic"),
    dict(subpixel="gauss2d", median_filter="normmedian", infill="fused"),
])
def test_spot_combinations_trace(kw):
    _trace(**kw)


MASK_COMBOS = list(itertools.product(
    ["CWS", "DWS", "DEF"],          # multipass_mode
    [True, False],                  # validate
    [None, "median"],               # median_filter
    ["host", "fused"],              # infill
))


@pytest.mark.parametrize("mode,validate,median,infill", MASK_COMBOS)
def test_frame_mask_matrix_traces(mode, validate, median, infill):
    """The static ROI mask composes with every pass mode, with and
    without validation / median filtering / fused infill."""
    import numpy as np

    mask = np.zeros(FRAME, bool)
    mask[:64, :] = True
    cfg = PIVConfig(frame_shape=FRAME, wind_size=32, overlap=16,
                    multipass=2, multipass_mode=mode, validate=validate,
                    median_filter=median, infill=infill, use_pallas="on")
    eng = MultipassPIV(cfg, frame_mask=mask)
    u, v, inval = jax.eval_shape(eng, F, F)
    assert u.shape == eng.final_field_shape
    assert inval is not None  # the mask always yields an inval field
