"""Trace-time guards for the band-DMA kernels' 256-lane addressing limit.

The shift/DEF kernels read each window tile as lanes ``s_col..s_col+T-1``
of a rolled 256-lane aligned block with ``s_col <= 127``; sizes where
``s_col + T`` can exceed 256 would silently wrap to the wrong frame
columns.  These tests pin (a) the kernels REJECT such sizes at trace time
and (b) the model routes them to the XLA paths instead.  All checks go
through ``jax.eval_shape`` — tracing only, no kernel execution — so they
stay in the quick suite.
"""
import jax
import jax.numpy as jnp
import pytest

from torchpiv_tpu.kernels.def_pallas import (def_pallas_supported,
                                             def_windows_pallas)
from torchpiv_tpu.kernels.shift_pallas import (shift_pallas_supported,
                                               shift_windows_pallas)
from torchpiv_tpu.models import MultipassPIV, PIVConfig

F32 = jnp.float32


def _shift_eval(w, interp, frame=512, variant="rolls"):
    n = ((frame - w) // (w // 2) + 1) ** 2
    jax.eval_shape(
        lambda f, vx, vy: shift_windows_pallas(
            f, vx, vy, frame_shape=(frame, frame), wind_size=w,
            overlap=w // 2, variant=variant, interp=interp),
        jax.ShapeDtypeStruct((frame, frame), F32),
        jax.ShapeDtypeStruct((n,), F32),
        jax.ShapeDtypeStruct((n,), F32),
    )


def _def_eval(w, margin, interp, frame=512):
    n = ((frame - w) // (w // 2) + 1) ** 2
    args = [jax.ShapeDtypeStruct((n,), F32)] * 6
    jax.eval_shape(
        lambda f, *a: def_windows_pallas(
            f, *a, frame_shape=(frame, frame), wind_size=w, overlap=w // 2,
            margin=margin, interp=interp),
        jax.ShapeDtypeStruct((frame, frame), F32), *args,
    )


def test_shift_supported_predicate():
    assert shift_pallas_supported(128, "bilinear")
    assert not shift_pallas_supported(130, "bilinear")
    assert shift_pallas_supported(125, "bicubic")
    assert not shift_pallas_supported(126, "bicubic")


def test_shift_bilinear_w128_traces():
    _shift_eval(128, "bilinear")


def test_shift_bilinear_w130_rejected():
    # was: ZeroDivisionError from the unconditional packed-group math; now a
    # clear ValueError for every variant
    with pytest.raises(ValueError, match="256-lane"):
        _shift_eval(130, "bilinear", frame=520)


def test_shift_bicubic_w128_rejected():
    with pytest.raises(ValueError, match="256-lane"):
        _shift_eval(128, "bicubic")


def test_shift_bicubic_w124_traces():
    _shift_eval(124, "bicubic", frame=496)


def test_def_supported_predicate():
    assert def_pallas_supported(124, 2, "bilinear")  # 124+4+1 = 129
    assert not def_pallas_supported(128, 2, "bilinear")  # 133 > 129
    assert def_pallas_supported(120, 2, "bicubic")  # 128
    assert not def_pallas_supported(124, 2, "bicubic")  # 132


def test_def_w124_traces_and_w128_rejected():
    _def_eval(124, 2, "bilinear", frame=496)
    with pytest.raises(ValueError, match="256-lane"):
        _def_eval(128, 2, "bilinear")


def test_model_def_large_window_falls_back_to_xla():
    """wind_size=256 multipass DEF (refinement w=128, margin 2) must trace
    with use_pallas='on': the engine routes the unsupported size to the XLA
    dense DEF path instead of tracing a silently-wrapping kernel."""
    cfg = PIVConfig(frame_shape=(512, 512), wind_size=256, overlap=128,
                    multipass=2, multipass_mode="DEF", use_pallas="on")
    f = jax.ShapeDtypeStruct((512, 512), F32)
    jax.eval_shape(MultipassPIV(cfg), f, f)


def test_model_bicubic_large_window_falls_back_to_xla():
    """wind_size=256 CWS bicubic (refinement w=128 > 125) must trace with
    use_pallas='on' via the XLA bicubic_cws_shift fallback."""
    cfg = PIVConfig(frame_shape=(512, 512), wind_size=256, overlap=128,
                    multipass=2, multipass_mode="CWS", cws_interp="bicubic",
                    use_pallas="on")
    f = jax.ShapeDtypeStruct((512, 512), F32)
    jax.eval_shape(MultipassPIV(cfg), f, f)
