"""Mosaic lowering + map-layout regression tests for the Pallas kernels.

Round-4 production bug (found by the on-chip sweep, invisible to the
interpret-mode suite): the kernels' per-window shift maps were
whole-array scalar-prefetch operands, ALL resident in SMEM — 4 maps x
260 KB at the 255x255 vector grid of a w16/o8 pass on a 4 MP frame
(the second pass of the `w32 o16 2xCWS` sweep config; 8 maps for DEF),
over the TPU's 1 MB SMEM budget, so those production configs failed to
XLA-compile on hardware.  The fix streams the maps as row-blocked SMEM
operands (``maps="rows"``, the default).

Two classes of regression this file pins:

* rows-vs-prefetch bit-parity in interpret mode (cheap, every kernel);
* Mosaic *lowering* of the rows layout for the TPU backend via
  cross-platform lowering (``.trace(...).lower(lowering_platforms=
  ("tpu",))``) — Mosaic's block-mapping validation runs HOST-side at
  lowering, so this catches constraint violations (e.g. the
  last-two-dims divisibility rule that a 2-D ``(1, n_cols)`` SMEM block
  breaks) without a chip, at the exact 255x255 geometry that failed.
  Interpret mode skips these checks entirely, which is how the bug
  shipped.
"""
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchpiv_tpu.kernels.def_pallas import def_windows_pallas
from torchpiv_tpu.kernels.shift_pallas import shift_windows_pallas


def _mk(rng, H=96, W=96, w=32, ov=16):
    frame = rng.random((H, W)).astype(np.float32)
    n = ((H - w) // (w - ov) + 1) * ((W - w) // (w - ov) + 1)
    vx = (rng.random(n).astype(np.float32) - 0.5) * 6
    vy = (rng.random(n).astype(np.float32) - 0.5) * 6
    return frame, vx, vy, dict(frame_shape=(H, W), wind_size=w, overlap=ov,
                               interpret=True)


@pytest.mark.parametrize("interp", ["bilinear", "bicubic"])
def test_shift_maps_rows_matches_prefetch(rng, interp):
    frame, vx, vy, kw = _mk(rng)
    out = {}
    for maps in ("rows", "prefetch"):
        out[maps] = np.asarray(shift_windows_pallas(
            jnp.asarray(frame), jnp.asarray(vx), jnp.asarray(vy),
            maps=maps, interp=interp, **kw))
    np.testing.assert_array_equal(out["rows"], out["prefetch"])


@pytest.mark.parametrize("interp", ["bilinear", "bicubic"])
def test_def_maps_rows_matches_prefetch(rng, interp):
    frame, vx, vy, kw = _mk(rng)
    g = [(rng.random(vx.shape[0]).astype(np.float32) - 0.5) * 0.1
         for _ in range(4)]
    out = {}
    for maps in ("rows", "prefetch"):
        out[maps] = np.asarray(def_windows_pallas(
            jnp.asarray(frame), jnp.asarray(vx), jnp.asarray(vy),
            *(jnp.asarray(a) for a in g), maps=maps, interp=interp, **kw))
    np.testing.assert_array_equal(out["rows"], out["prefetch"])


def _cross_lower_tpu(fn, *avals):
    """Lower for the TPU backend from a CPU-only process; Mosaic's
    block-mapping validation runs during this call."""
    return jax.jit(fn).trace(*avals).lower(lowering_platforms=("tpu",))


def test_shift_rows_lowering_at_4mp_255_grid():
    # the exact geometry that failed on hardware: 4 MP frame, w16/o8 —
    # the SECOND pass of the `w32 o16 2xCWS` sweep config — gives a
    # 255x255 vector grid, where the legacy whole-array prefetch layout
    # needed 4 x 260 KB of SMEM (the first pass's 127x127 grid fits)
    H = W = 2048
    w, ov = 16, 8
    n = ((H - w) // (w - ov) + 1) ** 2
    fn = functools.partial(shift_windows_pallas, frame_shape=(H, W),
                           wind_size=w, overlap=ov, maps="rows")
    _cross_lower_tpu(
        fn,
        jax.ShapeDtypeStruct((H, W), jnp.float32),
        jax.ShapeDtypeStruct((n,), jnp.float32),
        jax.ShapeDtypeStruct((n,), jnp.float32),
    )


@pytest.mark.slow
def test_shift_maps_config_plumbs_and_validates(rng):
    """PIVConfig.shift_maps reaches the kernels (prefetch engine output ==
    rows engine output in interpret mode) and rejects unknown values.
    (slow: two whole-engine interpret-mode runs)"""
    from torchpiv_tpu.models import MultipassPIV, PIVConfig

    fa = rng.integers(0, 255, (128, 128)).astype(np.uint8)
    fb = np.roll(fa, (2, -1), axis=(0, 1))
    base = dict(frame_shape=(128, 128), wind_size=32, overlap=16,
                multipass=2, multipass_mode="CWS", use_pallas="on",
                pallas_interpret=True)
    out = {}
    for m in ("rows", "prefetch"):
        eng = MultipassPIV(PIVConfig(**base, shift_maps=m))
        out[m] = [np.asarray(t) for t in
                  eng(jnp.asarray(fa), jnp.asarray(fb))]
    for a, b in zip(out["rows"], out["prefetch"]):
        np.testing.assert_array_equal(a, b)


def test_shift_maps_config_validates():
    from torchpiv_tpu.models import PIVConfig

    with pytest.raises(ValueError, match="shift_maps"):
        PIVConfig(frame_shape=(128, 128), wind_size=32, overlap=16,
                  shift_maps="bogus")


def _lowered_hash_subprocess(pkg_dir, limit: int) -> str:
    """Hash the TPU-lowered production packed scan in a fresh process
    importing torchpiv_tpu from ``pkg_dir`` with the given
    ``jax_traceback_in_locations_limit``."""
    import subprocess
    import sys

    snippet = (
        "import sys, hashlib, jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"jax.config.update('jax_traceback_in_locations_limit', {limit})\n"
        f"sys.path.insert(0, {str(pkg_dir)!r})\n"
        "import jax.numpy as jnp\n"
        "from torchpiv_tpu.models.multipass import MultipassPIV, PIVConfig\n"
        "from torchpiv_tpu.pipeline import build_packed_scan\n"
        "cfg = PIVConfig(frame_shape=(96, 96), wind_size=32, overlap=16,\n"
        "                multipass=2, multipass_mode='CWS',\n"
        "                use_pallas='on')\n"
        "fn = build_packed_scan(MultipassPIV(cfg))\n"
        "s = jax.ShapeDtypeStruct((2, 96, 96), jnp.uint8)\n"
        "txt = fn.trace(s, s).lower(lowering_platforms=('tpu',)).as_text()\n"
        "print(hashlib.sha256(txt.encode()).hexdigest())\n")
    r = subprocess.run([sys.executable, "-c", snippet],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout.strip().splitlines()[-1]


@pytest.mark.slow
def test_cache_key_line_shift_invariance(tmp_path):
    """The Mosaic payload embeds source locations from the scan call
    site in pipeline.py, so a one-line edit ANYWHERE above it (even a
    comment at the top of the file) changed the persistent-cache key
    and forced a full remote recompile of unchanged graphs (measured
    Aug 19: ~3-5 min per deploy-touched file over the axon tunnel).
    enable_compile_cache sets jax_traceback_in_locations_limit=0, which
    must make lowering byte-identical under source line shifts — and
    the test first proves it is SENSITIVE with locations on (hashes
    differ at the default limit), so a jax behavior change cannot make
    it pass vacuously.  Faithful reproduction: two package COPIES, one
    with a comment inserted at pipeline.py line 30, each lowered in a
    fresh subprocess (in-process module reload cannot represent an
    edited installed package)."""
    import shutil

    import torchpiv_tpu

    src_pkg = os.path.dirname(os.path.abspath(torchpiv_tpu.__file__))
    plain, padded = tmp_path / "plain", tmp_path / "padded"
    for dst in (plain, padded):
        shutil.copytree(src_pkg, dst / "torchpiv_tpu",
                        ignore=shutil.ignore_patterns("__pycache__"))
    pp = padded / "torchpiv_tpu" / "pipeline.py"
    lines = pp.read_text().splitlines(keepends=True)
    lines.insert(29, "# line-shift probe: simulates a deploy edit\n")
    pp.write_text("".join(lines))

    with_locs = (_lowered_hash_subprocess(plain, 10),
                 _lowered_hash_subprocess(padded, 10))
    assert with_locs[0] != with_locs[1], (
        "lowering no longer embeds line-sensitive locations — the "
        "enable_compile_cache workaround may be removable")
    without = (_lowered_hash_subprocess(plain, 0),
               _lowered_hash_subprocess(padded, 0))
    assert without[0] == without[1]


def test_enable_compile_cache_drops_traceback_locations(tmp_path,
                                                        monkeypatch):
    monkeypatch.setenv("TORCHPIV_CACHE_DIR", str(tmp_path))
    from torchpiv_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    assert jax.config.jax_traceback_in_locations_limit == 0


def test_def_rows_lowering_at_odd_grid():
    # DEF at an odd (non-128-multiple) n_cols: pins the 3-D map BlockSpec
    # against Mosaic's last-two-dims rule (a 2-D (1, n_cols) SMEM block
    # fails it).  Small n_cols keeps the unrolled trace fast.
    H = W = 96
    w, ov = 32, 16
    n = ((H - w) // (w - ov) + 1) ** 2
    s = jax.ShapeDtypeStruct((n,), jnp.float32)
    fn = functools.partial(def_windows_pallas, frame_shape=(H, W),
                           wind_size=w, overlap=ov, maps="rows")
    _cross_lower_tpu(
        fn, jax.ShapeDtypeStruct((H, W), jnp.float32), s, s, s, s, s, s)
