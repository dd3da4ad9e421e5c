"""Coverage for small utilities: profiling, device map, misc helpers."""
import logging
import os
import time

import numpy as np
import pytest

from torchpiv_tpu.pipeline import DeviceMap
from torchpiv_tpu.utils import free_device_memory
from torchpiv_tpu.utils.persistence import make_name
from torchpiv_tpu.utils.profiling import StageTimers, Throughput, device_trace


def test_stage_timers():
    timers = StageTimers()
    with timers.stage("decode"):
        time.sleep(0.01)
    with timers.stage("decode"):
        time.sleep(0.01)
    with timers.stage("compute"):
        pass
    report = timers.report()
    assert report["decode"]["count"] == 2
    assert report["decode"]["mean_ms"] >= 5
    assert "compute" in report


def test_throughput_meter():
    t = Throughput()
    t.tick(4)
    time.sleep(0.01)
    t.tick(4)
    assert t.pairs_per_sec > 0


def test_device_trace_noop_and_real(tmp_path):
    with device_trace(None):
        pass
    with device_trace(str(tmp_path / "trace")):
        np.ones(4).sum()
    # jax profiler writes a plugins/profile dir
    assert any("plugin" in d or "profile" in d.lower()
               for _, dirs, _ in os.walk(tmp_path / "trace") for d in dirs) or \
        os.path.exists(tmp_path / "trace")


def test_device_map():
    devs = DeviceMap.devices()
    assert "cpu" in devs
    assert DeviceMap.resolve("cpu").platform == "cpu"
    assert DeviceMap.resolve("cpu:0").platform == "cpu"
    assert DeviceMap.resolve("auto") is not None
    with pytest.raises(ValueError, match="unknown device"):
        DeviceMap.resolve("gpu:7")
    with pytest.raises(ValueError, match="unknown device"):
        DeviceMap.resolve("cpu:99")  # out-of-range index


def test_resolve_platform_touches_only_that_backend(monkeypatch):
    """resolve('cpu') must never initialise OTHER platforms' runtimes —
    on a host whose accelerator is remote and down, enumerating it blocks
    for minutes even though the caller asked for the CPU."""
    import jax as _jax

    calls = []
    real = _jax.devices

    def spy(platform=None):
        calls.append(platform)
        return real(platform)

    monkeypatch.setattr(_jax, "devices", spy)
    assert DeviceMap.resolve("cpu").platform == "cpu"
    assert calls == ["cpu"]


def test_free_device_memory_runs():
    free_device_memory()


def test_make_name():
    fname, save_dir = make_name("/data/run42/", "Vx[m/s]", True)
    assert fname == "run42_Vx_Hor_profile.txt"
    assert save_dir.endswith("Out")


def test_unreadable_first_pair_builds_engine_from_next(tmp_path):
    from torchpiv_tpu.io.decode import imwrite_gray
    from torchpiv_tpu.pipeline import OfflinePIV
    from torchpiv_tpu.utils.synthetic import particle_pair

    (tmp_path / "a0_a.bmp").write_bytes(b"junk")
    (tmp_path / "a0_b.bmp").write_bytes(b"junk")
    fa, fb = particle_pair((128, 128), displacement=(2.0, 1.0), seed=9)
    imwrite_gray(str(tmp_path / "a1_a.bmp"), fa)
    imwrite_gray(str(tmp_path / "a1_b.bmp"), fb)
    piv = OfflinePIV(str(tmp_path), device="cpu", file_fmt=".bmp",
                     wind_size=32, overlap=16)
    results = list(piv())
    assert len(results) == 1  # junk pair skipped, good pair processed


def test_compile_cache_enable(tmp_path, monkeypatch):
    """enable_compile_cache creates the dir, is idempotent (first caller
    wins), and honors the kill switch."""
    from torchpiv_tpu.utils import compile_cache as cc

    monkeypatch.setattr(cc, "_enabled_dir", None)
    monkeypatch.delenv("TORCHPIV_NO_COMPILE_CACHE", raising=False)
    d = tmp_path / "xla"
    got = cc.enable_compile_cache(str(d))
    assert got == str(d) and d.is_dir()
    # second call (different dir) returns the first: jax config is global
    assert cc.enable_compile_cache(str(tmp_path / "other")) == str(d)

    monkeypatch.setattr(cc, "_enabled_dir", None)
    monkeypatch.setenv("TORCHPIV_NO_COMPILE_CACHE", "1")
    assert cc.enable_compile_cache(str(tmp_path / "off")) is None
    assert not (tmp_path / "off").exists()


def test_compile_cache_env_dir(tmp_path, monkeypatch):
    from torchpiv_tpu.utils import compile_cache as cc

    monkeypatch.setattr(cc, "_enabled_dir", None)
    monkeypatch.delenv("TORCHPIV_NO_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("TORCHPIV_CACHE_DIR", str(tmp_path / "envdir"))
    assert cc.enable_compile_cache() == str(tmp_path / "envdir")


def test_saved_series_key_orders_uniquified_outputs():
    """Files written through uniquify() ('name.npy', 'name (1).npy', ...)
    must sort in ACQUISITION order — plain natural_keys puts the bare
    name last (' ' < '.'), rotating the time series fed to DMD/SPOD."""
    from torchpiv_tpu.utils.persistence import natural_keys, saved_series_key

    files = [f"run_pair ({i}).npy" for i in range(1, 12)] + ["run_pair.npy"]
    got = sorted(files, key=saved_series_key)
    assert got[0] == "run_pair.npy"
    assert got[1] == "run_pair (1).npy"
    assert got[-1] == "run_pair (11).npy"
    # the buggy ordering this guards against
    assert sorted(files, key=natural_keys)[-1] == "run_pair.npy"
    # distinct explicit names keep plain natural order
    named = [f"f{i:d}.npy" for i in (10, 2, 1)]
    assert sorted(named, key=saved_series_key) == ["f1.npy", "f2.npy",
                                                   "f10.npy"]
