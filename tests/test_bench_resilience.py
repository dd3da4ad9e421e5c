"""bench.py outage resilience: when the TPU backend cannot be acquired,
the benchmark must still print ONE machine-readable JSON line (null value
+ error diagnostic) and exit 0, instead of dying with a traceback — the
axon tunnel is observed hard-down for hours (see CLAUDE.md) and the
driver's round-end capture must record the outage, not a crash.
"""
import importlib.util
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_backend_ready_retries_and_reports(monkeypatch):
    bench = _load_bench()
    calls = []

    def fake_run(cmd, capture_output, text):
        calls.append(cmd)

        class R:
            returncode = 1
            stdout = ""
            stderr = "RuntimeError: Unable to initialize backend 'axon'"

        return R()

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench, "INIT_ATTEMPTS", 3)
    monkeypatch.setattr(bench, "INIT_BUDGET_S", 9999.0)
    ok, diag = bench.backend_ready()
    assert not ok
    assert len(calls) == 3
    assert "3 attempts" in diag and "axon" in diag


def test_backend_ready_budget_caps_attempts(monkeypatch):
    bench = _load_bench()
    calls = []
    clock = [0.0]

    def fake_run(cmd, capture_output, text):
        calls.append(cmd)
        clock[0] += 100.0  # each failed probe "takes" 100 s

        class R:
            returncode = 1
            stdout = ""
            stderr = "UNAVAILABLE"

        return R()

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "monotonic", lambda: clock[0])
    monkeypatch.setattr(bench, "INIT_ATTEMPTS", 10)
    monkeypatch.setattr(bench, "INIT_BUDGET_S", 150.0)
    ok, diag = bench.backend_ready()
    assert not ok
    # first attempt always runs; second would start at t=100 < 150 so runs;
    # third would start at t=200 >= 150 -> budget stops it
    assert len(calls) == 2
    assert "budget" in diag


def test_backend_ready_success_first_try(monkeypatch):
    bench = _load_bench()

    def fake_run(cmd, capture_output, text):
        class R:
            returncode = 0
            stdout = "BENCH_PROBE_OK [FakeDevice(id=0)]\n"
            stderr = ""

        return R()

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    ok, diag = bench.backend_ready()
    assert ok and diag == "ok"


def test_main_emits_json_error_and_exits_zero_when_down():
    """Full-process check: bench.py with an unusable probe prints a single
    JSON line with an ``error`` field and exits 0."""
    env = {
        "PATH": "/usr/bin:/bin",
        "BENCH_INIT_ATTEMPTS": "1",
        "BENCH_INIT_BUDGET_S": "30",
        # make every probe fail fast: the probe subprocess hits a bogus
        # platform before touching the tunnel
        "JAX_PLATFORMS": "definitely_not_a_platform",
        "HOME": "/tmp",
    }
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln]
    assert len(lines) == 1
    out = json.loads(lines[0])
    assert out["metric"] == "4MP_pairs_per_sec"
    assert out["value"] is None
    assert "error" in out and out["error"]
