"""HTTP serving mode (serve.py / `tpiv serve`): the engine stays hot
across requests; clients POST npz frame pairs (or server-readable paths)
and get physical-unit fields back."""
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from torchpiv_tpu.serve import PIVService, make_server
from torchpiv_tpu.utils.synthetic import particle_pair


@pytest.fixture(scope="module")
def server():
    service = PIVService(device="cpu", wind_size=32, overlap=16,
                         multipass=2, dt=1.0, scale=1.0)
    srv = make_server(service, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address
    yield f"http://{host}:{port}", service
    srv.shutdown()
    srv.server_close()


def _post(url, body, ctype):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, r.read()


def _npz(**arrays):
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def test_serve_piv_roundtrip(server):
    base, service = server
    fa, fb = particle_pair((128, 128), displacement=(2.0, 1.0), seed=3)
    status, body = _post(f"{base}/piv", _npz(a=fa, b=fb),
                         "application/octet-stream")
    assert status == 200
    with np.load(io.BytesIO(body)) as z:
        u, v, inval = z["u"], z["v"], z["invalid"]
    # physical units: px * scale/dt * 1000, y-flip on v
    assert abs(np.nanmean(u) - 2000.0) < 200
    assert abs(np.nanmean(v) + 1000.0) < 200
    assert inval.dtype == np.bool_
    # second pair reuses the compiled engine (served fast, counted)
    n0 = service.pairs_served
    status, _ = _post(f"{base}/piv", _npz(a=fa, b=fb),
                      "application/octet-stream")
    assert status == 200 and service.pairs_served == n0 + 1
    assert list(service._engines) == [(128, 128)]


def test_serve_piv_files_and_health_metrics(server, tmp_path):
    from torchpiv_tpu.io.decode import imwrite_gray

    base, _ = server
    fa, fb = particle_pair((128, 128), displacement=(1.0, -1.0), seed=4)
    pa, pb = str(tmp_path / "a.bmp"), str(tmp_path / "b.bmp")
    imwrite_gray(pa, fa)
    imwrite_gray(pb, fb)
    status, body = _post(f"{base}/piv_files",
                         json.dumps({"a": pa, "b": pb}).encode(),
                         "application/json")
    assert status == 200
    with np.load(io.BytesIO(body)) as z:
        assert abs(np.nanmean(z["u"]) - 1000.0) < 200

    with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
        h = json.loads(r.read())
    assert h["ok"] and [128, 128] in h["compiled_shapes"]
    with urllib.request.urlopen(f"{base}/config", timeout=30) as r:
        cfg = json.loads(r.read())
    assert cfg["wind_size"] == 32 and cfg["multipass"] == 2
    with urllib.request.urlopen(f"{base}/metrics", timeout=30) as r:
        text = r.read().decode()
    assert "tpiv_pairs_served" in text and "tpiv_latency_ms_median" in text


def test_serve_error_paths(server, tmp_path):
    base, service = server
    # malformed npz -> 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{base}/piv", b"not an npz", "application/octet-stream")
    assert ei.value.code in (400, 500)
    # missing arrays -> 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{base}/piv", _npz(q=np.zeros((8, 8))),
              "application/octet-stream")
    assert ei.value.code == 400
    # mismatched shapes -> 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{base}/piv",
              _npz(a=np.zeros((64, 64), np.uint8),
                   b=np.zeros((64, 32), np.uint8)),
              "application/octet-stream")
    assert ei.value.code == 400
    # unreadable files -> 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{base}/piv_files",
              json.dumps({"a": str(tmp_path / "no.bmp"), "b": "x"}).encode(),
              "application/json")
    assert ei.value.code == 400
    # unknown path -> 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(f"{base}/nope", timeout=30)
    assert ei.value.code == 404
    assert service.errors >= 3


def test_serve_piv_burst(server):
    """Stacked [B,H,W] submission: per-pair fields with the leading pair
    axis; a >50%-invalid pair comes back as a NaN plane + skipped_pairs
    mark instead of failing the burst."""
    base, service = server
    fa, fb = particle_pair((128, 128), displacement=(2.0, 1.0), seed=9)
    # constant frames: every window degenerate -> all vectors invalid
    # (white noise is NOT reliably >50% invalid at w=32: random peak
    # ratios pass the threshold often enough)
    junk_a = np.zeros(fa.shape, dtype=np.uint8)
    junk_b = np.zeros(fb.shape, dtype=np.uint8)
    a = np.stack([fa, junk_a, fa])
    b = np.stack([fb, junk_b, fb])
    status, body = _post(f"{base}/piv", _npz(a=a, b=b),
                         "application/octet-stream")
    assert status == 200
    with np.load(io.BytesIO(body)) as z:
        assert z["u"].shape[0] == 3
        assert list(z["skipped_pairs"]) == [False, True, False]
        good = z["u"][0][~z["invalid"][0]]
        assert abs(np.nanmean(good) - 2000) < 120
        assert np.isnan(z["u"][1]).all()
        np.testing.assert_allclose(z["u"][0], z["u"][2], atol=1e-6)

    # every pair skipped -> 422 like the single-pair contract
    status_all, body_all = None, None
    try:
        _post(f"{base}/piv", _npz(a=np.stack([junk_a]),
                                  b=np.stack([junk_b])),
              "application/octet-stream")
    except urllib.error.HTTPError as e:
        status_all, body_all = e.code, e.read()
    assert status_all == 422
    assert json.loads(body_all)["skipped"] is True

    # mismatched stacks -> 400 (non-vacuous: a 200 must fail the test)
    status_mm = None
    try:
        status_mm, _ = _post(f"{base}/piv", _npz(a=a, b=b[:2]),
                             "application/octet-stream")
    except urllib.error.HTTPError as e:
        status_mm = e.code
    assert status_mm == 400


def test_client_roundtrip(server, tmp_path):
    """PIVClient: the acquisition-machine wrapper — single pair, burst,
    file pair, skip -> None, error -> PIVServerError, ops endpoints."""
    from torchpiv_tpu.client import PIVClient, PIVServerError
    from torchpiv_tpu.io.decode import imwrite_gray

    base, service = server
    c = PIVClient(base)
    fa, fb = particle_pair((128, 128), displacement=(2.0, 1.0), seed=12)

    res = c.analyze(fa, fb)
    assert res is not None
    x, y, u, v, invalid = res
    assert abs(np.nanmean(u[~invalid]) - 2000) < 120

    burst = c.analyze_burst(np.stack([fa, fa]), np.stack([fb, fb]))
    assert burst["u"].shape[0] == 2
    assert list(burst["skipped_pairs"]) == [False, False]
    # scan vs single-pair graph: different fusions, last-ulp f32 drift
    np.testing.assert_allclose(burst["u"][0], u, atol=0.01)

    pa, pb = str(tmp_path / "a.bmp"), str(tmp_path / "b.bmp")
    imwrite_gray(pa, fa)
    imwrite_gray(pb, fb)
    xf, yf, uf, vf, invf = c.analyze_files(pa, pb)
    np.testing.assert_allclose(uf, u, atol=1e-6)

    # the skip quirk -> None, like OfflinePIV not yielding the pair
    z = np.zeros_like(fa)
    assert c.analyze(z, z) is None

    with pytest.raises(PIVServerError) as ei:
        c.analyze(fa, fb[:64])  # mismatched shapes
    assert ei.value.status == 400
    with pytest.raises(ValueError):
        c.analyze_burst(fa, fb)  # not stacked

    assert c.health()["ok"] is True
    assert c.config()["wind_size"] == 32
    assert "piv_pairs_served" in c.metrics() or "pairs" in c.metrics()


def test_serve_warmup_compiles_both_graphs():
    """PIVService.warmup must prepare BOTH the single-pair graph and the
    burst packed-scan executable — the old CLI warmup only exercised the
    single path, so the first real burst still paid the full compile."""
    service = PIVService(device="cpu", wind_size=32, overlap=16,
                         multipass=2)
    service.warmup((96, 96))
    assert (96, 96) in service._engines
    assert (96, 96) in service._batch_fns
