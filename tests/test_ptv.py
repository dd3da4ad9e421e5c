"""PTV (ops/particles.py + models/ptv.py) against planted particles."""
import numpy as np
import pytest

from torchpiv_tpu.models.ptv import PTV, match_particles
from torchpiv_tpu.ops.particles import detect_particles
from torchpiv_tpu.utils.synthetic import render_particles


def _frame(xs, ys, shape=(256, 320), inten=180.0, noise=1.5, seed=0):
    rng = np.random.default_rng(seed)
    f = render_particles(shape, np.asarray(xs), np.asarray(ys),
                         np.full(len(xs), inten), diameter=3.0)
    f = f + rng.normal(0, noise, shape).astype(np.float32) + 8.0
    return np.clip(f, 0, 255).astype(np.uint8)


def test_detect_subpixel_accuracy():
    rng = np.random.default_rng(1)
    n = 50
    xs = rng.uniform(12, 308, n)
    ys = rng.uniform(12, 244, n)
    f = _frame(xs, ys)
    dx, dy, resp, valid = map(np.asarray,
                              detect_particles(f, 128, 3, smooth_sigma=1.3))
    from scipy.spatial import cKDTree
    det = np.count_nonzero(valid)
    assert det >= 0.9 * n
    d, j = cKDTree(np.column_stack([xs, ys])).query(
        np.column_stack([dx[valid], dy[valid]]))
    assert np.median(d) < 0.06
    assert len(set(j.tolist())) == det  # one detection per particle


def test_detect_saturated_plateau_single_detection():
    f = _frame([100.0], [80.0], inten=3000.0, noise=0.0)  # clipped to 255
    assert (f == 255).sum() >= 4  # genuinely saturated plateau
    dx, dy, _, valid = map(np.asarray, detect_particles(f, 16, 3))
    assert np.count_nonzero(valid) == 1
    assert abs(dx[0] - 100.0) < 0.5 and abs(dy[0] - 80.0) < 0.5


def test_detect_blank_frame_no_detections():
    """A constant (dropped/black) frame must yield zero detections, not
    max_particles raster-position fakes (flat windows tie the max-pool)."""
    for val in (0, 37):
        f = np.full((128, 128), val, dtype=np.uint8)
        _, _, _, valid = map(np.asarray, detect_particles(f, 64, 3))
        assert np.count_nonzero(valid) == 0


def test_match_contested_particle_goes_to_closer():
    # two A-particles both nearest to b0; the closer one must win, the
    # other falls back to its second-nearest candidate
    xa, ya = np.array([0.0, 1.0]), np.array([0.0, 0.0])
    xb, yb = np.array([0.2, 1.6]), np.array([0.0, 0.0])
    ia, ib, d = match_particles(xa, ya, xb, yb, radius=2.0)
    pairs = dict(zip(ia.tolist(), ib.tolist()))
    assert pairs == {0: 0, 1: 1}


def test_match_empty_inputs():
    ia, ib, d = match_particles(np.zeros(0), np.zeros(0),
                                np.zeros(3), np.zeros(3))
    assert ia.size == ib.size == d.size == 0


def test_ptv_uniform_flow_no_predictor():
    rng = np.random.default_rng(2)
    n = 60
    xs = rng.uniform(16, 300, n)
    ys = rng.uniform(16, 236, n)
    du, dv = 3.3, -2.1
    a = _frame(xs, ys, seed=3)
    b = _frame(xs + du, ys + dv, seed=4)
    ptv = PTV((256, 320), max_particles=128)
    res = ptv(a, b)
    assert res.x.size >= 0.8 * n
    assert abs(np.median(res.u) - du) < 0.1
    assert abs(np.median(res.v) - dv) < 0.1
    # per-track accuracy (not just the median)
    assert np.percentile(np.abs(res.u - du), 90) < 0.25
    assert np.percentile(np.abs(res.v - dv), 90) < 0.25


def test_ptv_piv_guided_beats_plain_on_shear():
    """Strong shear + displacement larger than the inter-particle spacing:
    plain nearest-neighbour mismatches, the PIV predictor disambiguates."""
    from torchpiv_tpu.models.multipass import PIVConfig

    rng = np.random.default_rng(5)
    shape = (256, 320)
    n = 350  # dense: mean spacing ~ sqrt(256*320/350) ~ 15 px
    xs = rng.uniform(8, 312, n)
    ys = rng.uniform(8, 248, n)
    du = 6.0 + 0.05 * ys          # shear du/dy = 0.05, disp 6..19 px
    dv = np.zeros(n)
    a = _frame(xs, ys, shape=shape, seed=6)
    b = _frame(xs + du, ys + dv, shape=shape, seed=7)

    def track_errors(res):
        from scipy.spatial import cKDTree
        d, j = cKDTree(np.column_stack([xs, ys])).query(
            np.column_stack([res.x, res.y]))
        ok = d < 1.0
        true_u = du[j[ok]]
        return np.abs(res.u[ok] - true_u)

    cfg = PIVConfig(frame_shape=shape, wind_size=64, overlap=32,
                    multipass=2)
    guided = PTV(shape, piv_config=cfg, max_particles=512,
                 search_radius=3.0)
    res_g = track_errors(guided(a, b))
    plain = PTV(shape, max_particles=512, search_radius=20.0)
    res_p = track_errors(plain(a, b))
    good_g = np.mean(res_g < 0.5)
    good_p = np.mean(res_p < 0.5)
    assert good_g > 0.9
    assert good_g > good_p + 0.05  # the predictor must actually help


def test_cli_ptv(tmp_path):
    import os

    from torchpiv_tpu.cli import main as cli_main
    from torchpiv_tpu.io.decode import imwrite_gray

    rng = np.random.default_rng(9)
    n = 40
    xs = rng.uniform(16, 240, n)
    ys = rng.uniform(16, 240, n)
    folder = str(tmp_path / "frames")
    os.makedirs(folder)
    imwrite_gray(os.path.join(folder, "p0_a.bmp"),
                 _frame(xs, ys, shape=(256, 256), seed=10))
    imwrite_gray(os.path.join(folder, "p0_b.bmp"),
                 _frame(xs + 2.0, ys - 1.0, shape=(256, 256), seed=11))
    out = str(tmp_path / "out")
    rc = cli_main(["ptv", folder, "--no-piv", "--max-particles", "128",
                   "--search-radius", "6", "--out", out])
    assert rc == 0
    path = os.path.join(out, "ptv_0000.txt")
    header = open(path).readline().split(", ")
    data = np.loadtxt(path, skiprows=1, delimiter=",")
    u = data[:, header.index("Vx[m/s]")]
    v = data[:, header.index("Vy[m/s]")]
    # defaults scale=dt=1 -> px*1000; Vy carries the physical sign flip
    assert abs(np.median(u) / 1000 - 2.0) < 0.1
    assert abs(np.median(v) / 1000 - 1.0) < 0.1
    # y follows the pipeline's image->physical flip: a particle near the
    # image TOP (small image y) must read a LARGE y[mm]
    ty = data[:, header.index("y[mm]")]
    from scipy.spatial import cKDTree
    tx = data[:, header.index("x[mm]")]
    top = np.argmin(ys)  # planted particle nearest the image top
    d, j = cKDTree(np.column_stack([tx, ty])).query(
        [xs[top], 255.0 - ys[top]])
    assert d < 1.5  # found at the flipped position


def test_bin_to_grid_recovers_shear():
    from torchpiv_tpu.models.ptv import bin_to_grid
    from torchpiv_tpu.ops.geometry import get_coordinates

    rng = np.random.default_rng(12)
    shape = (256, 320)
    n = 800
    x = rng.uniform(0, 320, n)
    y = rng.uniform(0, 256, n)
    u = 2.0 + 0.02 * y
    v = np.full(n, -1.0)
    gx, gy, gu, gv, cnt = bin_to_grid(x, y, u, v, shape,
                                      wind_size=32, overlap=16)
    assert gx.shape == get_coordinates(shape, 32, 16)[0].shape
    filled = np.isfinite(gu)
    assert filled.mean() > 0.95
    # Gaussian binning of a linear field is unbiased at the node
    err = np.abs(gu[filled] - (2.0 + 0.02 * gy[filled]))
    assert np.median(err) < 0.05
    assert np.abs(gv[filled] + 1.0).max() < 0.05
    assert (cnt[filled] >= 1).all()


def test_bin_to_grid_sparse_and_empty():
    from torchpiv_tpu.models.ptv import bin_to_grid

    gx, gy, gu, gv, cnt = bin_to_grid(np.zeros(0), np.zeros(0),
                                      np.zeros(0), np.zeros(0),
                                      (128, 128))
    assert np.isnan(gu).all() and cnt.sum() == 0
    # one isolated track fills only nearby nodes
    gx, gy, gu, gv, cnt = bin_to_grid(np.array([64.0]), np.array([64.0]),
                                      np.array([3.0]), np.array([0.0]),
                                      (128, 128), wind_size=32, overlap=16)
    near = np.hypot(gx - 64, gy - 64) < 32
    assert np.isfinite(gu[near]).all()
    assert np.isnan(gu[~near]).all()
    assert np.allclose(gu[near], 3.0)


def test_link_trajectories_rotating_flow():
    """Linking per-pair results over a sequence recovers full-length
    Lagrangian tracks and centripetal acceleration (models/ptv.py)."""
    from torchpiv_tpu.models.ptv import PTVResult, link_trajectories

    rng = np.random.default_rng(20)
    m = 20
    om, r0 = 0.08, 60.0  # rad/frame, px
    phi0 = rng.uniform(0, 2 * np.pi, m)
    rad = r0 + rng.uniform(-10, 10, m)
    cx = cy = 128.0

    def pos(t):
        return (cx + rad * np.cos(phi0 + om * t),
                cy + rad * np.sin(phi0 + om * t))

    n_frames = 8
    results = []
    for p in range(n_frames - 1):
        xa, ya = pos(p)
        xb, yb = pos(p + 1)
        noise = rng.normal(0, 0.01, (4, m))
        results.append(PTVResult(
            x=xa + noise[0], y=ya + noise[1],
            u=(xb + noise[2]) - (xa + noise[0]),
            v=(yb + noise[3]) - (ya + noise[1]),
            residual=np.zeros(m), n_a=m, n_b=m))
    tracks = link_trajectories(results, radius=1.0, min_length=n_frames)
    assert len(tracks) == m  # every particle followed end-to-end
    for trk in tracks[:5]:
        assert len(trk) == n_frames
        u, v, ax, ay = trk.kinematics(dt=1.0)
        # centripetal: |a| = om^2 * r, pointing to the center (interior
        # samples; ends are one-sided)
        amag = np.hypot(ax, ay)[2:-2]
        r_here = np.hypot(trk.x - cx, trk.y - cy)[2:-2]
        assert np.allclose(amag, om**2 * r_here, rtol=0.05)


def test_link_trajectories_lost_particle_closes_track():
    from torchpiv_tpu.models.ptv import PTVResult, link_trajectories

    def res(xa, xb):
        xa, xb = np.asarray(xa, float), np.asarray(xb, float)
        z = np.zeros_like(xa)
        return PTVResult(x=xa, y=z, u=xb - xa, v=z,
                         residual=z, n_a=xa.size, n_b=xb.size)

    # particle at x=10 tracked in pairs 0,1 then lost; particle at x=50
    # spans all three pairs
    results = [res([10, 50], [12, 52]), res([12, 52], [14, 54]),
               res([54], [56])]
    tracks = link_trajectories(results, radius=0.5, min_length=2)
    lengths = sorted(len(t) for t in tracks)
    assert lengths == [3, 4]
    long = max(tracks, key=len)
    assert np.allclose(long.x, [50, 52, 54, 56])
    assert np.array_equal(long.frames, [0, 1, 2, 3])


def test_link_trajectories_end_to_end_images():
    from torchpiv_tpu.models.ptv import link_trajectories

    rng = np.random.default_rng(21)
    n = 30
    xs = rng.uniform(20, 300, n)
    ys = rng.uniform(20, 236, n)
    du, dv = 2.5, 1.5
    frames = [_frame(xs + du * t, ys + dv * t, seed=30 + t)
              for t in range(5)]
    ptv = PTV((256, 320), max_particles=64, search_radius=6.0)
    results = [ptv(frames[t], frames[t + 1]) for t in range(4)]
    tracks = link_trajectories(results, radius=1.0, min_length=5)
    assert len(tracks) >= 0.7 * n
    for trk in tracks[:3]:
        u, v, _, _ = trk.kinematics()
        assert abs(np.median(u) - du) < 0.15
        assert abs(np.median(v) - dv) < 0.15


def test_cli_ptv_link(tmp_path):
    import os

    from torchpiv_tpu.cli import main as cli_main
    from torchpiv_tpu.io.decode import imwrite_gray

    rng = np.random.default_rng(22)
    n = 25
    xs = rng.uniform(20, 230, n)
    ys = rng.uniform(20, 230, n)
    folder = str(tmp_path / "frames")
    os.makedirs(folder)
    for t in range(5):
        imwrite_gray(os.path.join(folder, f"f{t:03d}.bmp"),
                     _frame(xs + 2.0 * t, ys - 1.0 * t, shape=(256, 256),
                            seed=40 + t))
    out = str(tmp_path / "out")
    rc = cli_main(["ptv", folder, "--no-piv", "--folder-mode", "sequential",
                   "--max-particles", "64", "--search-radius", "5",
                   "--link", "--min-length", "4", "--out", out])
    assert rc == 0
    path = os.path.join(out, "ptv_tracks.txt")
    header = open(path).readline().split(", ")
    data = np.loadtxt(path, skiprows=1, delimiter=",")
    tids = data[:, header.index("track[1]")]
    assert len(np.unique(tids)) >= 0.6 * n
    # pairs mode + --link is rejected loudly
    rc = cli_main(["ptv", folder, "--no-piv", "--link",
                   "--max-particles", "64"])
    assert rc == 1


def test_cli_view_scattered_ptv_table(tmp_path, monkeypatch):
    import os

    from torchpiv_tpu.cli import main as cli_main
    from torchpiv_tpu.io.decode import imwrite_gray

    rng = np.random.default_rng(23)
    n = 20
    xs = rng.uniform(20, 230, n)
    ys = rng.uniform(20, 230, n)
    folder = str(tmp_path / "frames")
    os.makedirs(folder)
    imwrite_gray(os.path.join(folder, "p0_a.bmp"),
                 _frame(xs, ys, shape=(256, 256), seed=50))
    imwrite_gray(os.path.join(folder, "p0_b.bmp"),
                 _frame(xs + 2.0, ys, shape=(256, 256), seed=51))
    out = str(tmp_path / "out")
    assert cli_main(["ptv", folder, "--no-piv", "--max-particles", "64",
                     "--search-radius", "5", "--out", out]) == 0
    monkeypatch.chdir(tmp_path)
    rc = cli_main(["view", os.path.join(out, "ptv_0000.txt")])
    assert rc == 0
    assert (tmp_path / "ptv_0000_view.png").exists()


def test_ptv_frame_mask_excludes_region():
    rng = np.random.default_rng(25)
    n = 40
    xs = rng.uniform(16, 300, n)
    ys = rng.uniform(16, 236, n)
    a = _frame(xs, ys, seed=26)
    b = _frame(xs + 2.0, ys + 1.0, seed=27)
    mask = np.zeros((256, 320), dtype=bool)
    mask[:, :160] = True  # exclude the left half
    ptv = PTV((256, 320), max_particles=128, search_radius=6.0,
              frame_mask=mask)
    res = ptv(a, b)
    assert res.x.size > 0
    assert (res.x >= 158).all()  # no tracks start in the masked region
    import pytest as _pytest
    with _pytest.raises(ValueError):
        PTV((128, 128), frame_mask=np.zeros((64, 64), dtype=bool))


def test_temporal_predictor_tracks_fast_sequence():
    """Sequential tracking without the PIV engine: the previous pair's
    tracks predict the next pair's matching, so displacements beyond the
    inter-particle spacing stay tracked once bootstrapped."""
    rng = np.random.default_rng(31)
    shape = (256, 320)
    n = 250  # mean spacing ~18 px
    xs = rng.uniform(8, 300, n)
    ys = rng.uniform(8, 248, n)
    du = 8.0 + 0.04 * ys  # 8-18 px/frame, above NN ambiguity
    frames = [_frame(xs + du * t, ys, shape=shape, seed=60 + t)
              for t in range(3)]
    # bootstrap pair 0 with a radius that covers the motion, then track
    # pair 1 with a TIGHT radius that only works via the predictor
    boot = PTV(shape, max_particles=512, search_radius=22.0)
    res0 = boot(frames[0], frames[1])
    tight = PTV(shape, max_particles=512, search_radius=3.0)
    res_guided = tight(frames[1], frames[2], prev=res0)
    res_plain = tight(frames[1], frames[2])
    assert res_guided.x.size > 3 * max(res_plain.x.size, 1)
    from scipy.spatial import cKDTree
    d, j = cKDTree(np.column_stack([xs + du, ys])).query(
        np.column_stack([res_guided.x, res_guided.y]))
    ok = d < 1.0
    err = np.abs(res_guided.u[ok] - du[j[ok]])
    assert np.median(err) < 0.2


def test_link_trajectories_gap_closes_tracks():
    """A skipped (unreadable) pair must break tracks, not join positions
    a full frame of motion apart."""
    from torchpiv_tpu.models.ptv import PTVResult, link_trajectories

    def res(xa, xb):
        xa, xb = np.asarray(xa, float), np.asarray(xb, float)
        z = np.zeros_like(xa)
        return PTVResult(x=xa, y=z, u=xb - xa, v=z,
                         residual=z, n_a=xa.size, n_b=xb.size)

    # pairs 0,1 then pair 3 (pair 2 unreadable); the particle keeps
    # moving +2/frame so pair 3 starts near where pair 1 ended
    results = [res([10], [12]), res([12], [14]), res([16], [18])]
    tracks = link_trajectories(results, radius=0.5, min_length=2,
                               pair_indices=[0, 1, 3])
    lengths = sorted(len(t) for t in tracks)
    assert lengths == [2, 3]  # 3-sample track (pairs 0-1), 2-sample (pair 3)
    long = max(tracks, key=len)
    assert np.array_equal(long.frames, [0, 1, 2])
    with pytest.raises(ValueError):
        link_trajectories(results, pair_indices=[0, 1])


def test_cli_view_empty_ptv_table(tmp_path, monkeypatch):
    import os

    from torchpiv_tpu.cli import main as cli_main

    p = tmp_path / "ptv_0000.txt"
    p.write_text("x[mm], y[mm], Vx[m/s], Vy[m/s], residual[px]\n")
    monkeypatch.chdir(tmp_path)
    assert cli_main(["view", str(p)]) == 1  # message, not a traceback


def test_cli_view_tracks_table(tmp_path, monkeypatch):
    from torchpiv_tpu.cli import main as cli_main
    from torchpiv_tpu.utils.persistence import save_table

    save_table("ptv_tracks.txt", str(tmp_path), {
        "track[1]": np.array([0.0, 0, 0, 1, 1, 1]),
        "frame[1]": np.array([0.0, 1, 2, 0, 1, 2]),
        "x[mm]": np.array([1.0, 2, 3, 5, 6, 7]),
        "y[mm]": np.array([1.0, 1, 1, 4, 4, 4]),
    })
    monkeypatch.chdir(tmp_path)
    assert cli_main(["view", str(tmp_path / "ptv_tracks.txt")]) == 0
    assert (tmp_path / "ptv_tracks_view.png").exists()


def test_ptv_frame_shape_mismatch_raises():
    from torchpiv_tpu.models.multipass import PIVConfig

    cfg = PIVConfig(frame_shape=(128, 128), wind_size=32, overlap=16)
    with pytest.raises(ValueError):
        PTV((256, 256), piv_config=cfg)


def test_vtk_tracks_written(tmp_path):
    from torchpiv_tpu.models.ptv import Trajectory
    from torchpiv_tpu.utils.persistence import save_vtk_tracks

    tracks = [Trajectory(frames=np.array([0, 1, 2]),
                         x=np.array([1.0, 2.0, 3.0]),
                         y=np.array([5.0, 5.5, 6.0])),
              Trajectory(frames=np.array([1, 2]),
                         x=np.array([10.0, 11.0]),
                         y=np.array([0.0, 0.1]))]
    out = save_vtk_tracks("t.vtk", str(tmp_path), tracks, scale=2.0)
    txt = open(out).read()
    assert "DATASET POLYDATA" in txt
    assert "POINTS 5 float" in txt
    assert "LINES 2 7" in txt       # (3+1) + (2+1)
    assert "2 10 0" in txt          # scaled first point (x*2, y*2)
    assert "SCALARS track float 1" in txt
    # physical y flip matches the .txt outputs' convention
    out2 = save_vtk_tracks("t2.vtk", str(tmp_path), tracks, scale=2.0,
                           frame_height=256)
    assert "2 500 0" in open(out2).read()  # (256-1-5)*2
    import pytest as _pytest
    with _pytest.raises(ValueError):
        save_vtk_tracks("t3.vtk", str(tmp_path), [])
