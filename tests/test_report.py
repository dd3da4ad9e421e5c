"""tpiv report: one-command campaign report from saved fields."""
import os

import numpy as np

from torchpiv_tpu.cli import main as cli_main
from torchpiv_tpu.utils.persistence import save_binary


def _write_stack(folder, T=8, r=20, c=24):
    rng = np.random.default_rng(3)
    x, y = np.meshgrid(np.arange(c) * 2.0, np.arange(r) * 2.0)  # mm
    for t in range(T):
        u = 0.5 + 0.05 * rng.standard_normal((r, c))
        v = -0.2 + 0.05 * rng.standard_normal((r, c))
        save_binary(f"pair_{t}.npy", folder,
                    {"x": x, "y": y, "u": u, "v": v})


def test_report_end_to_end(tmp_path, capsys):
    folder = str(tmp_path / "fields")
    _write_stack(folder)
    out = str(tmp_path / "rep")
    rc = cli_main(["report", folder, "--fs", "100", "--nu", "1e-6",
                   "--rho", "998", "--out", out])
    assert rc == 0
    md = open(os.path.join(out, "report.md")).read()
    for section in ("Convergence", "Turbulence scales",
                    "POD energies", "Mean pressure"):
        assert section in md, section
    for fig in ("mean_field.png", "spectrum.png", "pod.png",
                "pressure.png"):
        assert os.path.exists(os.path.join(out, fig)), fig
    assert "report.md" in capsys.readouterr().out


def test_report_missing_folder(tmp_path):
    assert cli_main(["report", str(tmp_path / "nope")]) == 1


def test_report_tolerates_nan_holes(tmp_path):
    """Invalid (NaN) vectors in some snapshots must not break the report
    (nan-aware means; spectrum may be skipped but the report completes)."""
    folder = str(tmp_path / "fields")
    _write_stack(folder, T=6)
    import glob

    f = sorted(glob.glob(os.path.join(folder, "*.npy")))[0]
    arr = np.load(f)
    arr[2, 3:5, 3:5] = np.nan
    np.save(f, arr)
    out = str(tmp_path / "rep")
    rc = cli_main(["report", folder, "--rho", "998", "--out", out])
    assert rc == 0
    md = open(os.path.join(out, "report.md")).read()
    assert "Turbulence scales" in md
