"""Real-world-conditions validation campaign: run the torch reference and
the TPU engine side by side on a camera-degraded synthetic dataset and
print a markdown comparison table (+ JSON artifact).

The reference validated on a real camera dataset (``test_images/``,
/root/reference/README.md:34) whose binaries are stripped from the
snapshot; this campaign replaces it with a controlled degraded dataset
(``camera_degraded_pair``: out-of-plane dropout, vignetting, stationary
glare, shot+read noise, hot pixels) where the true flow is known exactly —
so the comparison reports absolute accuracy, not just engine agreement.

Usage: python tools/degraded_campaign.py [--size 512] [--pairs 6]
       [--out docs/campaign.json] [--skip-reference]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from torchpiv_tpu.io.decode import imwrite_gray  # noqa: E402
from torchpiv_tpu.utils.synthetic import camera_degraded_pair  # noqa: E402

TRUE_U, TRUE_V = 3.3, -2.1  # px, image coordinates
# physical output with dt=1000 us, scale=1 mm/px: u_phys = u_px, and the
# OfflinePIV tail flips the y axis (v_phys = -v_px)
EXPECT_U, EXPECT_V = TRUE_U, -TRUE_V

TIERS = {
    # a good lab recording: mild but realistic camera effects
    "moderate": dict(
        density=0.012,
        dropout=0.15,
        intensity_flicker=0.25,
        vignette=0.55,
        glare_amplitude=45.0,
        read_noise=4.0,
        shot_noise=True,
        hot_pixel_rate=3e-5,
    ),
    # a bad day: sparse seeding, heavy out-of-plane loss, strong glare —
    # enough that windows actually fail validation and the recovery
    # machinery (second peak, RPC, infill) has work to do
    "harsh": dict(
        density=0.005,
        dropout=0.25,
        intensity_flicker=0.4,
        vignette=0.7,
        glare_amplitude=90.0,
        read_noise=6.0,
        shot_noise=True,
        hot_pixel_rate=1e-4,
    ),
}


def make_dataset(folder: str, size: int, n_pairs: int, tier: str) -> None:
    os.makedirs(folder, exist_ok=True)
    for i in range(n_pairs):
        fa, fb = camera_degraded_pair(
            (size, size), displacement=(TRUE_U, TRUE_V), seed=100 + i,
            **TIERS[tier])
        imwrite_gray(os.path.join(folder, f"d{i:03d}_a.bmp"), fa)
        imwrite_gray(os.path.join(folder, f"d{i:03d}_b.bmp"), fb)


def import_reference():
    """Import the reference PIVbackend headless (same recipe as
    tests/test_against_reference.py)."""
    import importlib
    import types

    pkg_dir = "/root/reference/src/torchPIV"
    if not os.path.isdir(pkg_dir):
        return None
    try:
        import torch  # noqa: F401
        import cv2  # noqa: F401
    except Exception:
        return None
    if "PyQt5" not in sys.modules:
        qt = types.ModuleType("PyQt5")
        widgets = types.ModuleType("PyQt5.QtWidgets")
        widgets.QMessageBox = type("QMessageBox", (), {})
        qt.QtWidgets = widgets
        qt.__path__ = []
        sys.modules["PyQt5"] = qt
        sys.modules["PyQt5.QtWidgets"] = widgets
    if "torchPIV" not in sys.modules:
        pkg = types.ModuleType("torchPIV")
        pkg.__path__ = [pkg_dir]
        sys.modules["torchPIV"] = pkg
    try:
        return importlib.import_module("torchPIV.PIVbackend")
    except Exception:
        return None


def field_metrics(fields: list) -> dict:
    """Accuracy of yielded (x, y, u, v) fields vs the known uniform flow.

    ``bad`` = fraction of vectors >1 px off truth (infilled outliers and
    wrong peak locks); ``rms_good`` = RMS error of the rest (the measured
    accuracy floor); ``rms_all`` over everything.
    """
    errs = []
    for _, _, u, v in fields:
        e = np.sqrt((np.asarray(u, np.float64) - EXPECT_U) ** 2
                    + (np.asarray(v, np.float64) - EXPECT_V) ** 2)
        errs.append(e.ravel())
    e = np.concatenate(errs) if errs else np.array([np.nan])
    bad = e > 1.0
    return {
        "pairs_yielded": len(fields),
        "bad_pct": round(100.0 * float(bad.mean()), 2),
        "rms_good_px": round(float(np.sqrt(np.mean(e[~bad] ** 2))), 4)
        if (~bad).any() else float("nan"),
        "rms_all_px": round(float(np.sqrt(np.mean(e ** 2))), 3),
    }


def run_ours(folder: str, **extra) -> dict:
    from torchpiv_tpu.pipeline import OfflinePIV

    kw = dict(file_fmt=".bmp", wind_size=64, overlap=32, multipass=2,
              multipass_mode="CWS", dt=1000.0, scale=1.0,
              folder_mode="pairs", device="cpu")
    kw.update(extra)
    t0 = time.perf_counter()
    fields = list(OfflinePIV(folder, **kw)())
    m = field_metrics(fields)
    m["wall_s"] = round(time.perf_counter() - t0, 1)
    return m


def run_reference(ref, folder: str) -> dict:
    t0 = time.perf_counter()
    piv = ref.OfflinePIV(
        folder=folder, device="cpu", file_fmt=".bmp", wind_size=64,
        overlap=32, multipass=2, multipass_mode="CWS", dt=1000.0,
        scale=1.0, folder_mode="pairs")
    fields = [(x, y, np.asarray(u), np.asarray(v)) for x, y, u, v in piv()]
    m = field_metrics(fields)
    m["wall_s"] = round(time.perf_counter() - t0, 1)
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--pairs", type=int, default=6)
    ap.add_argument("--out", default=None, help="write JSON artifact here")
    ap.add_argument("--tier", default="moderate", choices=sorted(TIERS))
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--keep", action="store_true", help="keep the dataset")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"],
                    help="cpu (default) avoids dialing the axon tunnel — "
                    "this is an accuracy comparison, not a perf benchmark")
    args = ap.parse_args()

    if args.platform == "cpu":
        # must happen before any jax backend use; the JAX_PLATFORMS env
        # var does NOT switch platforms in this environment (CLAUDE.md)
        import jax

        jax.config.update("jax_platforms", "cpu")

    folder = os.path.join(
        tempfile.gettempdir(),
        f"tpiv_degraded_{args.tier}_{args.size}_{args.pairs}")
    print(f"dataset: {args.pairs} degraded ({args.tier}) "
          f"{args.size}x{args.size} pairs -> {folder}", file=sys.stderr)
    make_dataset(folder, args.size, args.pairs, args.tier)

    rows = {}
    if not args.skip_reference:
        ref = import_reference()
        if ref is None:
            print("reference unavailable; skipping", file=sys.stderr)
        else:
            print("running reference OfflinePIV (torch, cpu)...",
                  file=sys.stderr)
            rows["reference SCC"] = run_reference(ref, folder)

    configs = [
        ("tpiv SCC (same settings)", {}),
        ("tpiv SCC + preprocess=clahe", {"preprocess": "clahe"}),
        ("tpiv SCC + background=auto", {"background": "auto"}),
        ("tpiv RPC", {"engine_options": {"correlation": "rpc"}}),
        ("tpiv SCC + second-peak fallback",
         {"engine_options": {"second_peak_fallback": True}}),
        ("tpiv RPC + clahe + fallback",
         {"preprocess": "clahe",
          "engine_options": {"correlation": "rpc",
                             "second_peak_fallback": True}}),
    ]
    for name, extra in configs:
        print(f"running {name}...", file=sys.stderr)
        rows[name] = run_ours(folder, **extra)

    # markdown table
    print("| engine / config | pairs | bad vectors | RMS (good) px | "
          "RMS (all) px | wall s |")
    print("|---|---|---|---|---|---|")
    for name, m in rows.items():
        print(f"| {name} | {m['pairs_yielded']} | {m['bad_pct']}% | "
              f"{m['rms_good_px']} | {m['rms_all_px']} | {m['wall_s']} |")

    if args.out:
        payload = {"tier": args.tier, "degrade": TIERS[args.tier],
                   "size": args.size,
                   "pairs": args.pairs, "true_flow_px": [TRUE_U, TRUE_V],
                   "rows": rows}
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {args.out}", file=sys.stderr)

    if not args.keep:
        shutil.rmtree(folder, ignore_errors=True)


if __name__ == "__main__":
    main()
