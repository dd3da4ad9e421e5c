"""Physical-accuracy benchmark: bias + RMS error vs known synthetic flows.

Parity (<0.01 px RMS vs the torch reference) is proven by the test suite;
this script quantifies *physical accuracy* — how close the recovered fields
are to the true flow — for the beyond-reference quality modes, producing
the table committed to ``docs/ACCURACY.md`` (VERDICT r2 item 6).

Flows (512x512 synthetic particle images, utils.synthetic):

* ``sweep``  — uniform displacement with sub-pixel fraction swept over
  0.0..0.9 px (11 pairs): max |bias| over the sweep is the classic
  peak-locking measure;
* ``shear``  — u(y) = 1 + 0.03*y (~2 px variation across a 64 px window):
  gradient bias of pure-translation correlation;
* ``vortex`` — solid-body rotation, ~1.9 px max rim displacement: both
  axes strained.

Configs: {gauss3, gauss2d} x {CWS, DEF} x {bilinear, bicubic}, all 2-pass
64->32 px, 50% overlap.  Errors are measured on valid interior vectors
(3-vector border ring excluded).

Run:  python tools/accuracy_table.py [--write]   (--write updates docs/)
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from torchpiv_tpu.models import MultipassPIV, PIVConfig
from torchpiv_tpu.utils.synthetic import particle_pair, shear_flow

SHAPE = (512, 512)
DENSITY = 0.04
SWEEP = np.arange(0.0, 1.01, 0.1)


def vortex_flow(omega: float = 0.006, cx: float = 256.0, cy: float = 256.0):
    """Solid-body rotation: u = -omega*(y-cy), v = omega*(x-cx)."""

    def disp(xs, ys):
        return -omega * (ys - cy), omega * (xs - cx)

    return disp


def run_engine(cfg_kw, fa, fb):
    cfg = PIVConfig(frame_shape=SHAPE, wind_size=64, overlap=32, multipass=2,
                    **cfg_kw)
    eng = MultipassPIV(cfg)
    u, v, inval = jax.jit(eng)(jnp.asarray(fa), jnp.asarray(fb))
    x, y = eng.final_coordinates
    return (np.asarray(u), np.asarray(v), np.asarray(inval), x, y)


def interior_sel(inval):
    sel = ~inval
    sel[:3] = sel[-3:] = False
    sel[:, :3] = sel[:, -3:] = False
    return sel


def eval_sweep(cfg_kw):
    """Uniform sub-pixel sweep: returns (max |bias| px, mean RMS px)."""
    biases, rmses = [], []
    for i, frac in enumerate(SWEEP):
        d = (2.0 + frac, -1.0)
        fa, fb = particle_pair(SHAPE, displacement=d, density=DENSITY,
                               seed=100 + i)
        u, v, inval, x, y = run_engine(cfg_kw, fa, fb)
        sel = interior_sel(inval)
        eu = u[sel] - d[0]
        ev = v[sel] - d[1]
        biases.append(eu.mean())
        rmses.append(np.sqrt(np.mean(eu**2 + ev**2)))
    return float(np.max(np.abs(biases))), float(np.mean(rmses))


def eval_flow(cfg_kw, flow, truth):
    """Spatially-varying flow: returns (|bias| px, RMS px)."""
    fa, fb = particle_pair(SHAPE, displacement=flow, density=DENSITY,
                           seed=400)
    u, v, inval, x, y = run_engine(cfg_kw, fa, fb)
    ut, vt = truth(x, y)
    sel = interior_sel(inval)
    eu = u[sel] - ut[sel]
    ev = v[sel] - vt[sel]
    bias = np.sqrt(eu.mean() ** 2 + ev.mean() ** 2)
    return float(bias), float(np.sqrt(np.mean(eu**2 + ev**2)))


def evaluate(cfg_kw):
    du_dy = 0.03
    om = 0.006
    pk_bias, pk_rms = eval_sweep(cfg_kw)
    sh_bias, sh_rms = eval_flow(
        cfg_kw, shear_flow(1.0, du_dy),
        lambda x, y: (1.0 + du_dy * y, np.zeros_like(y)))
    vx_bias, vx_rms = eval_flow(
        cfg_kw, vortex_flow(om),
        lambda x, y: (-om * (y - 256.0), om * (x - 256.0)))
    return dict(pk_bias=pk_bias, pk_rms=pk_rms, sh_bias=sh_bias,
                sh_rms=sh_rms, vx_bias=vx_bias, vx_rms=vx_rms)


CONFIGS = [
    (f"{mode}/{interp}/{fit}",
     dict(multipass_mode=mode, cws_interp=interp, subpixel=fit))
    for mode in ("CWS", "DEF")
    for interp in ("bilinear", "bicubic")
    for fit in ("gauss3", "gauss2d")
]

HEADER = (
    "| config (mode/interp/fit) | peak-lock max\\|bias\\| | sweep RMS | "
    "shear bias | shear RMS | vortex bias | vortex RMS |\n"
    "|---|---|---|---|---|---|---|")


def eval_smoothing(cfg_kw):
    """Effect of robust smoothn post-smoothing (stats/smoothing.py) on the
    spatially-varying flows: returns {flow: (raw_rms, smooth_rms)} px."""
    from torchpiv_tpu.stats.smoothing import smooth_vector_field

    du_dy = 0.03
    om = 0.006
    flows = {
        "shear": (shear_flow(1.0, du_dy),
                  lambda x, y: (1.0 + du_dy * y, np.zeros_like(y))),
        "vortex": (vortex_flow(om),
                   lambda x, y: (-om * (y - 256.0), om * (x - 256.0))),
    }
    # well-seeded (the table's protocol) AND sparse/noisy seeding, where
    # the error is random rather than bias and smoothing actually pays
    cases = [("", DENSITY, 2.0), ("sparse-", 0.01, 20.0),
             ("verysparse-", 0.005, 30.0)]
    out = {}
    for prefix, dens, noise in cases:
        for name, (flow, truth) in flows.items():
            fa, fb = particle_pair(SHAPE, displacement=flow, density=dens,
                                   noise=noise, seed=400)
            u, v, inval, x, y = run_engine(cfg_kw, fa, fb)
            ut, vt = truth(x, y)
            sel = interior_sel(inval)

            def rms(uu, vv):
                return float(np.sqrt(np.mean((uu[sel] - ut[sel]) ** 2
                                             + (vv[sel] - vt[sel]) ** 2)))

            us, vs = smooth_vector_field(u, v, mask=inval, robust=True)
            out[prefix + name] = (rms(u, v), rms(us, vs))
    return out


def eval_rpc():
    """SCC vs RPC across stationary-background contamination amplitudes
    (utils.synthetic.contaminated_pair): the regime where phase
    normalisation pays.  Returns {amp: {corr: (rms, bias)}} px, 3-seed
    means, uniform displacement (3.3, -2.1)."""
    from torchpiv_tpu.utils.synthetic import contaminated_pair

    d = (3.3, -2.1)
    out = {}
    for amp in (0.0, 40.0, 80.0, 120.0):
        out[amp] = {}
        for corr in ("scc", "rpc"):
            errs, biases = [], []
            for i in range(3):
                fa, fb = contaminated_pair(
                    SHAPE, displacement=d, bg_amplitude=amp,
                    density=DENSITY, noise=2.0, seed=500 + i)
                u, v, inval, x, y = run_engine(dict(correlation=corr),
                                               fa, fb)
                sel = interior_sel(inval)
                errs.append(np.sqrt(np.mean((u[sel] - d[0]) ** 2
                                            + (v[sel] - d[1]) ** 2)))
                biases.append(abs(np.mean(u[sel]) - d[0]))
            out[amp][corr] = (float(np.mean(errs)), float(np.mean(biases)))
    return out


def eval_rescue():
    """Second-peak-fallback recall/precision: (a) scattered noise-induced
    outliers (sparse seeding + heavy sensor noise, 8 seeds) — the regime
    the recovery ladder targets; (b) a coherently-contaminated static
    glare blob, where the neighbour statistics are corrupted and the safe
    answer is to rescue NOTHING.  Uniform displacement (6.0, -4.5) px —
    outside the +-validation_window exclusion zone, so the true peak is
    visible to the second-peak search."""
    d = (6.0, -4.5)
    base = dict(frame_shape=SHAPE, wind_size=64, overlap=32, multipass=2,
                median_filter="normmedian")
    import jax
    import jax.numpy as jnp

    from torchpiv_tpu.models import MultipassPIV, PIVConfig

    engines = {fb: jax.jit(MultipassPIV(PIVConfig(
        **base, second_peak_fallback=fb))) for fb in (False, True)}

    def run_pair(fa, fb_):
        out = {}
        for k, e in engines.items():
            u, v, inval = e(jnp.asarray(fa), jnp.asarray(fb_))
            out[k] = tuple(np.asarray(t) for t in (u, v, inval))
        return out

    tot = dict(invalid=0, rescued=0, bad=0)
    for seed in range(8):
        fa, fb_ = particle_pair(SHAPE, displacement=d, density=0.0035,
                                noise=14.0, seed=seed)
        out = run_pair(fa, fb_)
        u0, v0, i0 = out[False]
        u1, v1, i1 = out[True]
        rescued = i0 & ~i1
        err = np.hypot(u1 - d[0], v1 - d[1])
        tot["invalid"] += int(i0.sum())
        tot["rescued"] += int(rescued.sum())
        tot["bad"] += int((rescued & (err > 1.0)).sum())

    # coherent static glare: 64x64 strong blob identical in both frames
    rng = np.random.default_rng(7)
    fa, fb_ = particle_pair(SHAPE, displacement=d, seed=3)
    fa = fa.astype(np.float64)
    fb_ = fb_.astype(np.float64)
    blob = rng.uniform(0, 255, (64, 64))
    for f in (fa, fb_):
        f[224:288, 224:288] = 0.55 * f[224:288, 224:288] + 0.9 * blob
    fa = np.clip(fa, 0, 255).astype(np.uint8)
    fb_ = np.clip(fb_, 0, 255).astype(np.uint8)
    out = run_pair(fa, fb_)
    glare = dict(invalid=int(out[False][2].sum()),
                 rescued=int((out[False][2] & ~out[True][2]).sum()))
    return tot, glare


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true",
                    help="update docs/ACCURACY.md")
    ap.add_argument("--configs", default=None,
                    help="comma-separated subset of config names")
    ap.add_argument("--smoothing", action="store_true",
                    help="measure the smoothn post-smoothing effect only")
    ap.add_argument("--rpc", action="store_true",
                    help="measure SCC vs RPC under stationary-background "
                         "contamination only")
    ap.add_argument("--rescue", action="store_true",
                    help="measure second-peak-fallback recall/precision")
    args = ap.parse_args()

    if args.rescue:
        tot, glare = eval_rescue()
        rc = 100 * tot["rescued"] / max(tot["invalid"], 1)
        print(f"noise outliers (8 seeds): invalid {tot['invalid']}, "
              f"rescued {tot['rescued']} ({rc:.0f}%), "
              f">1 px mistakes {tot['bad']}")
        print(f"coherent glare blob: invalid {glare['invalid']}, "
              f"rescued {glare['rescued']} (0 = correctly left to infill)")
        return

    if args.rpc:
        res = eval_rpc()
        print("| bg amplitude | SCC RMS | SCC bias | RPC RMS | RPC bias |")
        print("|---|---|---|---|---|")
        for amp, row in res.items():
            s, r = row["scc"], row["rpc"]
            print(f"| {amp:.0f} | {s[0]:.4f} | {s[1]:.4f} | "
                  f"{r[0]:.4f} | {r[1]:.4f} |")
        return

    if args.smoothing:
        for name, kw in CONFIGS[:1]:  # reference-parity mode
            res = eval_smoothing(kw)
            for flow, (raw, sm) in res.items():
                print(f"{name} {flow}: raw RMS {raw:.4f} px -> smoothed "
                      f"{sm:.4f} px ({100 * (1 - sm / raw):.0f}% lower)")
        return

    rows = []
    sel = args.configs.split(",") if args.configs else None
    for name, kw in CONFIGS:
        if sel and name not in sel:
            continue
        t0 = time.time()
        m = evaluate(kw)
        print(f"# {name}: {m} ({time.time() - t0:.0f} s)", file=sys.stderr)
        rows.append(
            f"| {name} | {m['pk_bias']:.4f} | {m['pk_rms']:.4f} | "
            f"{m['sh_bias']:.4f} | {m['sh_rms']:.4f} | "
            f"{m['vx_bias']:.4f} | {m['vx_rms']:.4f} |")
    table = HEADER + "\n" + "\n".join(rows)
    print(table)

    if args.write:
        doc = (
            "# Physical accuracy (synthetic flows)\n\n"
            "Produced by `python tools/accuracy_table.py --write` "
            "(pinned by `tests/test_accuracy_modes.py`).  All errors in "
            "pixels, valid interior vectors only; flows and protocol in the "
            "script docstring.  2-pass 64→32 px, 50% overlap, 512×512 "
            "frames, particle density 0.04.\n\n"
            + table + "\n\n"
            "Reading the table:\n\n"
            "* **peak-lock max|bias|** — worst mean error over a 0→1 px "
            "sub-pixel sweep of a uniform flow (pixel-locking).  gauss2d "
            "reduces it vs the reference's two-axis gauss3 fit.\n"
            "* **shear / vortex** — deforming windows (DEF) cut the "
            "gradient bias of pure-translation CWS; bicubic resampling "
            "helps most combined with DEF.\n"
        )
        import torchpiv_tpu

        repo = os.path.dirname(os.path.dirname(
            os.path.abspath(torchpiv_tpu.__file__)))
        path = os.path.join(repo, "docs", "ACCURACY.md")
        with open(path, "w") as f:
            f.write(doc)
        print(f"wrote {os.path.normpath(path)}", file=sys.stderr)


if __name__ == "__main__":
    main()
