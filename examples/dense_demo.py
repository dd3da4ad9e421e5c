"""Dense-vs-correlation comparison on a shear flow.

    python examples/dense_demo.py [output_dir]

Analyses one synthetic shear pair three ways — 2-pass CWS correlation,
plain dense LK (`models.folki`), and the correlation-anchored hybrid —
and renders the error maps side by side with their RMS numbers
(the figure behind docs/ACCURACY.md's dense-mode table).
"""
import os
import sys

import numpy as np

# TPIV_DEVICE=cpu forces the CPU backend (useful on hosts whose default
# jax platform is a remote accelerator you don't want the demo to dial)
if os.environ.get("TPIV_DEVICE", "").lower() == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")


def main(out_dir="./demo_out"):
    import jax
    import jax.numpy as jnp

    from torchpiv_tpu.models import FolkiPIV, PIVConfig
    from torchpiv_tpu.utils.synthetic import particle_pair, shear_flow

    os.makedirs(out_dir, exist_ok=True)
    H = W = 512
    fa, fb = particle_pair((H, W), displacement=shear_flow(1.0, 0.03),
                           seed=11, density=0.04)

    cfg = PIVConfig(frame_shape=(H, W), wind_size=64, overlap=32,
                    multipass=2, multipass_mode="CWS")
    plain = FolkiPIV((H, W), wind_size=32, overlap=16)
    hybrid = FolkiPIV((H, W), wind_size=32, overlap=16, piv_config=cfg)
    corr = hybrid._engine  # one compiled graph serves both panels

    gx, gy = plain.coordinates
    tru = 1.0 + 0.03 * gy
    inner = np.zeros(gx.shape, bool)
    inner[3:-3, 3:-3] = True

    uc, vc, bc = map(np.asarray, corr(jnp.asarray(fa), jnp.asarray(fb)))
    up, vp, bp = plain(fa, fb)
    uh, vh, bh = hybrid(fa, fb)

    fields = [("correlation (2-pass CWS)", uc, inner & (bc == 0)),
              ("dense LK", up, inner & ~bp),
              ("hybrid (corr-anchored LK)", uh, inner)]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(15, 4.6), dpi=110)
    for ax, (name, u, ok) in zip(axes, fields):
        err = np.where(ok, u - tru, np.nan)
        rms = np.sqrt(np.nanmean(err**2))
        im = ax.pcolormesh(gx, gy, err, cmap="RdBu_r", vmin=-0.1,
                           vmax=0.1, shading="auto")
        ax.set_title(f"{name}\nu-error RMS {rms:.4f} px")
        ax.set_aspect("equal")
        ax.invert_yaxis()
        print(f"{name}: {rms:.4f} px RMS")
    fig.colorbar(im, ax=axes, label="u error [px]", fraction=0.02)
    out = os.path.join(out_dir, "dense_demo.png")
    fig.savefig(out, bbox_inches="tight")
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
