"""Tracking + pressure tour: the round-3 additions on one synthetic flow.

    python examples/tracking_pressure_demo.py [output_dir]

Synthesizes a vortex particle pair, then drives:

* PIV-guided particle tracking (`models.PTV`) — scattered per-particle
  vectors with the correlation field as predictor
* track binning onto the PIV grid (`models.bin_to_grid`)
* Gamma1 vortex-center identification (`stats.gamma_functions`)
* pressure reconstruction (`stats.pressure_poisson`)

and renders a 3-panel figure (`tracking_pressure_demo.png`): the
scattered tracks colored by speed, Gamma1 with the detected core marked,
and the recovered gauge-pressure field (low-pressure core at the vortex
center — the physics sanity check).
"""
import os
import sys

import numpy as np


def vortex_flow(cx, cy, strength=4.0, radius=150.0):
    def disp(xs, ys):
        dx = xs - cx
        dy = ys - cy
        r = np.hypot(dx, dy) + 1e-6
        mag = strength * (r / radius) * np.exp(1 - r / radius)
        return -mag * dy / r, mag * dx / r

    return disp


def main(out_dir="./demo_out"):
    from torchpiv_tpu.models import PTV, PIVConfig, bin_to_grid
    from torchpiv_tpu.ops.geometry import get_coordinates
    from torchpiv_tpu.stats import gamma_functions, pressure_poisson
    from torchpiv_tpu.utils.synthetic import particle_pair

    os.makedirs(out_dir, exist_ok=True)
    H = W = 512
    fa, fb = particle_pair((H, W), displacement=vortex_flow(W / 2, H / 2),
                           seed=7, density=0.01)

    print("tracking particles (PIV-guided) ...")
    cfg = PIVConfig(frame_shape=(H, W), wind_size=64, overlap=32,
                    multipass=2, multipass_mode="CWS")
    ptv = PTV((H, W), piv_config=cfg, max_particles=4096)
    res = ptv(fa, fb)
    print(f"{res.n_a} particles detected, {res.x.size} tracked "
          f"({res.x.size / max(res.n_a, 1):.0%})")

    gx, gy, gu, gv, _ = bin_to_grid(res.x, res.y, res.u, res.v, (H, W),
                                    wind_size=32, overlap=16)
    gu = np.nan_to_num(gu)
    gv = np.nan_to_num(gv)
    step = float(gx[0, 1] - gx[0, 0])

    g1, _ = gamma_functions(gu, gv, dx=step, dy=step, radius=3)
    core = np.unravel_index(np.argmax(np.abs(g1)), g1.shape)
    print(f"Gamma1 core at grid {core}, |Gamma1| {abs(g1[core]):.2f}")

    p = pressure_poisson(gu, gv, dx=step, dy=step, rho=1.0)
    pc = p[core]
    print(f"pressure at core {pc:.4g} (field min {p.min():.4g}) — "
          f"vortex core must be the low-pressure region")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax_t, ax_g, ax_p) = plt.subplots(1, 3, figsize=(16, 5), dpi=110)

    speed = np.hypot(res.u, res.v)
    # u/v are image-convention; the axes are inverted to image coords
    # below, so the arrow components pass through unchanged
    sc = ax_t.quiver(res.x, res.y, res.u, res.v, speed, cmap="viridis",
                     angles="xy", scale_units="xy", scale=0.25, width=0.003)
    ax_t.set_title(f"PTV tracks ({res.x.size} particles)")
    fig.colorbar(sc, ax=ax_t, label="|d| [px]")

    im = ax_g.pcolormesh(gx, gy, g1, cmap="RdBu_r", vmin=-1, vmax=1,
                         shading="auto")
    ax_g.plot(gx[core], gy[core], "k+", ms=14, mew=2)
    ax_g.set_title("Gamma1 vortex-center function")
    fig.colorbar(im, ax=ax_g, label="Γ1 [-]")

    im = ax_p.pcolormesh(gx, gy, p, cmap="magma", shading="auto")
    ax_p.plot(gx[core], gy[core], "c+", ms=14, mew=2)
    ax_p.set_title("gauge pressure (Poisson from tracks)")
    fig.colorbar(im, ax=ax_p, label="p [arb]")

    for a in (ax_t, ax_g, ax_p):
        a.set_aspect("equal")
        a.invert_yaxis()  # image coordinates

    fig.tight_layout()
    out = os.path.join(out_dir, "tracking_pressure_demo.png")
    fig.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
