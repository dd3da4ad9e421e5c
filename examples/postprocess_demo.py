"""Post-processing tour: the analysis suite beyond the reference, on one
synthetic dataset.

    python examples/postprocess_demo.py [output_dir]

Synthesizes a time-varying vortex sequence, analyzes it with the fused
2-pass CWS engine, then drives the post-processing stack:

* robust smoothn field smoothing (`stats.smooth_vector_field`)
* swirling-strength vortex detection (`stats.derived_fields`)
* per-vector uncertainty map (`stats.uncertainty_map`)
* snapshot POD mode energies (`stats.compute_pod`)

and renders a 4-panel summary figure (`postprocess_demo.png`): velocity
magnitude with streamlines, signed vorticity (diverging map, neutral
midpoint), swirling strength, and the POD energy distribution.
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
    import jax
    import jax.numpy as jnp

    from torchpiv_tpu.models import MultipassPIV, PIVConfig
    from torchpiv_tpu.stats import (compute_pod, derived_fields,
                                    smooth_vector_field, uncertainty_map)
    from torchpiv_tpu.utils.synthetic import particle_pair

    os.makedirs(out_dir, exist_ok=True)
    H = W = 512
    cfg = PIVConfig(frame_shape=(H, W), wind_size=64, overlap=32,
                    multipass=2, multipass_mode="CWS")
    engine = MultipassPIV(cfg)
    fn = jax.jit(engine)

    print("analyzing a wandering-vortex sequence ...")
    us, vs, last = [], [], None
    for i in range(6):
        cx = W / 2 + 25 * np.sin(0.9 * i)  # vortex core wanders in time
        cy = H / 2 + 25 * np.cos(0.9 * i)
        fa, fb = particle_pair((H, W), displacement=vortex_flow(cx, cy),
                               seed=100 + i, density=0.03)
        u, v, inval = map(np.asarray, fn(jnp.asarray(fa), jnp.asarray(fb)))
        u, v = smooth_vector_field(u, v, mask=inval, robust=True)
        us.append(u)
        vs.append(v)
        last = (fa, fb, u, v)

    fa, fb, u, v = last
    x, y = engine.final_coordinates
    step = float(x[0, 1] - x[0, 0])
    maps = derived_fields(u, v, dx=step, dy=step)
    su, sv = uncertainty_map(fa, fb, wind_size=64, overlap=32)
    pod = compute_pod(np.stack(us), np.stack(vs), n_modes=6)
    print(f"median uncertainty {np.nanmedian(np.hypot(su, sv)):.3f} px; "
          f"POD mode-0 energy {pod.energy_fraction[0]:.0%}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 2, figsize=(11, 9.5), dpi=110)
    (ax_f, ax_w), (ax_s, ax_p) = axes

    mag = np.hypot(u, v)
    im = ax_f.pcolormesh(x, y, mag, cmap="viridis", shading="auto")
    ax_f.streamplot(x[0], y[:, 0], u, v, color="white", density=1.1,
                    linewidth=0.7, arrowsize=0.8)
    ax_f.set_title("velocity magnitude + streamlines (smoothed)")
    fig.colorbar(im, ax=ax_f, label="|V| [px]")

    wmax = np.abs(maps["vorticity"]).max()
    im = ax_w.pcolormesh(x, y, maps["vorticity"], cmap="RdBu_r",
                         vmin=-wmax, vmax=wmax, shading="auto")
    ax_w.set_title("vorticity (diverging, zero at midpoint)")
    fig.colorbar(im, ax=ax_w, label="ω [1/px]")

    im = ax_s.pcolormesh(x, y, maps["swirling_strength"], cmap="magma",
                         shading="auto")
    ax_s.set_title("swirling strength λ_ci (vortex detector)")
    fig.colorbar(im, ax=ax_s, label="λ_ci [1/px]")

    frac = pod.energy_fraction
    ax_p.bar(np.arange(len(frac)), 100 * frac, color="#4c78a8", width=0.7)
    ax_p.set_xlabel("POD mode")
    ax_p.set_ylabel("energy [%]")
    ax_p.set_title("snapshot POD energy distribution")
    ax_p.spines[["top", "right"]].set_visible(False)
    ax_p.grid(axis="y", alpha=0.25)
    for a in (ax_f, ax_w, ax_s):
        a.set_aspect("equal")
        a.invert_yaxis()  # image coordinates

    fig.tight_layout()
    out = os.path.join(out_dir, "postprocess_demo.png")
    fig.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
