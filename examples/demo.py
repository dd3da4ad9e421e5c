"""End-to-end demo: synthesize a particle-image sequence, run the full
offline pipeline, and render the results.

    python examples/demo.py [output_dir]

Produces, in the output directory:
  frames/            synthetic BMP frame pairs (vortex flow)
  demo_field.png     velocity-magnitude map with streamlines
  demo_statistics.txt  the 13-column ensemble statistics table
"""
import os
import sys

import numpy as np

# TPIV_DEVICE=cpu forces the CPU backend (engine construction touches the
# default backend, so the device= param alone would still dial a remote
# accelerator on hosts where that is the jax default)
if os.environ.get("TPIV_DEVICE", "").lower() == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")


def vortex_flow(cx, cy, strength=4.0, radius=150.0):
    def disp(xs, ys):
        dx = xs - cx
        dy = ys - cy
        r = np.hypot(dx, dy) + 1e-6
        mag = strength * (r / radius) * np.exp(1 - r / radius)
        return -mag * dy / r, mag * dx / r

    return disp


def main(out_dir="./demo_out"):
    from torchpiv_tpu.gui import viz
    from torchpiv_tpu.io.decode import imwrite_gray
    from torchpiv_tpu.pipeline import PIVRunner
    from torchpiv_tpu.utils.config import PIVParams
    from torchpiv_tpu.utils.synthetic import particle_pair

    frames = os.path.join(out_dir, "frames")
    os.makedirs(frames, exist_ok=True)

    H = W = 512
    print("generating synthetic vortex frame pairs ...")
    for i in range(4):
        fa, fb = particle_pair(
            (H, W), displacement=vortex_flow(W / 2, H / 2), seed=100 + i,
            density=0.03,
        )
        imwrite_gray(os.path.join(frames, f"vortex{i:03d}_a.bmp"), fa)
        imwrite_gray(os.path.join(frames, f"vortex{i:03d}_b.bmp"), fb)

    params = PIVParams(
        wind_size=64, overlap=32, multipass=2, multipass_mode="CWS",
        scale=0.05, dt=2.0, device=os.environ.get("TPIV_DEVICE", "auto"),
        file_fmt=".bmp", folder=frames,
        folder_mode="pairs", save_opt="Save statistics", save_dir=out_dir,
    )

    print("running 2-pass CWS analysis ...")
    outputs = []
    runner = PIVRunner(
        params,
        on_progress=lambda pct: print(f"\r  progress {pct:3d}%", end=""),
        on_output=outputs.append,
    )
    table = runner.run()
    print()
    assert table is not None

    print("rendering ...")
    viz.render_field(
        table, "Vy[m/s]", streamlines=True,
        out_path=os.path.join(out_dir, "demo_field.png"),
    )
    speed = np.hypot(table["Vx[m/s]"], table["Vy[m/s]"])
    print(f"processed {len(outputs)} pairs; "
          f"peak |V| = {speed.max():.2f} m/s; "
          f"outputs in {os.path.abspath(out_dir)}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
