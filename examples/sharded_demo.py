"""Multi-chip demo: the same PIV analysis sharded over a device mesh.

    python examples/sharded_demo.py            # real devices if >1 present
    JAX_NUM_CPU_DEVICES=8 python examples/sharded_demo.py   # virtual mesh

Shows the two production scaling axes (SURVEY §2.7 has no reference
counterpart — the reference is single-GPU):

* ``pairs``   — data parallelism over the image-pair batch (no comms);
* ``windows`` — model parallelism over the window grid within each pair
  (one tiny ``all_gather`` of the coarse predictor field per pass).

On a real pod slice the same code runs unchanged: build the mesh from
``jax.devices()`` and the collectives ride ICI.
"""
import os
import sys

import numpy as np


def main():
    # allow running on a CPU-only machine by asking for virtual devices
    # BEFORE jax initialises (no-op when real multi-device hardware exists)
    import jax

    if "JAX_NUM_CPU_DEVICES" in os.environ:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices",
                          int(os.environ["JAX_NUM_CPU_DEVICES"]))
    import jax.numpy as jnp

    from torchpiv_tpu.models import MultipassPIV, PIVConfig
    from torchpiv_tpu.parallel import ShardedPIV, default_piv_mesh
    from torchpiv_tpu.utils.synthetic import particle_pair

    n_dev = len(jax.devices())
    if n_dev < 2:
        print("need >=2 devices; run with JAX_NUM_CPU_DEVICES=8",
              file=sys.stderr)
        return 1
    mesh = default_piv_mesh()
    print(f"devices: {n_dev}, mesh: {dict(mesh.shape)}")

    B = mesh.shape["pairs"]
    pairs = [particle_pair((512, 512), displacement=(3.0 + 0.2 * i, -1.5),
                           seed=i) for i in range(B)]
    fa = jnp.asarray(np.stack([p[0] for p in pairs]))
    fb = jnp.asarray(np.stack([p[1] for p in pairs]))

    engine = MultipassPIV(PIVConfig(frame_shape=(512, 512), wind_size=64,
                                    overlap=32, multipass=2,
                                    multipass_mode="CWS"))
    sharded = ShardedPIV(engine, mesh)
    u, v, invalid = sharded.jit()(fa, fb)
    u, invalid = np.asarray(u), np.asarray(invalid)
    for i in range(B):
        sel = ~invalid[i]
        print(f"pair {i}: mean u = {u[i][sel].mean():+.3f} px "
              f"(true {3.0 + 0.2 * i:+.1f}), valid {sel.mean():.1%}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
