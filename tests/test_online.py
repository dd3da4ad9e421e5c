"""OnlinePIV streaming pipeline: frames written while the analysis runs."""
import os
import threading
import time

import numpy as np

from torchpiv_tpu.io.decode import imwrite_gray
from torchpiv_tpu.pipeline import OnlinePIV
from torchpiv_tpu.utils.synthetic import particle_pair


def test_online_piv_processes_streamed_pairs(tmp_path):
    piv = OnlinePIV(
        str(tmp_path), device="cpu", file_fmt=".bmp", wind_size=32,
        overlap=16, poll_interval=0.05, idle_timeout=20.0,
    )

    def camera():
        for i in range(3):
            fa, fb = particle_pair((128, 128), displacement=(2.0, 1.0),
                                   seed=70 + i)
            imwrite_gray(str(tmp_path / f"cam{i}_a.bmp"), fa)
            imwrite_gray(str(tmp_path / f"cam{i}_b.bmp"), fb)
            time.sleep(0.2)
        # give the consumer time to finish the last pair, then stop
        time.sleep(1.0)
        piv.stop()

    t = threading.Thread(target=camera)
    t.start()
    results = list(piv())
    t.join()
    assert len(results) == 3
    for x, y, u, v in results:
        assert np.isfinite(u).all()
        assert abs(np.median(u) - 2000.0) < 200  # 2 px * 1000 (scale/dt=1)
