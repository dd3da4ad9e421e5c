"""Multi-host campaign sharding (parallel.distributed): pair-block split,
exact Welford-state merge, sharded PIVRunner end-to-end vs one sequential
run, and the `tpiv merge-stats` CLI.

PIV pairs are independent, so multi-host = zero-communication DP over
contiguous pair blocks + a final statistics-state merge; these tests prove
the merged statistics are numerically the sequential run's statistics.
"""
import os

import numpy as np
import pytest

from torchpiv_tpu.io.decode import imwrite_gray
from torchpiv_tpu.parallel.distributed import (initialize_distributed,
                                               merge_checkpoints, pair_block,
                                               parse_shard)
from torchpiv_tpu.stats.ensemble import EnsembleAccumulator, compute_statistics
from torchpiv_tpu.utils.synthetic import particle_pair


def test_pair_block_partitions_exactly():
    for n in (0, 1, 7, 8, 100):
        for k in (1, 2, 3, 8):
            blocks = [pair_block(n, i, k) for i in range(k)]
            # disjoint, contiguous, covering [0, n), balanced to +-1
            pos = 0
            for start, count in blocks:
                assert start == pos
                pos += count
            assert pos == n
            sizes = [c for _, c in blocks]
            assert max(sizes) - min(sizes) <= 1
    with pytest.raises(ValueError):
        pair_block(10, 3, 3)


def test_parse_shard():
    assert parse_shard("0/4") == (0, 4)
    assert parse_shard("3/4") == (3, 4)
    for bad in ("4/4", "-1/4", "x/4", "1", "1/0"):
        with pytest.raises(ValueError):
            parse_shard(bad)


def test_initialize_distributed_single_process_noop(monkeypatch):
    monkeypatch.delenv("TPIV_COORDINATOR", raising=False)
    assert initialize_distributed() == (0, 1)
    # explicit single process is also a no-op
    assert initialize_distributed("host:1234", 1, 0) == (0, 1)


def test_ensemble_merge_matches_sequential(rng):
    fields = [(rng.normal(size=(9, 11)), rng.normal(size=(9, 11)))
              for _ in range(13)]
    x, y = np.meshgrid(np.arange(11.0), np.arange(9.0))

    seq = EnsembleAccumulator()
    for u, v in fields:
        seq.add(u, v)

    merged = EnsembleAccumulator()
    for lo, hi in ((0, 4), (4, 5), (5, 13)):  # uneven blocks, one singleton
        part = EnsembleAccumulator()
        for u, v in fields[lo:hi]:
            part.add(u, v)
        merged.merge(part)
    assert merged.n == seq.n == len(fields)

    t_ref = compute_statistics(x, y, [u for u, _ in fields],
                               [v for _, v in fields])
    for t in (seq.finalize(x, y), merged.finalize(x, y)):
        for k in t_ref:
            np.testing.assert_allclose(t[k], t_ref[k], atol=1e-10, rtol=1e-10)

    # merging into an empty accumulator copies (no aliasing with the source)
    empty = EnsembleAccumulator()
    empty.merge(seq)
    empty.add(*fields[0])
    assert empty.n == seq.n + 1


@pytest.fixture()
def campaign_folder(tmp_path):
    folder = tmp_path / "pairs"
    folder.mkdir()
    for i in range(5):
        fa, fb = particle_pair((128, 128),
                               displacement=(2.0 + 0.2 * i, -1.0), seed=40 + i)
        imwrite_gray(str(folder / f"c{i:03d}_a.bmp"), fa)
        imwrite_gray(str(folder / f"c{i:03d}_b.bmp"), fb)
    return str(folder)


def _params(folder, save_dir):
    from torchpiv_tpu.utils.config import PIVParams

    p = PIVParams()
    p.folder = folder
    p.device = "cpu"
    p.file_fmt = ".bmp"
    p.wind_size = 32
    p.overlap = 16
    p.multipass = 1
    p.save_opt = "Dont save"
    p.save_dir = save_dir
    return p


def test_sharded_runner_merge_equals_sequential(campaign_folder, tmp_path):
    from torchpiv_tpu.pipeline import PIVRunner

    save = str(tmp_path / "out")
    seq_table = PIVRunner(_params(campaign_folder, save),
                          batch_size=2).run()
    assert seq_table is not None

    states = []
    for i in range(2):
        ckpt = str(tmp_path / f"s{i}.npz")
        t = PIVRunner(_params(campaign_folder, save), batch_size=2,
                      shard=(i, 2), checkpoint_path=ckpt).run()
        assert t is not None
        assert os.path.exists(ckpt), "shard state must survive completion"
        states.append(ckpt)

    acc, total, x, y = merge_checkpoints(states)
    assert total == acc.n == 5  # 3 + 2 pairs
    merged = acc.finalize(x, y)
    for k in seq_table:
        np.testing.assert_allclose(merged[k], seq_table[k],
                                   atol=1e-9, rtol=1e-9)


def test_merge_stats_cli(campaign_folder, tmp_path):
    from torchpiv_tpu.cli import main as cli_main

    out = str(tmp_path / "out")
    for i in range(2):
        rc = cli_main(["run", campaign_folder, "--wind-size", "32",
                       "--overlap", "16", "--multipass", "1",
                       "--save", "Dont save", "--save-dir", out,
                       "--shard", f"{i}/2",
                       "--checkpoint", str(tmp_path / f"s{i}.npz")])
        assert rc == 0
    rc = cli_main(["merge-stats", str(tmp_path / "s0.npz"),
                   str(tmp_path / "s1.npz"), "--save-dir", out,
                   "--name", "camp"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "camp_statistics.txt"))
    # shard without checkpoint must refuse, not silently drop state
    with pytest.raises(SystemExit):
        cli_main(["run", campaign_folder, "--shard", "0/2",
                  "--save-dir", out])
    # mismatched grids must refuse to merge
    fa, fb = particle_pair((96, 96), displacement=(1.0, 0.0), seed=9)
    folder2 = tmp_path / "other"
    folder2.mkdir()
    imwrite_gray(str(folder2 / "o_a.bmp"), fa)
    imwrite_gray(str(folder2 / "o_b.bmp"), fb)
    rc = cli_main(["run", str(folder2), "--wind-size", "32", "--overlap",
                   "16", "--save", "Dont save", "--save-dir", out,
                   "--shard", "0/1", "--checkpoint", str(tmp_path / "sx.npz")])
    assert rc == 0
    with pytest.raises(ValueError):
        merge_checkpoints([str(tmp_path / "s0.npz"), str(tmp_path / "sx.npz")])


def test_merge_refuses_interrupted_shard_state(tmp_path, rng):
    """An interrupted shard's resume checkpoint must not silently merge
    into campaign statistics (it under-counts); --allow-partial opts in."""
    from torchpiv_tpu.utils.checkpoint import save_checkpoint

    x, y = np.meshgrid(np.arange(4.0), np.arange(3.0))
    done_acc = EnsembleAccumulator()
    part_acc = EnsembleAccumulator()
    for k in range(3):
        done_acc.add(rng.normal(size=(3, 4)), rng.normal(size=(3, 4)))
    part_acc.add(rng.normal(size=(3, 4)), rng.normal(size=(3, 4)))
    save_checkpoint(str(tmp_path / "done.npz"), done_acc, 3, x, y,
                    complete=True)
    save_checkpoint(str(tmp_path / "part.npz"), part_acc, 1, x, y)  # resume

    with pytest.raises(ValueError, match="not marked complete"):
        merge_checkpoints([str(tmp_path / "done.npz"),
                           str(tmp_path / "part.npz")])
    acc, total, _, _ = merge_checkpoints(
        [str(tmp_path / "done.npz"), str(tmp_path / "part.npz")],
        allow_partial=True)
    assert acc.n == 4 and total == 4
