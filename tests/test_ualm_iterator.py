"""UALM data iterator: stats, resampling, deterministic resumable plans."""

import os

import numpy as np

from audio_intelligence_tpu.data.ualm_iterator import (
    DataIteratorFactory,
    load_stats_file,
    write_stats_file,
    resample_keys,
)


def _setup(tmp_path, world_size=1, rank=0, loader_state=None):
    stats_dir = str(tmp_path / "stats")
    write_stats_file(
        os.path.join(stats_dir, "stats_caption_to_audio_ds1.jsonl"),
        {f"a{i}": 10 + i for i in range(20)},
    )
    write_stats_file(
        os.path.join(stats_dir, "stats_text_only_ds2.jsonl"),
        {f"b{i}": 5 + i for i in range(10)},
    )
    return DataIteratorFactory(
        specifiers=["caption_to_audio:ds1", "text_only:ds2:2.0"],
        stats_dir=stats_dir,
        batch_token=100,
        rank=rank,
        world_size=world_size,
        seed=7,
        loader_state_path=loader_state,
    )


def test_stats_roundtrip(tmp_path):
    p = str(tmp_path / "s.jsonl")
    write_stats_file(p, {"x": 5, "y": 9})
    assert load_stats_file(p) == {"x": 5, "y": 9}


def test_resample_factor():
    keys = [("t", "d", str(i)) for i in range(10)]
    rng = np.random.default_rng(0)
    assert len(resample_keys(keys, 2.0, rng)) == 20
    assert len(resample_keys(keys, 2.5, rng)) == 25
    assert len(resample_keys(keys, 1.0, rng)) == 10


def test_batch_plan_deterministic_and_budget(tmp_path):
    fac = _setup(tmp_path)
    b1 = fac.build_batches(epoch=0)
    b2 = fac.build_batches(epoch=0)
    assert b1 == b2  # same epoch → same plan
    assert fac.build_batches(epoch=1) != b1  # new epoch reshuffles
    # ds2 duplicated ×2: 20 + 20 = 40 samples total
    assert sum(len(b) for b in b1) == 40
    for b in b1:
        max_len = max(fac.key_to_length[k] for k in b)
        assert max_len * len(b) <= 100


def test_rank_sharding(tmp_path):
    f0 = _setup(tmp_path, world_size=2, rank=0)
    f1 = _setup(tmp_path, world_size=2, rank=1)
    b0, b1 = f0.build_batches(0), f1.build_batches(0)
    assert len(b0) == len(b1)  # synchronized counts
    assert all(x != y for x, y in zip(b0, b1))


def test_iter_resume(tmp_path):
    state_path = str(tmp_path / "loader_state" / "train_0_1.json")
    fac = _setup(tmp_path, loader_state=state_path)
    seen = []
    it = fac.build_iter(lambda keys: keys, epoch=0)
    for i, batch in enumerate(it):
        seen.append(batch)
        if i == 2:
            break  # simulate crash after 3 batches

    fac2 = _setup(tmp_path, loader_state=state_path)
    rest = list(fac2.build_iter(lambda keys: keys, epoch=0))
    full = fac.build_batches(epoch=0)
    assert seen + rest == full  # resume replays the exact remaining order


def test_sequential_mode(tmp_path):
    fac = _setup(tmp_path)
    batches = fac.sequential_batches(batch_size=7)
    keys = [k for b in batches for k in b]
    assert keys == sorted(fac.key_to_length)
