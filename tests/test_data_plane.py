"""Data plane: batching, WAV I/O, tar shards."""

import os

import numpy as np

from audio_intelligence_tpu.data.batching import (
    batchfy_bucket,
    batchfy_pack,
    synchronize_batches,
)
from audio_intelligence_tpu.data.audio_io import read_wav, write_wav
from audio_intelligence_tpu.data.tarshard import (
    create_tar_shards,
    TarballAudioReader,
    TarballMetadataReader,
)


def test_batchfy_bucket_budget():
    lengths = {f"k{i}": l for i, l in enumerate([10, 20, 30, 40, 50, 60])}
    buckets = batchfy_bucket(list(lengths), lengths, batch_token=80)
    assert sum(len(b) for b in buckets) == 6
    for b in buckets:
        max_len = max(lengths[k] for k in b)
        assert max_len * len(b) <= 80
    # sorted by length → first bucket holds the short items
    assert lengths[buckets[0][0]] <= lengths[buckets[-1][0]]


def test_batchfy_pack_budget_and_coverage():
    rng = np.random.default_rng(0)
    lengths = {f"k{i}": int(l) for i, l in enumerate(rng.integers(5, 50, 30))}
    batches = batchfy_pack(list(lengths), lengths, batch_token=100)
    seen = [k for b in batches for k in b]
    assert sorted(seen) == sorted(lengths)
    for b in batches:
        assert sum(lengths[k] for k in b) <= 100


def test_synchronize_batches():
    out = synchronize_batches([[1, 2, 3], [4, 5], [6, 7, 8, 9]])
    assert [len(b) for b in out] == [2, 2, 2]


def test_wav_roundtrip(tmp_path):
    sr = 16000
    t = np.arange(sr) / sr
    audio = np.stack([np.sin(2 * np.pi * 440 * t), np.sin(2 * np.pi * 220 * t)])
    path = str(tmp_path / "x.wav")
    write_wav(path, sr, audio.astype(np.float32) * 0.5)
    back, sr2 = read_wav(path)
    assert sr2 == sr and back.shape == audio.shape
    np.testing.assert_allclose(back, audio * 0.5, atol=1e-3)


def test_tar_shards_random_access(tmp_path):
    sr = 8000
    files = []
    for i in range(5):
        rng = np.random.default_rng(i)
        audio = (rng.standard_normal(sr) * 0.2).astype(np.float32)
        p = str(tmp_path / f"a{i}.wav")
        write_wav(p, sr, audio)
        files.append((f"utt{i}", p))

    out = str(tmp_path / "shards")
    idx_paths = create_tar_shards(files, out, shard_size=2)
    assert len(idx_paths) == 3

    # jsonl index
    meta = TarballMetadataReader(idx_paths[0])
    assert len(meta.keys()) == 2

    # sqlite combined index drives the reader
    reader = TarballAudioReader(os.path.join(out, "shard.sqlite"), out)
    assert sorted(reader.keys()) == [f"utt{i}" for i in range(5)]
    audio, sr2 = reader.read("utt3")
    assert sr2 == sr and audio.shape == (1, sr)
    ref, _ = read_wav(str(tmp_path / "a3.wav"))
    np.testing.assert_allclose(audio, ref, atol=1e-6)

    # sub-segment byte-range read
    seg, _ = reader.read("utt3", start_sec=0.25, duration_sec=0.5)
    assert seg.shape == (1, sr // 2)
    np.testing.assert_allclose(seg, ref[:, sr // 4 : sr // 4 + sr // 2], atol=1e-6)
    reader.close()


def test_background_batches_order_and_errors():
    from audio_intelligence_tpu.data.prefetch import background_batches

    assert list(background_batches(iter(range(20)), depth=3)) == list(range(20))

    def boom():
        yield 1
        raise RuntimeError("loader died")

    it = background_batches(boom(), depth=1)
    assert next(it) == 1
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="loader died"):
        next(it)
