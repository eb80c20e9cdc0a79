"""Lhotse-manifest audio reader: the reference cuts contract
(UALM/dataloader/multimodal_loader/audio_loader.py:23-110) on lhotse's
public jsonl.gz on-disk schema, without the lhotse dependency."""

import gzip
import json
import wave

import numpy as np
import pytest

from audio_intelligence_tpu.data.lhotse_reader import LhotseAudioReader


def _write_wav(path, pcm, sr=16000, channels=1):
    with wave.open(str(path), "wb") as f:
        f.setnchannels(channels)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


def _write_jsonl_gz(path, rows):
    with gzip.open(path, "wt", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.fixture()
def manifest_dir(tmp_path):
    rng = np.random.default_rng(0)
    recs = []
    for i, n in enumerate((1600, 2400)):
        pcm = (rng.standard_normal(n) * 8000).astype(np.int16)
        p = tmp_path / f"rec{i}.wav"
        _write_wav(p, pcm)
        recs.append(
            {
                "id": f"rec{i}",
                "sources": [{"type": "file", "channels": [0], "source": str(p)}],
                "sampling_rate": 16000,
                "num_samples": n,
                "duration": n / 16000,
            }
        )
    # stereo recording: interleaved 2ch wav
    pcm2 = (rng.standard_normal(2000 * 2) * 8000).astype(np.int16)
    p2 = tmp_path / "rec2.wav"
    _write_wav(p2, pcm2, channels=2)
    recs.append(
        {
            "id": "rec2",
            "sources": [{"type": "file", "channels": [0, 1], "source": str(p2)}],
            "sampling_rate": 16000,
            "num_samples": 2000,
            "duration": 2000 / 16000,
        }
    )
    return tmp_path, recs


def test_recordings_manifest(manifest_dir):
    tmp_path, recs = manifest_dir
    _write_jsonl_gz(tmp_path / "recordings.jsonl.gz", recs)
    r = LhotseAudioReader(str(tmp_path))
    assert len(r) == 3 and "rec0" in r and "missing" not in r
    audio, sr = r["rec0"]
    assert sr == 16000 and audio.shape == (1, 1600)  # mono → [1, T]
    audio2, _ = r["rec2"]
    assert audio2.shape == (2, 2000)  # multi-channel stays [C, T]
    assert sorted(r.keys()) == ["rec0", "rec1", "rec2"]
    assert len(list(r.items())) == 3


def test_valid_ids_filter(manifest_dir):
    tmp_path, recs = manifest_dir
    _write_jsonl_gz(tmp_path / "recordings.jsonl.gz", recs)
    r = LhotseAudioReader(str(tmp_path), valid_ids=["rec1"])
    assert len(r) == 1 and "rec0" not in r


def test_cuts_manifest_slices(manifest_dir):
    tmp_path, recs = manifest_dir
    cuts = [
        {
            "id": "cut0",
            "start": 0.05,
            "duration": 0.0375,
            "channel": 0,
            "recording": recs[0],
            "type": "MonoCut",
        },
        {
            "id": "cut1",
            "start": 0.0,
            "duration": 0.1,
            "channel": [1],
            "recording": recs[2],
            "type": "MultiCut",
        },
    ]
    _write_jsonl_gz(tmp_path / "cuts.jsonl.gz", cuts)
    r = LhotseAudioReader(str(tmp_path))
    audio, sr = r["cut0"]
    assert sr == 16000 and audio.shape == (1, 600)  # 0.0375 s @ 16 kHz
    # matches a manual slice of the decoded recording: samples 800..1400
    with wave.open(str(tmp_path / "rec0.wav"), "rb") as f:
        pcm = np.frombuffer(f.readframes(f.getnframes()), "<i2")
    want = (pcm.astype(np.float32) / 32768.0)[800:1400]
    np.testing.assert_allclose(audio[0], want, atol=1e-6)
    ch1, _ = r["cut1"]
    assert ch1.shape == (1, 1600)  # channel-1 slice of the stereo rec


def test_missing_manifest_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        LhotseAudioReader(str(tmp_path))


def test_single_dataset_lhotse_entry(manifest_dir):
    """SingleDataset resolves reader type 'lhotse_audio' to the manifest
    reader (dataset.py:26-32 registry parity)."""
    tmp_path, recs = manifest_dir
    _write_jsonl_gz(tmp_path / "recordings.jsonl.gz", recs)
    dset_json = tmp_path / "dataset.json"
    dset_json.write_text(
        json.dumps(
            {
                "data_entry": [
                    {"name": "audio", "path": str(tmp_path), "reader": "lhotse_audio"}
                ],
                "samples": ["rec0", "rec1"],
            }
        )
    )
    from audio_intelligence_tpu.data.datasets import SingleDataset

    ds = SingleDataset(str(dset_json))
    assert len(ds) == 2
    audio, sr = ds["rec1"]["audio"]
    assert sr == 16000 and audio.shape == (1, 2400)


def test_prepare_audio_lhotse_roundtrip(tmp_path):
    """The writer side of the lhotse contract
    (UALM/scripts/prepare_audio_lhotse.py parity): Kaldi wav.scp +
    segments → cuts/recordings.jsonl.gz that LhotseAudioReader loads,
    with correct slicing."""
    import json
    import sys
    import wave
    from pathlib import Path

    import numpy as np

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from cli.prepare_audio_lhotse import prepare_audio_lhotse
    from audio_intelligence_tpu.data.lhotse_reader import LhotseAudioReader

    sr = 8000
    wavs = tmp_path / "wavs"
    wavs.mkdir()
    rng = np.random.default_rng(0)
    pcm = {}
    for name, secs in (("r1", 2.0), ("r2", 1.0)):
        data = (rng.standard_normal(int(secs * sr)) * 3000).astype("<i2")
        with wave.open(str(wavs / f"{name}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(data.tobytes())
        pcm[name] = data.astype(np.float32) / 32768.0

    scp = tmp_path / "wav.scp"
    scp.write_text(
        f"r1 {wavs / 'r1.wav'}\nr2 {wavs / 'r2.wav'}\n"
    )
    seg = tmp_path / "segments"
    seg.write_text(
        "r1_a r1 0.5 1.5\nr2_full r2 0.0 1.0\nbad r1 3.0 4.0\n"
    )
    out = tmp_path / "manifests"
    stats = prepare_audio_lhotse(str(scp), str(seg), str(out), num_jobs=2)
    assert stats["num_recordings"] == 2
    assert stats["num_cuts"] == 2  # the out-of-bounds segment is skipped

    reader = LhotseAudioReader(str(out))
    audio, got_sr = reader["r1_a"]
    assert got_sr == sr
    assert audio.shape == (1, sr)  # 1.0 s slice
    np.testing.assert_allclose(
        audio[0], pcm["r1"][sr // 2 : sr // 2 + sr], atol=1e-4
    )

    # wav.scp only (no segments): whole-recording cuts
    out2 = tmp_path / "manifests2"
    stats2 = prepare_audio_lhotse(str(scp), None, str(out2), num_jobs=1)
    assert stats2["num_cuts"] == 2
    reader2 = LhotseAudioReader(str(out2))
    a2, _ = reader2["r2"]
    assert a2.shape == (1, sr)
