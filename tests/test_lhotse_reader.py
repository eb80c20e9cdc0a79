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
