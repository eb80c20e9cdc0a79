"""SingleDataset/CombinedDataset + registry env (UALM dataloader/dataset.py)."""

import json
import os

import numpy as np
import pytest

from audio_intelligence_tpu.data.datasets import (
    CombinedDataset,
    DialogueReader,
    SingleDataset,
    TextReader,
    prepare_dataset_json,
)
from audio_intelligence_tpu.data.tarshard import create_tar_shards


@pytest.fixture
def dataset_json(tmp_path):
    # 4 wavs in tar shards
    import wave

    files = []
    for i in range(4):
        p = tmp_path / f"utt{i}.wav"
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(
                (np.sin(np.arange(1600) * (0.01 + i * 0.01)) * 20000)
                .astype(np.int16)
                .tobytes()
            )
        files.append((f"utt{i}", str(p)))
    create_tar_shards(files, str(tmp_path / "shards"), shard_size=2, prefix="train")
    # captions for 3 of the 4 (intersection should drop utt3)
    cap = tmp_path / "captions.jsonl"
    cap.write_text(
        "\n".join(
            json.dumps({"id": f"utt{i}", "text": f"caption {i}"}) for i in range(3)
        )
    )
    out = tmp_path / "dataset.json"
    n = prepare_dataset_json(
        [
            f"audio1,{tmp_path}/shards/train.sqlite,tar_audio",
            f"text1,{cap},text",
        ],
        str(out),
    )
    assert n == 3
    return str(out)


def test_single_dataset_and_rank_striping(dataset_json):
    ds = SingleDataset(dataset_json)
    assert len(ds) == 3 and ds.entries == ["audio1", "text1"]
    item = ds["utt1"]
    wav, sr = item["audio1"]
    assert sr == 16000 and wav.shape[-1] == 1600
    assert item["text1"] == "caption 1"
    # world_size 2 stripes the samples
    d0 = SingleDataset(dataset_json, rank=0, world_size=2)
    d1 = SingleDataset(dataset_json, rank=1, world_size=2)
    assert len(d0) + len(d1) == 3
    assert not set(d0.sample_ids) & set(d1.sample_ids)


def test_combined_dataset_with_registry(dataset_json, tmp_path, monkeypatch):
    reg = tmp_path / "registry.json"
    reg.write_text(json.dumps({"mydata": {"path": dataset_json}}))
    monkeypatch.setenv("AIT_DATASET_REGISTRY", f"{reg}:/nonexistent.yaml")
    ds = CombinedDataset(
        datasets=[("direct", dataset_json)],
        registered_datasets=["mydata"],
        num_worker=2,
    )
    assert sorted(ds.dataset_names) == ["direct", "mydata"]
    assert len(ds) == 6
    key, item = ds[("tta", "mydata", "utt0")]
    assert key == ("tta", "mydata", "utt0") and item["text1"] == "caption 0"
    ds.verify_subset_entries("tta", "mydata", ["audio1", "text1"])
    with pytest.raises(ValueError, match="requires entry"):
        ds.verify_subset_entries("tta", "mydata", ["speaker"])
    assert ds.get_all_examples()["direct"] == ["utt0", "utt1", "utt2"]
    # unknown registered name
    with pytest.raises(ValueError, match="not in registry"):
        CombinedDataset(registered_datasets=["nope"])
    # duplicate name
    with pytest.raises(ValueError, match="Duplicate"):
        CombinedDataset(
            datasets=[("a", dataset_json), ("a", dataset_json)]
        )


def test_dialogue_reader(tmp_path):
    d = tmp_path / "dlg.jsonl"
    d.write_text(
        json.dumps(
            {
                "example_id": "d0",
                "messages": [
                    {"role": "user", "modality": "text", "content": "hi"},
                    {"role": "assistant", "modality": "text", "content": "yo"},
                ],
            }
        )
    )
    r = DialogueReader(str(d))
    msgs = r["d0"]
    assert msgs[0] == ("user", "text", "hi") and len(msgs) == 2
    bad = tmp_path / "bad.jsonl"
    bad.write_text(json.dumps({"example_id": "x", "messages": [
        {"role": "alien", "modality": "text", "content": "?"}]}))
    with pytest.raises(ValueError, match="invalid role"):
        DialogueReader(str(bad))["x"]


def test_text_reader_plain_format(tmp_path):
    t = tmp_path / "text.txt"
    t.write_text("utt0 hello world\nutt1 second line\n\nbadline\n")
    r = TextReader(str(t))
    assert r["utt0"] == "hello world" and len(r) == 2
    r2 = TextReader(str(t), valid_ids=["utt1"])
    assert list(r2.keys()) == ["utt1"]
