"""A2SB + ETTA dataset pipelines (host-side)."""

import csv
import os

import numpy as np
import jax.numpy as jnp

from audio_intelligence_tpu.data.audio_io import write_wav
from audio_intelligence_tpu.data.a2sb_dataset import (
    MixAudioDataset,
    FullSequencePredictDataset,
    read_standard_csv,
)
from audio_intelligence_tpu.data.etta_dataset import (
    SampleDataset,
    pad_crop_normalized,
    get_audio_filenames,
    to_stereo,
)
from audio_intelligence_tpu.models.a2sb import corruption
from audio_intelligence_tpu import ops


def _mk_wavs(tmp_path, n=3, seconds=1.0, sr=8000):
    paths = []
    for i in range(n):
        rng = np.random.default_rng(i)
        wav = (rng.standard_normal(int(sr * seconds)) * 0.2).astype(np.float32)
        p = str(tmp_path / f"w{i}.wav")
        write_wav(p, sr, wav)
        paths.append(p)
    return paths


def test_read_standard_csv(tmp_path):
    p = str(tmp_path / "m.csv")
    with open(p, "w") as f:
        f.write("a.wav,3.5,22050\nb.wav\n")
    rows = read_standard_csv(p)
    assert rows[0] == {"filename": "a.wav", "duration": 3.5, "estimated_sr": 22050.0}
    assert rows[1] == {"filename": "b.wav"}


def test_mix_dataset_end_to_end(tmp_path):
    paths = _mk_wavs(tmp_path, n=2, seconds=2.0, sr=8000)
    man = tmp_path / "ds_manifest.csv"
    with open(man, "w") as f:
        w = csv.writer(f)
        for p in paths:
            w.writerow([os.path.basename(p), 2.0])

    seg = 8000  # 1s windows at 8kHz

    def gt_transform(wav):
        spec2 = ops.spectrogram(jnp.asarray(wav), n_fft=256, hop_length=64)
        msp = ops.complex_to_mag_inst_phase(spec2)
        msp = ops.drop_dc_term(msp)
        return jnp.moveaxis(msp, 0, -1)

    corr = corruption.MultinomialCorruption(
        p_upsample_mask=1.0, p_extension_mask=0.0, p_inpaint_mask=0.0,
        sampling_rate=8000,
        upsample_mask_kwargs=dict(min_cutoff_freq=1000, max_cutoff_freq=2000),
        inpainting_mask_kwargs=dict(min_inpainting_frac=0.1, max_inpainting_frac=0.2),
    )
    ds = MixAudioDataset(
        {"train": {"root_folder": str(tmp_path), "filename": "ds_manifest.csv"}},
        segment_length=seg,
        sampling_rate=8000,
        gt_transform=gt_transform,
        corruption=corr,
    )
    assert len(ds) == 4  # 2 files × 2 windows
    s = ds[0]
    assert s["x_0_clean"].shape == s["x_0_corrupted"].shape == s["loss_mask"].shape
    assert s["x_0_clean"].shape[-1] == 3

    batches = list(ds.iter_batches(2, np.random.default_rng(0)))
    assert batches[0]["x_0_clean"].shape[0] == 2


def test_mix_dataset_retry(tmp_path):
    man = tmp_path / "bad_manifest.csv"
    with open(man, "w") as f:
        f.write("missing.wav,1.0\n")
    ds = MixAudioDataset(
        {"bad": {"root_folder": str(tmp_path), "filename": "bad_manifest.csv"}},
        segment_length=100, sampling_rate=8000,
    )
    try:
        ds[0]
        assert False, "should raise after retries"
    except RuntimeError as e:
        assert "retries" in str(e)


def test_full_sequence_predict(tmp_path):
    paths = _mk_wavs(tmp_path, n=1, sr=8000)
    ds = FullSequencePredictDataset(paths, sampling_rate=8000)
    s = ds[0]
    assert s["wav"].shape[0] == 8000 and s["output_sr"] == 8000


def test_etta_sample_dataset(tmp_path):
    paths = _mk_wavs(tmp_path, n=3, seconds=0.5, sr=8000)
    # ndjson manifest
    import json

    nd = tmp_path / "m.ndjson"
    with open(nd, "w") as f:
        for p in paths[:2]:
            f.write(json.dumps({"location": p, "caption": f"cap {p}"}) + "\n")

    ds = SampleDataset(
        configs=[
            {"type": "location_caption_pair", "path": str(nd)},
            {"type": "audio_dir", "path": str(tmp_path)},
        ],
        sample_size=2000,
        sample_rate=8000,
        channels=2,
    )
    assert len(ds) == 5  # 2 manifest rows + 3 scanned files
    audio, meta = ds.__getitem__(0, np.random.default_rng(0))
    assert audio.shape == (2, 2000)
    assert meta["prompt"].startswith("cap ")
    assert meta["seconds_total"] >= 1

    batch, bm = next(ds.iter_batches(2, np.random.default_rng(0)))
    assert batch.shape == (2, 2, 2000)
    assert len(bm["prompt"]) == 2


def test_pad_crop_timestamps():
    rng = np.random.default_rng(0)
    audio = np.ones((1, 500), np.float32)
    chunk, t0, t1, ss, st, pm = pad_crop_normalized(audio, 1000, 100, rng)
    assert chunk.shape == (1, 1000)
    assert pm[:500].all() and not pm[500:].any()
    assert st == 5


def test_create_dataloader_from_config(tmp_path):
    from audio_intelligence_tpu.data.etta_dataset import create_dataloader_from_config

    paths = _mk_wavs(tmp_path, n=4, seconds=0.5, sr=8000)
    import json
    nd = tmp_path / "train.ndjson"
    with open(nd, "w") as f:
        for p in paths:
            f.write(json.dumps({"location": p, "caption": "x"}) + "\n")
    cfg = {
        "dataset_type": "location_caption_pair_manifests",
        "datasets": [{"manifest_path": str(nd)}],
        "valid_datasets": [{"manifest_path": str(nd)}],
    }
    train_iter, train_ds, valid = create_dataloader_from_config(
        cfg, sample_size=2000, sample_rate=8000, audio_channels=1, batch_size=2
    )
    assert len(train_ds) == 4 and len(valid) == 1
    audio, meta = next(train_iter())
    assert audio.shape == (2, 1, 2000)
    assert len(meta["prompt"]) == 2


def test_stft_datamodule_stages(tmp_path):
    """Stage wiring (A2SB/datasets/datamodule.py:34-210)."""
    import wave

    from audio_intelligence_tpu.data.a2sb_dataset import STFTAudioDataModule

    sr = 44100
    lines = []
    for i in range(4):
        p = tmp_path / f"f{i}.wav"
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(
                (np.sin(np.arange(sr) * 0.01 * (i + 1)) * 20000)
                .astype(np.int16)
                .tobytes()
            )
        split = "train" if i < 3 else "validation"
        lines.append(f"{split},f{i}.wav,1.0")
    (tmp_path / "man.csv").write_text("\n".join(lines))
    dm = STFTAudioDataModule(
        {"d0": {"root_folder": str(tmp_path), "filename": "man.csv"}},
        segment_length=sr // 4,
        batch_size=2,
        val_max_samples=5,
    )
    dm.setup("fit")
    assert len(dm.trainset.entries) == 3
    assert len(dm.valset) == 1 and len(dm.valset[0].entries) == 1
    batch = next(dm.train_dataloader(np.random.default_rng(0)))
    assert batch["wav"].shape == (2, sr // 4)
    dm.predict_filelist = [str(tmp_path / "f0.wav")]
    dm.setup("predict")
    item = next(dm.predict_dataloader())
    assert item["wav"].shape[-1] == sr
    dm.setup("test")
    assert dm.testset == []  # no test split rows
