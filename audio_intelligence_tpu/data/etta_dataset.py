"""ETTA data pipeline: audio datasets + manifest loaders.

Capability parity with ETTA/stable_audio_tools/data/dataset.py:
- ``audio_dir`` datasets: recursive scan for audio files (fast_scandir:83
  / get_audio_filenames:184),
- ``location_caption_pair`` ndjson manifests: {"location", "caption", ...}
  rows with optional per-dataset custom metadata fns (:331-344),
- random-chunk loading with pad/crop + timestamp conditioning outputs
  (data/utils.py PadCrop_Normalized_T:26-74),
- augmentations: phase flip, stereo/mono coercion (:76-106).

Pure-numpy host code feeding jitted training steps; randomness is an
explicit Generator.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

import numpy as np

from audio_intelligence_tpu.data.audio_io import read_wav

AUDIO_EXTENSIONS = (".wav", ".flac", ".ogg", ".mp3", ".aif", ".aiff", ".opus")


def create_dataloader_from_config(
    dataset_config: dict,
    sample_size: int,
    sample_rate: int,
    audio_channels: int = 2,
    batch_size: int = 4,
    seed: int = 0,
):
    """Dataset-config → (train iterator factory, valid datasets)
    (ETTA data/dataset.py create_dataloader_from_config:660-910 schema).

    dataset_config: {"dataset_type": "audio_dir"|"location_caption_pair_manifests",
    "datasets": [{"path"|"manifest_path": ..., "custom_metadata_module": opt}],
    "valid_datasets": [...] (optional)}.
    """

    def build(ds_list):
        configs = []
        for d in ds_list:
            kind = dataset_config.get("dataset_type", "audio_dir")
            if kind in ("location_caption_pair", "location_caption_pair_manifests"):
                configs.append(
                    {"type": "location_caption_pair",
                     "path": d.get("manifest_path") or d.get("path")}
                )
            else:
                configs.append({"type": "audio_dir", "path": d["path"]})
        return SampleDataset(
            configs=configs, sample_size=sample_size, sample_rate=sample_rate,
            channels=audio_channels,
        )

    train_ds = build(dataset_config.get("datasets", []))
    valid = [build([d]) for d in dataset_config.get("valid_datasets", [])]
    rng = np.random.default_rng(seed)

    def train_iter():
        while True:
            yield from train_ds.iter_batches(batch_size, rng)

    return train_iter, train_ds, valid


def get_audio_filenames(paths: Sequence[str], exts=AUDIO_EXTENSIONS) -> list[str]:
    """Recursive scan (fast_scandir analogue)."""
    out = []
    for root in paths:
        for dirpath, _, files in os.walk(root):
            for f in sorted(files):
                if f.lower().endswith(exts):
                    out.append(os.path.join(dirpath, f))
    return sorted(out)


def pad_crop_normalized(
    audio: np.ndarray,
    sample_size: int,
    sample_rate: int,
    rng: np.random.Generator,
    randomize: bool = True,
):
    """Random chunk + timestamp conditioning (PadCrop_Normalized_T:26-74).

    Returns (chunk [C, sample_size], t_start, t_end, seconds_start,
    seconds_total, padding_mask [sample_size]).
    """
    n = audio.shape[-1]
    upper = max(0, n - sample_size)
    offset = int(rng.integers(0, upper + 1)) if (randomize and upper > 0) else 0
    chunk = audio[..., offset : offset + sample_size]
    pad = sample_size - chunk.shape[-1]
    padding_mask = np.ones(sample_size, np.float32)
    if pad > 0:
        chunk = np.pad(chunk, [(0, 0)] * (chunk.ndim - 1) + [(0, pad)])
        padding_mask[sample_size - pad :] = 0.0
    t_start = offset / max(n, 1)
    t_end = (offset + sample_size) / max(n, 1)
    seconds_start = offset // sample_rate
    seconds_total = int(np.ceil(n / sample_rate))
    return chunk, t_start, t_end, seconds_start, seconds_total, padding_mask


def phase_flip(audio: np.ndarray, rng: np.random.Generator, p: float = 0.5):
    return -audio if rng.random() < p else audio


def to_stereo(audio: np.ndarray) -> np.ndarray:
    if audio.shape[0] == 1:
        return np.repeat(audio, 2, axis=0)
    return audio[:2]


def to_mono(audio: np.ndarray) -> np.ndarray:
    return audio.mean(axis=0, keepdims=True)


@dataclass
class SampleDataset:
    """Audio-dir or location/caption manifest dataset.

    configs: list of {"type": "audio_dir"|"location_caption_pair",
    "path": ..., "custom_metadata_fn": optional callable(metadata)→dict}.
    """

    configs: Sequence[dict]
    sample_size: int = 441000
    sample_rate: int = 44100
    channels: int = 2
    random_crop: bool = True
    augment_phase: bool = True

    def __post_init__(self):
        self.items: list[dict] = []
        for cfg in self.configs:
            kind = cfg.get("type", "audio_dir")
            if kind == "audio_dir":
                for path in get_audio_filenames([cfg["path"]]):
                    self.items.append({"location": path, "caption": None, **{
                        k: v for k, v in cfg.items() if k not in ("type", "path")
                    }})
            elif kind == "location_caption_pair":
                with open(cfg["path"]) as f:
                    for line in f:
                        if line.strip():
                            row = json.loads(line)
                            row.setdefault("caption", None)
                            self.items.append(row)
            else:
                raise ValueError(f"unknown dataset type {kind}")
        self.custom_metadata_fns = [
            cfg.get("custom_metadata_fn") for cfg in self.configs
        ]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        row = self.items[idx]
        audio, sr = read_wav(row["location"])
        if sr != self.sample_rate:
            import jax.numpy as jnp

            from audio_intelligence_tpu.ops.resample import resample

            audio = np.asarray(resample(jnp.asarray(audio), sr, self.sample_rate))
        audio = to_stereo(audio) if self.channels == 2 else to_mono(audio)

        chunk, t_start, t_end, s_start, s_total, pad_mask = pad_crop_normalized(
            audio, self.sample_size, self.sample_rate, rng, self.random_crop
        )
        if self.augment_phase:
            chunk = phase_flip(chunk, rng)

        metadata = {
            "location": row["location"],
            "prompt": row.get("caption") or os.path.basename(row["location"]),
            "seconds_start": s_start,
            "seconds_total": s_total,
            "t_start": t_start,
            "t_end": t_end,
            "padding_mask": pad_mask,
        }
        for fn in self.custom_metadata_fns:
            if fn is not None:
                metadata.update(fn(dict(row)))
        return chunk.astype(np.float32), metadata

    def iter_batches(self, batch_size: int, rng: np.random.Generator, shuffle=True):
        order = np.arange(len(self))
        if shuffle:
            rng.shuffle(order)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            idxs = order[i : i + batch_size]
            auds, metas = zip(*(self.__getitem__(int(j), rng) for j in idxs))
            batch_meta = {
                "prompt": [m["prompt"] for m in metas],
                "seconds_start": np.asarray([m["seconds_start"] for m in metas], np.float32),
                "seconds_total": np.asarray([m["seconds_total"] for m in metas], np.float32),
            }
            yield np.stack(auds), batch_meta
