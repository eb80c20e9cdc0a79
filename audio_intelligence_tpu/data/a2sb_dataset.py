"""A2SB data pipeline: CSV-manifest mixture datasets with fixed windows.

Capability parity with A2SB/datasets/datasets.py + datamodule.py:
- ``read_standard_csv``:43-71 manifests (path[, duration][, estimated
  bandwidth] rows; optional per-file estimated sample rate for
  true-bandwidth loss-mask exclusion, datasets.py:182-183),
- ``MixAudioDataset``:73-200 — several manifests mixed; each file is
  pre-segmented into fixed ``segment_length`` windows
  (build_file_idx_mapping:129), loads resample+normalize, retry-on-error
  __getitem__ (:193-200),
- on-the-fly GT transform → corruption producing
  {x_0_clean, x_0_corrupted, loss_mask} batches in NHWC,
- ``FullSequencePredictDataset``:203-245 — whole-file spectrograms for
  prediction.
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

import numpy as np

from audio_intelligence_tpu.data.audio_io import read_wav


def read_standard_csv(path: str) -> list[dict]:
    """Rows: filename[,duration_sec][,estimated_sr], or the split-first
    variant split,filename,duration[,estimated_sr] (datasets.py:43-71)."""
    rows = []
    with open(path) as f:
        for row in csv.reader(f):
            if not row:
                continue
            if row[0].strip() in ("train", "validation", "test"):
                entry = {"split": row[0].strip(), "filename": row[1]}
                rest = row[2:]
            else:
                entry = {"filename": row[0]}
                rest = row[1:]
            if len(rest) > 0 and rest[0]:
                entry["duration"] = float(rest[0])
            if len(rest) > 1 and rest[1]:
                entry["estimated_sr"] = float(rest[1])
            rows.append(entry)
    return rows


def load_wav_normalized(path: str, target_sr: int) -> np.ndarray:
    """Load → mono → resample → peak-normalize 0.95 (datasets.py:144-165)."""
    audio, sr = read_wav(path)
    wav = audio.mean(axis=0)
    if sr != target_sr:
        import jax.numpy as jnp

        from audio_intelligence_tpu.ops.resample import resample

        wav = np.asarray(resample(jnp.asarray(wav), sr, target_sr))
    peak = np.abs(wav).max()
    if peak > 0:
        wav = wav / peak * 0.95
    return wav.astype(np.float32)


@dataclass
class MixAudioDataset:
    """Mixture of CSV-manifest datasets, fixed windows, retries on error.

    mix_config: {name: {"root_folder": ..., "filename": ...}}
    gt_transform: wav [T] → spec sample [H, W, C] (host/JAX callable)
    corruption: (key, spec) → (corrupted, mask)
    """

    mix_config: dict
    segment_length: int = 130560
    sampling_rate: int = 44100
    gt_transform: Optional[Callable] = None
    corruption: Optional[Callable] = None
    max_retries: int = 5
    split: Optional[str] = None
    max_samples: Optional[int] = None

    def __post_init__(self):
        # split column filtering + per-split caps (datasets.py:76-127,
        # datamodule.py val_max_samples)
        self.entries: list[dict] = []
        for name, cfg in self.mix_config.items():
            manifest = os.path.join(cfg["root_folder"], cfg["filename"])
            kept = 0
            for row in read_standard_csv(manifest):
                if (
                    self.split is not None
                    and str(row.get("split", self.split)).strip() != self.split
                ):
                    continue
                if self.max_samples is not None and kept >= self.max_samples:
                    break
                fn = row["filename"]
                if not os.path.isabs(fn):
                    fn = os.path.join(cfg["root_folder"], fn)
                row = dict(row, filename=fn, dataset=name)
                self.entries.append(row)
                kept += 1
        # segment index: (entry_idx, segment_idx) per fixed window
        self.index: list[tuple[int, int]] = []
        for ei, row in enumerate(self.entries):
            if "duration" in row:
                n_seg = max(
                    int(row["duration"] * self.sampling_rate) // self.segment_length, 1
                )
            else:
                n_seg = 1
            for si in range(n_seg):
                self.index.append((ei, si))

    def __len__(self):
        return len(self.index)

    def _unstable_getitem(self, idx: int, rng: np.random.Generator):
        ei, si = self.index[idx]
        row = self.entries[ei]
        wav = load_wav_normalized(row["filename"], self.sampling_rate)
        start = si * self.segment_length
        seg = wav[start : start + self.segment_length]
        if seg.shape[0] < self.segment_length:
            seg = np.pad(seg, (0, self.segment_length - seg.shape[0]))

        sample = {"wav": seg, "dataset": row["dataset"]}
        if self.gt_transform is not None:
            import jax

            clean = np.asarray(self.gt_transform(seg))
            sample["x_0_clean"] = clean
            if self.corruption is not None:
                key = jax.random.PRNGKey(int(rng.integers(0, 2**31)))
                corrupted, mask = self.corruption(key, clean)
                # true-bandwidth exclusion: bins above the file's estimated
                # bandwidth carry no loss (datasets.py:182-183)
                mask = np.asarray(mask).copy()
                if "estimated_sr" in row:
                    h = clean.shape[0]
                    max_bin = int(2 * h * (row["estimated_sr"] / 2) / self.sampling_rate)
                    mask[max_bin:, :, :] = 0.0
                sample["x_0_corrupted"] = np.asarray(corrupted)
                sample["loss_mask"] = mask
        return sample

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        err = None
        for _ in range(self.max_retries):
            try:
                return self._unstable_getitem(idx, rng)
            except Exception as e:  # retry a different random index
                err = e
                idx = int(rng.integers(0, len(self)))
        raise RuntimeError(f"failed after {self.max_retries} retries: {err}")

    def iter_batches(self, batch_size: int, rng: np.random.Generator, shuffle=True):
        order = np.arange(len(self))
        if shuffle:
            rng.shuffle(order)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            samples = [self.__getitem__(int(j), rng) for j in order[i : i + batch_size]]
            yield {
                k: np.stack([s[k] for s in samples])
                for k in ("wav", "x_0_clean", "x_0_corrupted", "loss_mask")
                if k in samples[0]
            }


@dataclass
class FullSequencePredictDataset:
    """Whole-file spectrograms for the predict path (datasets.py:203-245)."""

    filelist: Sequence[str]
    sampling_rate: int = 44100
    gt_transform: Optional[Callable] = None

    def __len__(self):
        return len(self.filelist)

    def __getitem__(self, idx: int):
        path = self.filelist[idx]
        wav = load_wav_normalized(path, self.sampling_rate)
        sample = {"wav": wav, "filename": path, "output_sr": self.sampling_rate}
        if self.gt_transform is not None:
            sample["x_0_clean"] = np.asarray(self.gt_transform(wav))
        return sample


@dataclass
class STFTAudioDataModule:
    """Stage wiring over the datasets (A2SB/datasets/datamodule.py:34-210).

    ``setup(stage)`` builds:
    - fit        → one combined trainset + one valset PER dataset name
                   (evaluation uses fixed randomness; val capped at
                   ``val_max_samples`` like the reference),
    - validation → the per-dataset valsets only,
    - test       → per-dataset testsets,
    - predict    → FullSequencePredictDataset over predict_filelist
                   [predict_start_idx:predict_end_idx].
    """

    mix_dataset_config: dict
    segment_length: int = 130560
    sampling_rate: int = 44100
    batch_size: int = 8
    gt_transform: Optional[Callable] = None
    corruption: Optional[Callable] = None
    train_max_samples: Optional[int] = None
    val_max_samples: int = 100
    predict_filelist: Sequence[str] = ()
    predict_start_idx: int = 0
    predict_end_idx: Optional[int] = None

    def _make(self, config, split, max_samples):
        return MixAudioDataset(
            mix_config=config,
            segment_length=self.segment_length,
            sampling_rate=self.sampling_rate,
            gt_transform=self.gt_transform,
            corruption=self.corruption,
            split=split,
            max_samples=max_samples,
        )

    def _per_dataset(self, split, max_samples):
        sets = []
        for name in self.mix_dataset_config:
            ds = self._make(
                {name: self.mix_dataset_config[name]}, split, max_samples
            )
            if len(ds) > 0:
                sets.append(ds)
        return sets

    def setup(self, stage: str):
        if stage == "fit":
            self.trainset = self._make(
                self.mix_dataset_config, "train", self.train_max_samples
            )
            self.valset = self._per_dataset("validation", self.val_max_samples)
        elif stage == "validation":
            self.valset = self._per_dataset("validation", self.val_max_samples)
        elif stage == "test":
            self.testset = self._per_dataset("test", None)
        elif stage == "predict":
            end = self.predict_end_idx
            files = list(self.predict_filelist)[self.predict_start_idx : end]
            self.predictset = FullSequencePredictDataset(
                filelist=files,
                sampling_rate=self.sampling_rate,
                gt_transform=self.gt_transform,
            )
        else:
            raise ValueError(f"unknown stage {stage!r}")

    def train_dataloader(self, rng=None, prefetch_depth: int = 2):
        """``prefetch_depth > 0`` runs batch assembly in a background
        thread (data/prefetch.py), overlapping wav IO + decode with the
        device step — the reference's DataLoader(num_workers=...) role."""
        rng = rng or np.random.default_rng(0)
        it = self.trainset.iter_batches(self.batch_size, rng, shuffle=True)
        if prefetch_depth > 0:
            from audio_intelligence_tpu.data.prefetch import background_batches

            return background_batches(it, depth=prefetch_depth)
        return it

    def val_dataloaders(self, rng=None):
        # fixed randomness per the reference's validation augmentation
        return [
            ds.iter_batches(self.batch_size, np.random.default_rng(0), shuffle=False)
            for ds in self.valset
        ]

    def predict_dataloader(self):
        return (self.predictset[i] for i in range(len(self.predictset)))
