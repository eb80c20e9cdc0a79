"""Lhotse-cuts audio reader honoring the reference contract.

``LhotseAudioReader`` (UALM/dataloader/multimodal_loader/audio_loader.py
:23-110): a dict-like lazy reader over a manifest directory holding
``cuts.jsonl.gz`` and/or ``recordings.jsonl.gz`` (cuts preferred),
returning ``reader[id] → (audio [num_channels, num_samples], sample_rate)``
with mono promoted to [1, T].

When the ``lhotse`` package is installed this delegates to it verbatim.
It is not baked into this image, so the default path is a dependency-free
parser of lhotse's public on-disk manifest schema:

- recordings.jsonl.gz rows: ``{"id", "sources": [{"type": "file",
  "channels": [...], "source": path}], "sampling_rate", "num_samples",
  "duration"}``
- cuts.jsonl.gz rows (MonoCut/MultiCut): ``{"id", "start", "duration",
  "channel", "recording": {<recording row>}}`` — audio is the recording
  sliced to [start, start+duration) seconds on the cut's channel(s).

Audio decode rides the shared WAV front-end (data/audio_io.read_wav →
native PCM decode when built).
"""

from __future__ import annotations

import gzip
import json
from pathlib import Path
from typing import Iterator, Tuple

import numpy as np

try:  # real lhotse if present (not in this image)
    from lhotse import CutSet, RecordingSet  # type: ignore

    HAVE_LHOTSE = True
except ImportError:
    HAVE_LHOTSE = False

from audio_intelligence_tpu.data.audio_io import read_wav


def _read_jsonl_gz(path: Path):
    opener = gzip.open if path.suffix == ".gz" else open
    with opener(path, "rt", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


class _ManifestItem:
    """One cut or recording row from the manifest."""

    def __init__(self, row: dict, is_cut: bool):
        self.row = row
        self.is_cut = is_cut
        self.id = row["id"]
        rec = row["recording"] if is_cut else row
        self.sampling_rate = int(rec["sampling_rate"])

    def load_audio(self) -> np.ndarray:
        rec = self.row["recording"] if self.is_cut else self.row
        sources = sorted(rec["sources"], key=lambda s: min(s.get("channels", [0])))
        chans = []
        sr = None
        for src in sources:
            if src.get("type", "file") != "file":
                raise NotImplementedError(
                    f"source type {src.get('type')!r} (only 'file' supported)"
                )
            audio, sr = read_wav(src["source"])
            chans.append(np.atleast_2d(audio))
        audio = np.concatenate(chans, axis=0) if len(chans) > 1 else chans[0]
        if sr != self.sampling_rate:
            raise ValueError(
                f"manifest sampling_rate {self.sampling_rate} != file {sr} "
                f"for {self.id}"
            )
        if self.is_cut:
            start = float(self.row.get("start", 0.0))
            dur = self.row.get("duration")
            i0 = int(round(start * sr))
            i1 = audio.shape[-1] if dur is None else i0 + int(round(float(dur) * sr))
            audio = audio[:, i0:i1]
            chan = self.row.get("channel", 0)
            chan = [chan] if isinstance(chan, int) else list(chan)
            if max(chan) >= audio.shape[0]:
                raise ValueError(
                    f"cut {self.id!r} requests channel(s) {chan} but the "
                    f"recording decodes to {audio.shape[0]} channel(s)"
                )
            audio = audio[chan]
        # contract: always [num_channels, num_samples] (audio_loader.py:78-90)
        if audio.ndim == 1:
            audio = audio[np.newaxis, :]
        return audio


class LhotseAudioReader:
    """Dict-like lazy reader over a lhotse manifest directory
    (audio_loader.py:23-110 contract; see module docstring)."""

    def __init__(self, manifest_dir: str, valid_ids: list | None = None):
        mdir = Path(manifest_dir)
        cuts_path = mdir / "cuts.jsonl.gz"
        recs_path = mdir / "recordings.jsonl.gz"

        if HAVE_LHOTSE:  # the reference code path, verbatim semantics
            if cuts_path.exists():
                full = CutSet.from_file(cuts_path)
            elif recs_path.exists():
                full = RecordingSet.from_file(recs_path)
            else:
                raise FileNotFoundError(f"No manifest files found in {manifest_dir}")
            if valid_ids is not None:
                keep = set(valid_ids)
                items = [it for it in full if it.id in keep]
            else:
                items = list(full)
            self.manifest = (
                CutSet.from_cuts(items)
                if isinstance(full, CutSet)
                else RecordingSet.from_recordings(items)
            )
            self._lhotse = True
            return

        self._lhotse = False
        if cuts_path.exists():
            rows, is_cut = _read_jsonl_gz(cuts_path), True
        elif recs_path.exists():
            rows, is_cut = _read_jsonl_gz(recs_path), False
        else:
            raise FileNotFoundError(f"No manifest files found in {manifest_dir}")
        keep = set(valid_ids) if valid_ids is not None else None
        self._items = {}
        for row in rows:
            item = _ManifestItem(row, is_cut)
            if keep is None or item.id in keep:
                self._items[item.id] = item

    def __getitem__(self, key: str) -> Tuple[np.ndarray, int]:
        if self._lhotse:
            item = self.manifest[key]
            audio = item.load_audio()
            sr = item.sampling_rate
            if audio.ndim == 1:
                audio = audio[np.newaxis, :]
            return audio, sr
        item = self._items[key]
        return item.load_audio(), item.sampling_rate

    def __contains__(self, key: str) -> bool:
        return key in (self.manifest if self._lhotse else self._items)

    def __len__(self) -> int:
        return len(self.manifest if self._lhotse else self._items)

    def keys(self):
        return self.manifest.ids if self._lhotse else self._items.keys()

    def values(self) -> Iterator:
        return iter(self.manifest) if self._lhotse else iter(self._items.values())

    def items(self):
        if self._lhotse:
            for item in self.manifest:
                yield item.id, item
        else:
            yield from self._items.items()
