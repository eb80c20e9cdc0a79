#!/usr/bin/env python
"""Standalone, dependency-free reader for produced tar-shard manifests.

Parity with UALM/tools/object_storage_manifest/standalone_loader.py: a
single file consuming the ETL outputs with NOTHING but the stdlib and
numpy — no audio_intelligence_tpu import, no soundfile/torch — so
external consumers (eval harnesses, other frameworks) can read the
shards directly.

Supports both artifact levels:
- stage-1 shard manifests (``{prefix}.manifest.jsonl`` + ``*.tar`` +
  ``*.index.jsonl`` from cli/create_manifest.py): ``StandaloneManifest``
- stage-2 UALM dataset manifests (``dataset_{task}_{name}.json`` from
  cli/convert_tar_to_manifest.py): ``StandaloneDataset``

CLI:
  python tools/standalone_loader.py --manifest shards/train.manifest.jsonl --list
  python tools/standalone_loader.py --manifest shards/train.manifest.jsonl \
      --id sample42 --out sample42.wav
  python tools/standalone_loader.py --dataset exp/dataset_caption_to_audio_x.json --list
"""

from __future__ import annotations

import argparse
import io
import json
import os
import struct
import wave
from pathlib import Path
from typing import Any, Dict, Iterator, Optional, Tuple

import numpy as np


def _read_wav_bytes(
    data: bytes,
    start_sec: Optional[float] = None,
    duration_sec: Optional[float] = None,
) -> Tuple[np.ndarray, int]:
    """Decode PCM16 WAV bytes → (float32 [C, T], sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        sr = w.getframerate()
        ch = w.getnchannels()
        if w.getsampwidth() != 2:
            raise ValueError("standalone loader reads PCM16 wavs")
        if start_sec:
            w.setpos(min(int(start_sec * sr), w.getnframes()))
        n = (
            int(duration_sec * sr)
            if duration_sec
            else w.getnframes() - w.tell()
        )
        raw = w.readframes(n)
    audio = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    return audio.reshape(-1, ch).T, sr


class TarByteReader:
    """Byte-range reads of tar members via the jsonl index (one seek +
    one bounded read per sample; never scans the archive)."""

    def __init__(self, shard_dir: str):
        self.shard_dir = shard_dir
        self.members: Dict[str, Dict[str, Any]] = {}
        for f in sorted(os.listdir(shard_dir)):
            if f.endswith(".index.jsonl"):
                with open(os.path.join(shard_dir, f), encoding="utf-8") as fh:
                    for line in fh:
                        if line.strip():
                            row = json.loads(line)
                            self.members[row["key"]] = row
        self._files: Dict[str, Any] = {}

    def keys(self):
        return self.members.keys()

    def info(self, key: str) -> Dict[str, Any]:
        return self.members[key]

    def read_bytes(self, key: str) -> bytes:
        m = self.members[key]
        tar_path = os.path.join(self.shard_dir, m["tar_path"])
        f = self._files.get(tar_path)
        if f is None:
            f = self._files[tar_path] = open(tar_path, "rb")
        f.seek(m["data_offset"])
        return f.read(m["data_size"])

    def read_audio(
        self,
        key: str,
        start_sec: Optional[float] = None,
        duration_sec: Optional[float] = None,
    ) -> Tuple[np.ndarray, int]:
        return _read_wav_bytes(self.read_bytes(key), start_sec, duration_sec)

    def close(self):
        for f in self._files.values():
            f.close()
        self._files.clear()


class StandaloneManifest:
    """Iterate a stage-1 ``{prefix}.manifest.jsonl``: rows carry id, audio
    metadata (tar offsets, duration, sample rate) and text fields."""

    def __init__(self, manifest_jsonl: str):
        self.rows: Dict[str, Dict[str, Any]] = {}
        with open(manifest_jsonl, encoding="utf-8") as f:
            for line in f:
                if line.strip():
                    row = json.loads(line)
                    self.rows[row["id"]] = row
        self.tar = TarByteReader(str(Path(manifest_jsonl).resolve().parent))

    def keys(self):
        return self.rows.keys()

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, sid: str) -> Dict[str, Any]:
        return self.rows[sid]

    def read_audio(self, sid: str) -> Tuple[np.ndarray, int]:
        row = self.rows[sid]
        a = row.get("audio", {})
        return self.tar.read_audio(
            a.get("key", sid), a.get("offset") or None, a.get("duration") or None
        )

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        return iter(self.rows.values())


class StandaloneDataset:
    """Read a stage-2 ``dataset_{task}_{name}.json``: text entries load
    eagerly; audio entries resolve to (wave [C, T], sr) on access."""

    def __init__(self, dataset_json: str):
        with open(dataset_json, encoding="utf-8") as f:
            doc = json.load(f)
        self.samples = doc["samples"]
        self.text: Dict[str, Dict[str, str]] = {}
        self.audio_specs: Dict[str, Dict[str, Dict[str, Any]]] = {}
        self._tar_readers: Dict[str, TarByteReader] = {}
        for entry in doc["data_entry"]:
            name, path, reader = entry["name"], entry["path"], entry["reader"]
            if reader == "text":
                table = {}
                with open(path, encoding="utf-8") as f:
                    for line in f:
                        if line.strip():
                            row = json.loads(line)
                            table[row["id"]] = row["text"]
                self.text[name] = table
            elif reader in ("tar_audio_segment", "tar_audio", "lhotse_audio"):
                specs = {}
                if path.endswith(".jsonl") and "audio1" in os.path.basename(path):
                    with open(path, encoding="utf-8") as f:
                        for line in f:
                            if line.strip():
                                row = json.loads(line)
                                specs[row["id"]] = row
                else:  # plain index: every member is its own sample
                    shard_dir = str(Path(path).resolve().parent)
                    tr = self._tar_reader(shard_dir)
                    for k in tr.keys():
                        specs[k] = {"key": k, "index": path}
                self.audio_specs[name] = specs
            else:
                raise ValueError(f"standalone loader: unknown reader {reader!r}")

    def _tar_reader(self, shard_dir: str) -> TarByteReader:
        if shard_dir not in self._tar_readers:
            self._tar_readers[shard_dir] = TarByteReader(shard_dir)
        return self._tar_readers[shard_dir]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, sid: str) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for name, table in self.text.items():
            if sid in table:
                out[name] = table[sid]
        for name, specs in self.audio_specs.items():
            if sid in specs:
                spec = specs[sid]
                shard_dir = str(Path(spec["index"]).resolve().parent)
                out[name] = self._tar_reader(shard_dir).read_audio(
                    spec["key"], spec.get("start") or None, spec.get("duration") or None
                )
        return out


def _write_wav(path: str, audio: np.ndarray, sr: int) -> None:
    pcm = np.clip(audio.T * 32767.0, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(audio.shape[0])
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--manifest", help="stage-1 {prefix}.manifest.jsonl")
    src.add_argument("--dataset", help="stage-2 dataset_{task}_{name}.json")
    p.add_argument("--list", action="store_true", help="print sample ids")
    p.add_argument("--id", help="sample id to fetch")
    p.add_argument("--out", help="write the sample's audio to this wav path")
    args = p.parse_args(argv)

    if args.manifest:
        m = StandaloneManifest(args.manifest)
        if args.list:
            for k in m.keys():
                print(k)
        if args.id:
            row = m[args.id]
            print(json.dumps({k: v for k, v in row.items() if k != "audio"},
                             ensure_ascii=False))
            if args.out:
                audio, sr = m.read_audio(args.id)
                _write_wav(args.out, audio, sr)
                print(f"wrote {args.out} ({audio.shape[1] / sr:.2f}s @ {sr} Hz)")
    else:
        d = StandaloneDataset(args.dataset)
        if args.list:
            for k in d.samples:
                print(k)
        if args.id:
            sample = d[args.id]
            for name, val in sample.items():
                if isinstance(val, tuple):
                    audio, sr = val
                    print(f"{name}: audio {audio.shape} @ {sr} Hz")
                    if args.out:
                        _write_wav(args.out, audio, sr)
                        print(f"wrote {args.out}")
                else:
                    print(f"{name}: {val}")


if __name__ == "__main__":
    main()
