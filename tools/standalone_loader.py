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


AUDIO_FORMATS_BYTE_SEEKABLE = {"wav"}


def get_format_from_path(path: str) -> str:
    """File extension → format string (reference standalone_loader.py:71)."""
    return Path(str(path)).suffix.lstrip(".").lower() or "wav"


def is_byte_seekable_format(format_str: str) -> bool:
    """PCM WAV permits exact byte-range reads; compressed formats need a
    full-file decode (reference standalone_loader.py:65-69)."""
    return format_str.lower() in AUDIO_FORMATS_BYTE_SEEKABLE


class VirtualFileSection:
    """File-like view of a byte range inside a larger file — lets the
    stdlib ``wave`` reader (or a gated soundfile) decode ONE tar member
    without copying it out (reference standalone_loader.py:104-165)."""

    def __init__(self, file_obj, start_offset: int, length: int):
        self._f = file_obj
        self._start = start_offset
        self._len = length
        self._pos = 0

    def read(self, size: int = -1) -> bytes:
        remaining = self._len - self._pos
        n = remaining if size is None or size < 0 else min(size, remaining)
        if n <= 0:
            return b""
        self._f.seek(self._start + self._pos)
        data = self._f.read(n)
        self._pos += len(data)
        return data

    def seek(self, offset: int, whence: int = os.SEEK_SET) -> int:
        if whence == os.SEEK_SET:
            self._pos = offset
        elif whence == os.SEEK_CUR:
            self._pos += offset
        elif whence == os.SEEK_END:
            self._pos = self._len + offset
        else:
            raise ValueError(f"bad whence {whence}")
        self._pos = max(0, min(self._pos, self._len))
        return self._pos

    def tell(self) -> int:
        return self._pos

    def flush(self):
        pass

    def close(self):
        pass


def _linear_resample(audio: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    """Dependency-free linear resample [C, T] → [C, T'] (the in-package
    polyphase resampler is higher quality; this keeps the standalone
    contract numpy-only, matching the reference's lightweight path)."""
    if sr == target_sr:
        return audio
    c, t = audio.shape
    t_new = int(round(t * target_sr / sr))
    xp = np.arange(t, dtype=np.float64)
    xq = np.linspace(0.0, t - 1, t_new)
    return np.stack([np.interp(xq, xp, audio[i]) for i in range(c)]).astype(
        audio.dtype
    )


class SimpleAudioLoader:
    """Reference ``SimpleAudioLoader`` parity (standalone_loader.py:167-770):
    consume manifest rows' ``audio`` dicts directly, with

    - storage backends: ``tarball_lustre`` (byte-seek reads out of local
      tar shards — the first-class in-image path), ``lustre`` (plain
      local files), and ``tarball_s3`` / ``s3`` (byte-range GETs, GATED
      on boto3 — zero egress in this image),
    - ``random_crop_sample_size``: seeded random crop to a fixed sample
      count at the TARGET rate (reference ``_get_frames_to_read``
      semantics, :222-273 — crops only when the clip is longer),
    - single AND multi-audio entries (``audio`` dict vs list,
      ``is_multi_audio`` flag — :668-725),
    - optional resampling to ``sampling_rate``.

    ``shard_dir`` resolves relative ``tar_path`` members.
    """

    def __init__(
        self,
        sampling_rate: Optional[int] = None,
        seed: int = 42,
        storage_backend: str = "tarball_lustre",
        random_crop_sample_size: Optional[int] = None,
        shard_dir: Optional[str] = None,
        s3_client_config: Optional[Dict[str, Any]] = None,
    ):
        self.sampling_rate = sampling_rate
        self.storage_backend = storage_backend
        self.random_crop_sample_size = random_crop_sample_size
        self.shard_dir = shard_dir
        self.rng = np.random.RandomState(seed)
        self._files: Dict[str, Any] = {}
        self._s3 = None
        self._s3_cfg = s3_client_config or {}

    # -- reference _get_frames_to_read:222-273, exact semantics ---------
    def _get_frames_to_read(
        self,
        original_samplerate: int,
        duration_sec: float,
        offset_sec: float = 0.0,
    ) -> Tuple[int, int]:
        if self.random_crop_sample_size is None:
            start = int(offset_sec * original_samplerate)
            frames = (
                int(duration_sec * original_samplerate)
                if duration_sec is not None
                else -1
            )
            return start, frames
        target_sr = self.sampling_rate or original_samplerate
        total = int(duration_sec * original_samplerate)
        target = int(
            self.random_crop_sample_size * original_samplerate / target_sr
        )
        start = int(offset_sec * original_samplerate)
        if total > target:
            start += int(self.rng.randint(0, total - target))
            return start, target
        return start, total

    def _open(self, path: str):
        f = self._files.get(path)
        if f is None:
            f = self._files[path] = open(path, "rb")
        return f

    def _tar_member_section(self, audio: Dict[str, Any]) -> VirtualFileSection:
        tar_path = audio["tar_path"]
        if self.shard_dir and not os.path.isabs(tar_path):
            tar_path = os.path.join(self.shard_dir, tar_path)
        return VirtualFileSection(
            self._open(tar_path), audio["data_offset"], audio["data_size"]
        )

    def _decode_wav_section(
        self, section, audio: Dict[str, Any]
    ) -> np.ndarray:
        with wave.open(section, "rb") as w:
            sr = w.getframerate()
            ch = w.getnchannels()
            if w.getsampwidth() != 2:
                raise ValueError("standalone loader reads PCM16 wavs")
            total_sec = w.getnframes() / sr
            dur = audio.get("duration")
            start, frames = self._get_frames_to_read(
                sr,
                dur if dur is not None else total_sec,
                audio.get("offset", 0.0) or 0.0,
            )
            w.setpos(min(start, w.getnframes()))
            if frames < 0:
                frames = w.getnframes() - w.tell()
            raw = w.readframes(frames)
        arr = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
        arr = arr.reshape(-1, ch).T
        if self.sampling_rate and sr != self.sampling_rate:
            arr = _linear_resample(arr, sr, self.sampling_rate)
        return arr

    def _init_s3(self):
        if self._s3 is None:
            import boto3  # gated: zero egress in-image

            self._s3 = boto3.client("s3", **self._s3_cfg)

    def _load_tarball_s3(self, audio: Dict[str, Any]) -> np.ndarray:
        """Byte-range GET of one member out of a tar on S3 (reference
        :418-505): Range covers [data_offset, data_offset+data_size)."""
        self._init_s3()
        _, _, bucket, key = str(audio["tar_path"]).split("/", 3)
        lo = audio["data_offset"]
        hi = lo + audio["data_size"] - 1
        body = self._s3.get_object(
            Bucket=bucket, Key=key, Range=f"bytes={lo}-{hi}"
        )["Body"].read()
        return self._decode_wav_section(io.BytesIO(body), audio)

    def _load_local(self, audio: Dict[str, Any]) -> np.ndarray:
        path = audio["path"]
        fmt = get_format_from_path(path)
        if is_byte_seekable_format(fmt):
            with open(path, "rb") as f:
                section = VirtualFileSection(f, 0, os.path.getsize(path))
                return self._decode_wav_section(section, audio)
        import soundfile as sf  # gated: compressed formats (:587-665)

        data, sr = sf.read(path, always_2d=True, dtype="float32")
        arr = data.T
        off = audio.get("offset", 0.0) or 0.0
        dur = audio.get("duration")
        start, frames = self._get_frames_to_read(
            sr, dur if dur is not None else arr.shape[1] / sr, off
        )
        arr = arr[:, start : start + frames if frames >= 0 else None]
        if self.sampling_rate and sr != self.sampling_rate:
            arr = _linear_resample(arr, sr, self.sampling_rate)
        return arr

    def _load_audio_dict(self, audio: Dict[str, Any]) -> np.ndarray:
        be = self.storage_backend
        if be == "tarball_lustre":
            return self._decode_wav_section(
                self._tar_member_section(audio), audio
            )
        if be == "tarball_s3":
            return self._load_tarball_s3(audio)
        if be == "lustre":
            return self._load_local(audio)
        if be == "s3":
            self._init_s3()
            _, _, bucket, key = str(audio["path"]).split("/", 3)
            body = self._s3.get_object(Bucket=bucket, Key=key)["Body"].read()
            return self._decode_wav_section(io.BytesIO(body), audio)
        raise ValueError(f"Unknown storage_backend: {be!r}")

    def load_audio(self, example: Dict[str, Any]) -> Dict[str, Any]:
        """manifest row → {"wav": [C, T] | [arrays...], "is_multi_audio"}
        (reference :668-725; the flag falls back to isinstance-list)."""
        audio = example["audio"]
        multi = example.get("is_multi_audio", isinstance(audio, list))
        if multi:
            audio_list = audio if isinstance(audio, list) else [audio]
            wavs = [self._load_audio_dict(a) for a in audio_list]
            return {
                "wav": wavs,
                "is_multi_audio": True,
                "num_audios": len(wavs),
            }
        return {"wav": self._load_audio_dict(audio), "is_multi_audio": False}

    def close(self):
        for f in self._files.values():
            f.close()
        self._files.clear()


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
