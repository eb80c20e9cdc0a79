"""Tar-shard dataset storage: random-access audio from tar archives.

Capability parity with UALM's object-storage tooling
(UALM/dataloader/multimodal_loader/tarball_reader.py:41-342 and
UALM/tools/object_storage_manifest/create_manifest.py): audio files are
packed into tar shards; a metadata index records each member's absolute
**byte offset** so readers fetch samples with a single ``seek`` + bounded
read (S3-range-read friendly), never scanning the archive.

Differences by design: the index is JSONL + optional stdlib sqlite3
(the image has no lmdb); audio decode uses the dependency-free WAV reader
with soundfile as an optional fast path.
"""

from __future__ import annotations

import io
import json
import os
import sqlite3
import tarfile
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np


@dataclass
class AudioInfo:
    """One tar member's metadata (create_manifest.py AudioInfo analogue).

    ``duration`` is stored explicitly (not just derivable) so downstream
    manifest converters can estimate token lengths without touching the
    tar (create_manifest.py:62-80 stores duration/offset metadata the
    same way).
    """

    key: str
    tar_path: str
    data_offset: int  # absolute byte offset of file DATA inside the tar
    data_size: int
    sample_rate: int
    num_samples: int
    num_channels: int
    duration: float = 0.0  # seconds

    def __post_init__(self):
        if not self.duration and self.sample_rate:
            self.duration = self.num_samples / float(self.sample_rate)

    def to_json(self) -> str:
        return json.dumps(self.__dict__)

    @staticmethod
    def from_json(s: str) -> "AudioInfo":
        d = json.loads(s)
        d.setdefault("duration", 0.0)
        return AudioInfo(**d)


def wav_header_info(wav_path: str) -> tuple[int, int, int]:
    """(sample_rate, num_samples, num_channels) from the WAV header only —
    no sample data is read (create_manifest.py:278-290 does the same for
    metadata extraction speed)."""
    import wave

    with wave.open(wav_path, "rb") as w:
        return w.getframerate(), w.getnframes(), w.getnchannels()


def _write_one_shard(job) -> tuple[str, list[str]]:
    """Write one tar shard + its jsonl index. Standalone function so a
    ProcessPoolExecutor can fan shards out across workers."""
    chunk, tar_path, idx_path, resume = job
    tar_name = os.path.basename(tar_path)
    if resume and _shard_is_complete(tar_path, idx_path, len(chunk)):
        with open(idx_path) as f:
            return idx_path, [line.rstrip("\n") for line in f if line.strip()]
    with tarfile.open(tar_path, "w") as tf:
        for key, wav_path in chunk:
            tf.add(wav_path, arcname=key)
    rows: list[str] = []
    with tarfile.open(tar_path, "r") as tf, open(idx_path, "w") as idx:
        for key, wav_path in chunk:
            member = tf.getmember(key)
            sr, n, ch = wav_header_info(wav_path)
            info = AudioInfo(
                key=key,
                tar_path=tar_name,
                data_offset=member.offset_data,
                data_size=member.size,
                sample_rate=sr,
                num_samples=n,
                num_channels=ch,
            )
            row = info.to_json()
            idx.write(row + "\n")
            rows.append(row)
    return idx_path, rows


def _shard_is_complete(tar_path: str, idx_path: str, expected: int) -> bool:
    """A shard is resumable-complete when both files exist and the index
    has exactly one row per member (the index is written last, so a
    crashed run leaves it short or absent)."""
    if not (os.path.exists(tar_path) and os.path.exists(idx_path)):
        return False
    with open(idx_path) as f:
        return sum(1 for line in f if line.strip()) == expected


def create_tar_shards(
    files: list[tuple[str, str]],
    out_dir: str,
    shard_size: int = 512,
    prefix: str = "shard",
    num_workers: int = 0,
    resume: bool = False,
) -> list[str]:
    """Pack (key, wav_path) pairs into tar shards + index files.

    Writes ``{prefix}_{i:05d}.tar`` plus ``{prefix}_{i:05d}.index.jsonl``
    with byte offsets, and a combined sqlite index ``{prefix}.sqlite``.
    Shards are independent, so ``num_workers > 1`` writes them in parallel
    processes; ``resume`` skips shards whose tar + full index already
    exist (create_manifest.py's multiprocessing/resume semantics).
    Returns the list of index paths.
    """
    os.makedirs(out_dir, exist_ok=True)
    jobs = []
    for shard_idx in range(0, len(files), shard_size):
        chunk = files[shard_idx : shard_idx + shard_size]
        tar_name = f"{prefix}_{shard_idx // shard_size:05d}.tar"
        tar_path = os.path.join(out_dir, tar_name)
        idx_path = tar_path.replace(".tar", ".index.jsonl")
        jobs.append((chunk, tar_path, idx_path, resume))

    if num_workers and num_workers > 1 and len(jobs) > 1:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=num_workers) as ex:
            results = list(ex.map(_write_one_shard, jobs))
    else:
        results = [_write_one_shard(j) for j in jobs]

    db_path = os.path.join(out_dir, f"{prefix}.sqlite")
    con = sqlite3.connect(db_path)
    con.execute(
        "CREATE TABLE IF NOT EXISTS audio (key TEXT PRIMARY KEY, meta TEXT)"
    )
    index_paths = []
    for idx_path, rows in results:
        index_paths.append(idx_path)
        for row in rows:
            con.execute(
                "INSERT OR REPLACE INTO audio VALUES (?, ?)",
                (json.loads(row)["key"], row),
            )
    con.commit()
    con.close()
    return index_paths


class TarballMetadataReader:
    """JSONL or sqlite metadata index (tarball_reader.py:41-187)."""

    def __init__(self, index_path: str):
        self.by_key: dict[str, AudioInfo] = {}
        if index_path.endswith(".sqlite"):
            con = sqlite3.connect(index_path)
            for key, meta in con.execute("SELECT key, meta FROM audio"):
                self.by_key[key] = AudioInfo.from_json(meta)
            con.close()
        else:
            with open(index_path) as f:
                for line in f:
                    info = AudioInfo.from_json(line)
                    self.by_key[info.key] = info

    def keys(self):
        return list(self.by_key)

    def __getitem__(self, key) -> AudioInfo:
        return self.by_key[key]


class VirtualFileSection(io.RawIOBase):
    """File-like window into a byte range of a larger file
    (tarball_reader.py:189-223)."""

    def __init__(self, f, offset: int, size: int):
        self._f = f
        self._offset = offset
        self._size = size
        self._pos = 0

    def readable(self):
        return True

    def seekable(self):
        return True

    def seek(self, pos, whence=io.SEEK_SET):
        if whence == io.SEEK_SET:
            self._pos = pos
        elif whence == io.SEEK_CUR:
            self._pos += pos
        elif whence == io.SEEK_END:
            self._pos = self._size + pos
        return self._pos

    def tell(self):
        return self._pos

    def read(self, n=-1):
        if n < 0 or self._pos + n > self._size:
            n = self._size - self._pos
        self._f.seek(self._offset + self._pos)
        data = self._f.read(n)
        self._pos += len(data)
        return data


class TarballAudioReader:
    """Random-access audio reads from tar shards via byte offsets
    (tarball_reader.py:226-342): per-sample seek + bounded read, optional
    (start, duration) sub-segment in seconds, resample on request."""

    def __init__(self, index_path: str, tar_dir: str):
        self.meta = TarballMetadataReader(index_path)
        self.tar_dir = tar_dir
        self._open_files: dict[str, object] = {}

    def keys(self):
        return self.meta.keys()

    def _file(self, tar_name: str):
        if tar_name not in self._open_files:
            self._open_files[tar_name] = open(
                os.path.join(self.tar_dir, tar_name), "rb"
            )
        return self._open_files[tar_name]

    def read(
        self,
        key: str,
        start_sec: float | None = None,
        duration_sec: float | None = None,
        target_sr: int | None = None,
    ) -> tuple[np.ndarray, int]:
        info = self.meta[key]
        f = self._file(info.tar_path)
        section = VirtualFileSection(f, info.data_offset, info.data_size)
        buf = io.BytesIO(section.read())
        import wave

        with wave.open(buf, "rb") as w:
            sr = w.getframerate()
            ch = w.getnchannels()
            width = w.getsampwidth()
            if start_sec is not None:
                w.setpos(min(int(start_sec * sr), w.getnframes()))
            n = (
                int(duration_sec * sr)
                if duration_sec is not None
                else w.getnframes() - w.tell()
            )
            raw = w.readframes(n)
        if width != 2:
            raise ValueError("tar shard reader expects PCM16 wavs")
        audio = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
        audio = audio.reshape(-1, ch).T
        if target_sr is not None and target_sr != sr:
            import jax.numpy as jnp

            from audio_intelligence_tpu.ops.resample import resample

            audio = np.asarray(resample(jnp.asarray(audio), sr, target_sr))
            sr = target_sr
        return audio, sr

    def close(self):
        for f in self._open_files.values():
            f.close()
        self._open_files.clear()


def prefetch_audio(
    reader: "TarballAudioReader",
    keys,
    workers: int = 4,
    depth: int = 16,
):
    """Iterate ``(key, audio [C, T] float32, sample_rate)`` over ``keys``
    using the native threaded prefetcher (data/native.py WavPrefetcher):
    tar-shard byte ranges are pread + PCM16-decoded by C++ worker threads
    with the GIL released, in submission order — the TPU-framework
    equivalent of the reference's ``DataLoader(num_workers=N)`` input
    pipeline (UALM tarball_reader.py:226-342 + torch loader workers)."""
    from audio_intelligence_tpu.data.native import WavPrefetcher

    keys = list(keys)
    jobs = []
    for k in keys:
        info = reader.meta[k]
        jobs.append(
            (os.path.join(reader.tar_dir, info.tar_path),
             info.data_offset, info.data_size)
        )
    pf = WavPrefetcher(jobs, workers=workers, depth=depth)
    try:
        for k, (sr, audio) in zip(keys, pf):
            yield k, audio, sr
    finally:
        pf.close()
