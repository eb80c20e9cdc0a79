"""Offline ETL: raw audio/caption/conversation data → tar shards →
UALM-consumable dataset manifests + length stats.

Capability parity with the reference's data-prep tool suite:

- ``create_manifest_pipeline`` ↔ UALM/tools/object_storage_manifest/
  create_manifest.py (entry loading :913-1040, AudioInfo metadata with
  byte data_offset :62-80, tar sharding with multiprocessing + resume
  :1261-1418, manifest/stats/index writing :1419-1689).
- ``convert_shard_manifest_to_ualm`` ↔ UALM/tools/
  tar_to_ualm_manifest_converter/convert_tar_to_ualm_manifest.py
  (length estimation :160-204, unified entries :206-264, audio-only
  segmentation :266-306, output writing :381-452).
- ``convert_text_jsonl_to_ualm`` ↔ convert_text_only_jsonl_to_ualm_
  manifest.py (text/conversation jsonl → text_only manifests).

Design differences (TPU repo idioms, not a port): outputs feed this
repo's ``SingleDataset`` JSON contract (data/datasets.py) and
``DataIteratorFactory`` stats files directly; the metadata index is
jsonl + sqlite (no lmdb in-image); token counting uses an injectable
callable (HF tokenizer when available, whitespace heuristic otherwise)
so the ETL works offline.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

from audio_intelligence_tpu.data.tarshard import (
    AudioInfo,
    create_tar_shards,
    wav_header_info,
)

# ---------------------------------------------------------------------------
# entry loading (create_manifest.py ManifestLoader:913-1040)
# ---------------------------------------------------------------------------


def load_entries(
    input_path: str,
    location_key: str = "location",
    caption_key: str = "text",
    conversation_key: str = "conversations",
) -> List[Dict[str, Any]]:
    """Normalize input records to {id?, location, caption?, conversations?,
    start?, duration?} dicts from jsonl / json-array / txt-filelist / dir."""
    p = Path(input_path)
    entries: List[Dict[str, Any]] = []

    def norm(raw: Dict[str, Any]) -> Dict[str, Any]:
        e: Dict[str, Any] = {"location": raw.get(location_key)}
        if raw.get("id") is not None:
            e["id"] = str(raw["id"])
        if raw.get(caption_key) is not None:
            e["caption"] = raw[caption_key]
        elif raw.get("caption") is not None:
            e["caption"] = raw["caption"]
        if raw.get(conversation_key) is not None:
            e["conversations"] = raw[conversation_key]
        for k in ("start", "duration", "end"):
            if raw.get(k) is not None:
                e[k] = float(raw[k])
        if "end" in e:  # start/end → start/duration (AudioSegment:96-150)
            e["duration"] = e.pop("end") - e.get("start", 0.0)
        return e

    if p.is_dir():
        for wav in sorted(p.rglob("*.wav")):
            entries.append({"location": str(wav)})
    elif p.suffix == ".jsonl":
        with open(p, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line:
                    entries.append(norm(json.loads(line)))
    elif p.suffix == ".json":
        with open(p, encoding="utf-8") as f:
            data = json.load(f)
        entries.extend(norm(r) for r in data)
    else:  # txt filelist: path[<TAB>caption]
        with open(p, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                if "\t" in line:
                    loc, cap = line.split("\t", 1)
                    entries.append({"location": loc, "caption": cap})
                else:
                    entries.append({"location": line})
    return entries


# ---------------------------------------------------------------------------
# stage 1: shard + per-entry manifest (create_manifest.py pipeline)
# ---------------------------------------------------------------------------


def create_manifest_pipeline(
    entries: List[Dict[str, Any]],
    out_dir: str,
    prefix: str = "shard",
    shard_size: int = 512,
    num_workers: int = 0,
    resume: bool = False,
    audio_source_dir: Optional[str] = None,
) -> Dict[str, Any]:
    """Shard audio into tars and write the per-entry NDJSON manifest.

    Outputs under ``out_dir``:
    - ``{prefix}_{i:05d}.tar`` + ``.index.jsonl`` + ``{prefix}.sqlite``
      (byte-offset member indexes, via create_tar_shards),
    - ``{prefix}.manifest.jsonl`` — one row per entry:
      ``{"id", "audio": {AudioInfo fields + offset/duration}, "text": {...}}``,
    - ``{prefix}.manifest.json`` — summary index: shard list, counts,
      duration stats (write_index_file / ManifestStatistics analogue).

    Returns the summary dict.
    """
    os.makedirs(out_dir, exist_ok=True)
    files: List[Tuple[str, str]] = []
    seen: Dict[str, int] = {}
    resolved: List[Dict[str, Any]] = []
    skipped = 0
    for e in entries:
        loc = e.get("location")
        if not loc:
            skipped += 1
            continue
        path = (
            os.path.join(audio_source_dir, loc)
            if audio_source_dir and not os.path.isabs(loc)
            else loc
        )
        if not os.path.exists(path):
            skipped += 1
            continue
        key = e.get("id") or Path(path).stem
        # duplicate ids get a numeric suffix (tar member names must be unique)
        if key in seen:
            seen[key] += 1
            key = f"{key}#{seen[key]}"
        else:
            seen[key] = 0
        e = dict(e, id=key, _path=path)
        resolved.append(e)
        files.append((key, path))

    # files enter the tar once even when several entries reference
    # sub-segments of the same wav
    uniq: Dict[str, str] = {}
    for key, path in files:
        uniq.setdefault(key, path)
    idx_paths = create_tar_shards(
        sorted(uniq.items()),
        out_dir,
        shard_size=shard_size,
        prefix=prefix,
        num_workers=num_workers,
        resume=resume,
    )

    by_key: Dict[str, AudioInfo] = {}
    for idx_path in idx_paths:
        with open(idx_path) as f:
            for line in f:
                if line.strip():
                    info = AudioInfo.from_json(line)
                    by_key[info.key] = info

    manifest_path = os.path.join(out_dir, f"{prefix}.manifest.jsonl")
    total_dur = 0.0
    durations: List[float] = []
    with open(manifest_path, "w", encoding="utf-8") as mf:
        for e in resolved:
            info = by_key[e["id"]]
            dur = e.get("duration") or info.duration
            audio = dict(info.__dict__)
            audio["offset"] = e.get("start", 0.0)
            audio["duration"] = dur
            text = {
                k: e[k] for k in ("caption", "conversations") if e.get(k) is not None
            }
            mf.write(
                json.dumps(
                    {"id": e["id"], "audio": audio, "text": text},
                    ensure_ascii=False,
                )
                + "\n"
            )
            total_dur += dur
            durations.append(dur)

    summary = {
        "prefix": prefix,
        "num_entries": len(resolved),
        "num_skipped": skipped,
        "num_shards": len(idx_paths),
        "shards": [os.path.basename(p).replace(".index.jsonl", ".tar") for p in idx_paths],
        "manifest": os.path.basename(manifest_path),
        "sqlite_index": f"{prefix}.sqlite",
        "total_duration_s": round(total_dur, 3),
        "duration_stats": _stats(durations),
    }
    with open(os.path.join(out_dir, f"{prefix}.manifest.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary


def _stats(xs: List[float]) -> Dict[str, float]:
    if not xs:
        return {}
    xs = sorted(xs)
    n = len(xs)
    return {
        "min": round(xs[0], 3),
        "max": round(xs[-1], 3),
        "mean": round(sum(xs) / n, 3),
        "p50": round(xs[n // 2], 3),
    }


# ---------------------------------------------------------------------------
# stage 2: shard manifest → UALM dataset json + stats
# ---------------------------------------------------------------------------


def whitespace_token_count(text: str) -> int:
    """Offline token-count heuristic: ~1 token per whitespace word plus one
    per 4 chars of the longest word-free run (used when no HF tokenizer is
    available; the converter's contract only needs a batching-grade length
    estimate)."""
    if not text:
        return 0
    words = text.split()
    return max(1, len(words) + sum(max(0, len(w) - 8) // 4 for w in words))


def make_token_counter(tokenizer_name: Optional[str]) -> Callable[[str], int]:
    """HF tokenizer when importable/downloadable, heuristic otherwise
    (convert_tar_to_ualm_manifest.py TokenizerWrapper:147-154)."""
    if tokenizer_name:
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(tokenizer_name)
            return lambda s: len(tok.encode(s, add_special_tokens=False))
        except Exception:
            pass
    return whitespace_token_count


def estimate_length(
    messages: List[Tuple[str, str, Any]],
    count_tokens: Callable[[str], int],
    audio_fps: float,
) -> int:
    """Token-length estimate for bucketing: 1 (<bos>) + per message
    3 overhead (<role><modality><eot>) + text tokens or duration·fps
    (convert_tar_to_ualm_manifest.py calculate_length:160-204)."""
    total = 1
    for _role, modality, content in messages:
        total += 3
        if modality == "audio":
            total += int(float(content) * audio_fps)  # content = duration (s)
        else:
            total += count_tokens(str(content))
    return total


def generate_segments(
    duration: float, seg_max: float, seg_min: float
) -> List[Tuple[float, float, int]]:
    """Non-overlapping (offset, duration, index) windows for audio-only
    entries; tail kept when ≥ seg_min (generate_segments:266-306)."""
    if seg_max <= 0 or duration <= 0:
        return []
    out = []
    n_full = int(duration // seg_max)
    for i in range(n_full):
        out.append((i * seg_max, seg_max, i))
    rem = duration - n_full * seg_max
    if rem >= seg_min:
        out.append((n_full * seg_max, rem, n_full))
    return out


@dataclass
class ConvertConfig:
    """One dataset's conversion config (DatasetConfig:86-104)."""

    name: str
    manifest: str  # path to {prefix}.manifest.jsonl from stage 1
    task: str = "caption_to_audio"
    factor: float = 1.0
    audio_fps: float = 50.0
    instruction: str = "Describe the audio."
    prompt: str = "Generate audio matching the description."
    segment_duration_max: float = 0.0  # audio_only segmentation
    segment_duration_min: float = 1.0
    tokenizer: Optional[str] = None


def convert_shard_manifest_to_ualm(
    cfg: ConvertConfig, out_dir: str
) -> Dict[str, Any]:
    """Convert a stage-1 shard manifest into UALM training inputs.

    Writes under ``out_dir``:
    - ``text1_{name}.jsonl`` (+ ``text2_{name}.jsonl`` for understanding
      tasks) — TextReader files,
    - ``audio1_{name}.jsonl`` — tar_audio_segment reader rows
      ``{"id","key","index","start","duration"}``,
    - ``dataset_{task}_{name}.json`` — SingleDataset manifest whose entry
      names match UALM_TASK_CONFIGS for the task,
    - ``stats_{task}_{name}.jsonl`` — per-sample token lengths for
      DataIteratorFactory/batchfy.

    Returns {"specifier": "task:name:json:factor", ...} summary.
    """
    os.makedirs(out_dir, exist_ok=True)
    task = cfg.task
    from audio_intelligence_tpu.models.ualm.preprocessor import UALM_TASK_CONFIGS

    if task not in UALM_TASK_CONFIGS:
        raise ValueError(f"unknown task {task!r}: {list(UALM_TASK_CONFIGS)}")
    template = UALM_TASK_CONFIGS[task]
    entry_names = [entry for _role, entry in template]
    count_tokens = make_token_counter(cfg.tokenizer)

    manifest_dir = str(Path(cfg.manifest).resolve().parent)
    index_path = None
    # the sqlite index sits beside the manifest (stage-1 layout)
    for f in os.listdir(manifest_dir):
        if f.endswith(".sqlite"):
            index_path = os.path.join(manifest_dir, f)
            break
    if index_path is None:
        raise FileNotFoundError(f"no .sqlite tar index beside {cfg.manifest}")

    rows = []
    with open(cfg.manifest, encoding="utf-8") as f:
        for line in f:
            if line.strip():
                rows.append(json.loads(line))

    text1: Dict[str, str] = {}
    text2: Dict[str, str] = {}
    audio1: Dict[str, Dict[str, Any]] = {}
    lengths: Dict[str, int] = {}
    n_segmented = 0

    for row in rows:
        caption = row.get("text", {}).get("caption") or ""
        audio = row.get("audio") or {}
        duration = float(audio.get("duration") or 0.0)
        base_offset = float(audio.get("offset") or 0.0)

        def add_sample(sid: str, offset: float, dur: float):
            msgs: List[Tuple[str, str, Any]] = []
            for role, entry in template:
                if entry.startswith("audio"):
                    msgs.append((role, "audio", dur))
                    audio1[sid] = {
                        "key": row["id"],
                        "index": index_path,
                        "start": offset,
                        "duration": dur,
                    }
                elif entry == "text1":
                    if task in ("caption_to_audio", "transcription_to_speech"):
                        t1 = caption or cfg.prompt
                    elif task == "audio_only":
                        t1 = cfg.prompt
                    else:
                        t1 = cfg.instruction
                    msgs.append((role, "text", t1))
                    text1[sid] = t1
                else:  # text2 — the target text
                    msgs.append((role, "text", caption))
                    text2[sid] = caption
            lengths[sid] = estimate_length(msgs, count_tokens, cfg.audio_fps)

        segs = (
            generate_segments(
                duration, cfg.segment_duration_max, cfg.segment_duration_min
            )
            if task == "audio_only"
            else []
        )
        if segs:
            n_segmented += 1
            for off, dur, i in segs:
                add_sample(f"{row['id']}__seg{i}", base_offset + off, dur)
        else:
            add_sample(row["id"], base_offset, duration)

    # reader files
    data_entry = []
    name = cfg.name

    def write_text(entry: str, data: Dict[str, str]):
        path = os.path.join(out_dir, f"{entry}_{name}.jsonl")
        with open(path, "w", encoding="utf-8") as f:
            for k, v in data.items():
                f.write(json.dumps({"id": k, "text": v}, ensure_ascii=False) + "\n")
        data_entry.append({"name": entry, "path": path, "reader": "text"})

    if text1:
        write_text("text1", text1)
    if text2 and "text2" in entry_names:
        write_text("text2", text2)
    if audio1 and "audio1" in entry_names:
        path = os.path.join(out_dir, f"audio1_{name}.jsonl")
        with open(path, "w", encoding="utf-8") as f:
            for k, v in audio1.items():
                f.write(json.dumps(dict(v, id=k)) + "\n")
        data_entry.append({"name": "audio1", "path": path, "reader": "tar_audio_segment"})

    samples = sorted(lengths)
    ds_json = os.path.join(out_dir, f"dataset_{task}_{name}.json")
    with open(ds_json, "w", encoding="utf-8") as f:
        json.dump({"data_entry": data_entry, "samples": samples}, f, indent=2)

    from audio_intelligence_tpu.data.ualm_iterator import write_stats_file

    stats_path = os.path.join(out_dir, f"stats_{task}_{name}.jsonl")
    write_stats_file(stats_path, lengths)

    spec = f"{task}:{name}:{ds_json}"
    if cfg.factor != 1.0:
        spec += f":{cfg.factor}"
    return {
        "specifier": spec,
        "dataset_json": ds_json,
        "stats": stats_path,
        "num_samples": len(samples),
        "num_segmented_sources": n_segmented,
    }


def convert_text_jsonl_to_ualm(
    jsonl_path: str,
    out_dir: str,
    name: str,
    text_key: str = "text",
    response_key: str = "response",
    tokenizer: Optional[str] = None,
    factor: float = 1.0,
) -> Dict[str, Any]:
    """Text-only jsonl → text_only UALM manifest + stats
    (convert_text_only_jsonl_to_ualm_manifest.py).

    Rows: {"text": prompt, "response": answer} or {"conversations":
    [{"from","value"}, ...]} (human/gpt alternation; the first human turn
    becomes text1, the first gpt turn text2).
    """
    os.makedirs(out_dir, exist_ok=True)
    count_tokens = make_token_counter(tokenizer)
    text1: Dict[str, str] = {}
    text2: Dict[str, str] = {}
    lengths: Dict[str, int] = {}
    with open(jsonl_path, encoding="utf-8") as f:
        for i, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            sid = str(row.get("id", i))
            if row.get("conversations"):
                human = next(
                    (m["value"] for m in row["conversations"] if m.get("from") == "human"),
                    "",
                )
                gpt = next(
                    (m["value"] for m in row["conversations"] if m.get("from") == "gpt"),
                    "",
                )
            else:
                human = row.get(text_key) or ""
                gpt = row.get(response_key) or ""
            if not human and not gpt:
                continue
            text1[sid] = human
            text2[sid] = gpt
            lengths[sid] = estimate_length(
                [("user", "text", human), ("assistant", "text", gpt)],
                count_tokens,
                audio_fps=0.0,
            )

    data_entry = []
    for entry, data in (("text1", text1), ("text2", text2)):
        path = os.path.join(out_dir, f"{entry}_{name}.jsonl")
        with open(path, "w", encoding="utf-8") as f:
            for k, v in data.items():
                f.write(json.dumps({"id": k, "text": v}, ensure_ascii=False) + "\n")
        data_entry.append({"name": entry, "path": path, "reader": "text"})

    samples = sorted(lengths)
    ds_json = os.path.join(out_dir, f"dataset_text_only_{name}.json")
    with open(ds_json, "w", encoding="utf-8") as f:
        json.dump({"data_entry": data_entry, "samples": samples}, f, indent=2)

    from audio_intelligence_tpu.data.ualm_iterator import write_stats_file

    stats_path = os.path.join(out_dir, f"stats_text_only_{name}.jsonl")
    write_stats_file(stats_path, lengths)

    spec = f"text_only:{name}:{ds_json}"
    if factor != 1.0:
        spec += f":{factor}"
    return {
        "specifier": spec,
        "dataset_json": ds_json,
        "stats": stats_path,
        "num_samples": len(samples),
    }


# ---------------------------------------------------------------------------
# multi-audio entries, statistics, and audio normalization
# (create_manifest.py _process_multi_audio_entry:691-770,
#  ManifestStatistics:1041-1130, AudioConverter:399-553)
# ---------------------------------------------------------------------------


def expand_multi_audio_entries(entries: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """Normalize multi-audio entries (the reference's
    ``_process_multi_audio_entry``): an entry whose ``location`` is a list,
    or that carries an ``audios`` list of {location, start?, duration?},
    becomes one logical entry with ``_audios`` (ordered clip specs) plus a
    synthetic per-clip id ``{id}__a{i}``. Single-audio entries pass
    through unchanged."""
    out: List[Dict[str, Any]] = []
    for e in entries:
        loc = e.get("location")
        audios = e.get("audios")
        if audios is None and isinstance(loc, (list, tuple)):
            audios = [{"location": l} for l in loc]
        if audios is None:
            out.append(e)
            continue
        base = e.get("id") or (
            Path(str(audios[0].get("location", "x"))).stem if audios else "x"
        )
        specs = []
        for i, a in enumerate(audios):
            specs.append(
                {
                    "id": f"{base}__a{i}",
                    "location": a.get("location"),
                    "start": a.get("start", 0.0),
                    "duration": a.get("duration"),
                }
            )
        norm = {k: v for k, v in e.items() if k not in ("audios", "location")}
        norm["id"] = base
        norm["_audios"] = specs
        out.append(norm)
    return out


def create_multi_audio_manifest(
    entries: List[Dict[str, Any]],
    out_dir: str,
    prefix: str = "shard",
    shard_size: int = 512,
    num_workers: int = 0,
    resume: bool = False,
    audio_source_dir: Optional[str] = None,
) -> Dict[str, Any]:
    """Multi-audio variant of ``create_manifest_pipeline``: every clip of
    every entry lands in the tar shards, and each manifest row carries an
    ``audio`` LIST (ManifestEntry.get_audio_list:186-191) so dialogue-
    style datasets with several clips per example round-trip."""
    expanded = expand_multi_audio_entries(entries)
    flat: List[Dict[str, Any]] = []
    groups: List[Tuple[Dict[str, Any], List[str]]] = []
    for e in expanded:
        specs = e.get("_audios")
        if specs is None:
            flat.append(e)
            groups.append((e, [e.get("id") or Path(str(e["location"])).stem]))
            continue
        ids = []
        for s in specs:
            flat.append(dict(s))
            ids.append(s["id"])
        groups.append((e, ids))

    summary = create_manifest_pipeline(
        flat, out_dir, prefix=prefix, shard_size=shard_size,
        num_workers=num_workers, resume=resume,
        audio_source_dir=audio_source_dir,
    )

    # regroup the flat rows into multi-audio manifest rows
    rows = {}
    flat_manifest = os.path.join(out_dir, f"{prefix}.manifest.jsonl")
    with open(flat_manifest) as f:
        for line in f:
            if line.strip():
                r = json.loads(line)
                rows[r["id"]] = r
    multi_path = os.path.join(out_dir, f"{prefix}.multi.manifest.jsonl")
    n = 0
    with open(multi_path, "w", encoding="utf-8") as mf:
        for e, ids in groups:
            audio_list = [rows[i]["audio"] for i in ids if i in rows]
            if not audio_list:
                continue
            text = {
                k: e[k] for k in ("caption", "conversations") if e.get(k) is not None
            }
            mf.write(
                json.dumps(
                    {"id": e.get("id") or ids[0], "audio": audio_list, "text": text},
                    ensure_ascii=False,
                )
                + "\n"
            )
            n += 1
    summary["multi_manifest"] = os.path.basename(multi_path)
    summary["num_multi_entries"] = n
    return summary


def manifest_statistics(manifest_path: str) -> Dict[str, Any]:
    """Dataset statistics report over a manifest
    (ManifestStatistics.calculate:1041-1130): entry/clip counts, total
    and per-clip duration stats, sample-rate / channel / encoding
    histograms, and text presence counts."""
    durations: List[float] = []
    sr_hist: Dict[int, int] = {}
    ch_hist: Dict[int, int] = {}
    enc_hist: Dict[str, int] = {}
    n_entries = n_clips = n_caption = n_conv = 0
    with open(manifest_path) as f:
        for line in f:
            if not line.strip():
                continue
            r = json.loads(line)
            n_entries += 1
            audios = r.get("audio")
            if isinstance(audios, dict):
                audios = [audios]
            for a in audios or []:
                n_clips += 1
                if a.get("duration"):
                    durations.append(float(a["duration"]))
                if a.get("sample_rate"):
                    sr_hist[int(a["sample_rate"])] = sr_hist.get(int(a["sample_rate"]), 0) + 1
                if a.get("channels"):
                    ch_hist[int(a["channels"])] = ch_hist.get(int(a["channels"]), 0) + 1
                if a.get("encoding"):
                    enc_hist[str(a["encoding"])] = enc_hist.get(str(a["encoding"]), 0) + 1
            text = r.get("text") or {}
            n_caption += int(text.get("caption") is not None)
            n_conv += int(text.get("conversations") is not None)
    return {
        "num_entries": n_entries,
        "num_clips": n_clips,
        "total_duration_s": round(sum(durations), 3),
        "duration_stats": _stats(durations),
        "sample_rate_hist": sr_hist,
        "channels_hist": ch_hist,
        "encoding_hist": enc_hist,
        "num_with_caption": n_caption,
        "num_with_conversations": n_conv,
    }


def normalize_wav_batch(
    paths: List[str],
    out_dir: str,
    target_sr: int = 44100,
    mono: bool = True,
    num_workers: int = 0,
) -> List[str]:
    """Audio normalization pass (AudioConverter.convert_batch:420-497):
    decode → optional downmix → polyphase resample → wav out. WAV/PCM in
    this image (no ffmpeg/soundfile; compressed inputs raise with a clear
    message — the reference shells out to ffmpeg there)."""
    from audio_intelligence_tpu.data.audio_io import read_wav, write_wav
    from audio_intelligence_tpu.data.native import resample as resample_poly

    os.makedirs(out_dir, exist_ok=True)

    def one(path: str) -> str:
        if not path.lower().endswith(".wav"):
            raise ValueError(
                f"{path}: only PCM wav is decodable in-image "
                "(the reference transcodes via ffmpeg/sox)"
            )
        wav, sr = read_wav(path)
        import numpy as np

        wav = np.atleast_2d(np.asarray(wav, dtype=np.float32))
        if mono and wav.shape[0] > 1:
            wav = wav.mean(axis=0, keepdims=True)
        if sr != target_sr:
            wav = resample_poly(wav, sr, target_sr)
        out = os.path.join(out_dir, Path(path).stem + ".wav")
        write_wav(out, target_sr, wav[0] if mono else wav)
        return out

    if num_workers and num_workers > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(num_workers) as ex:
            return list(ex.map(one, paths))
    return [one(p) for p in paths]


# ---------------------------------------------------------------------------
# subset manifests (create_subset_manifest.py:60-330 semantics)
# ---------------------------------------------------------------------------


def load_filter_entries(input_path: str) -> Dict[str, List[Dict[str, Any]]]:
    """Load a filter manifest (.json/.jsonl file or a directory of them)
    into {audio-file key → [raw entries]} (FilterLoader.load:60-137).
    Keys are matched on the audio location's stem — the same key the
    shard pipeline derives tar member ids from — with multi-audio
    entries keyed by their FIRST clip (reference _extract_key)."""
    paths: List[str] = []
    if os.path.isfile(input_path):
        paths = [input_path]
    elif os.path.isdir(input_path):
        for pat in ("**/*.jsonl", "**/*.json"):
            paths.extend(
                str(p) for p in Path(input_path).glob(pat)
            )
    table: Dict[str, List[Dict[str, Any]]] = {}
    for fp in sorted(paths):
        with open(fp, encoding="utf-8") as f:
            head = f.read(1)
            f.seek(0)
            rows = (
                json.load(f)
                if head == "["
                else [json.loads(l) for l in f if l.strip()]
            )
        for e in rows:
            loc = e.get("location")
            if isinstance(loc, (list, tuple)):
                loc = loc[0] if loc else None
            if not loc and isinstance(e.get("audio"), list) and e["audio"]:
                loc = e["audio"][0].get("path") or e["audio"][0].get("key")
            elif not loc and isinstance(e.get("audio"), dict):
                loc = e["audio"].get("path") or e["audio"].get("key")
            if not loc and e.get("id"):
                loc = e["id"]
            if loc:
                table.setdefault(Path(str(loc)).stem, []).append(e)
    return table


def create_subset_manifest(
    input_subset_manifest: str,
    source_manifest_dir: str,
    output_dir: str,
    prefix: str = "subset",
    update_metadata: bool = True,
    dataset_name: Optional[str] = None,
) -> Dict[str, Any]:
    """Filter existing SHARDED manifests down to a subset, preserving the
    tarball byte-seek metadata — no audio is copied or re-sharded
    (reference create_subset_manifest.py ShardProcessor semantics).

    - every ``*.manifest.jsonl`` under ``source_manifest_dir`` is matched
      row-by-row against the filter (key = audio stem / entry id),
    - matched rows keep their ``audio`` dict(s) verbatim (tar_path /
      data_offset / data_size stay valid against the ORIGINAL shards),
    - ``update_metadata``: caption/conversations from the filter entry
      replace the source row's text; extra filter keys land under
      ``meta``; ``dataset_name`` stamps every row,
    - outputs ``{prefix}.manifest.jsonl`` + a ``{prefix}.manifest.json``
      summary index (entry/duration statistics).
    """
    flt = load_filter_entries(input_subset_manifest)
    os.makedirs(output_dir, exist_ok=True)
    sources = sorted(Path(source_manifest_dir).glob("*.manifest.jsonl"))
    out_path = os.path.join(output_dir, f"{prefix}.manifest.jsonl")
    n_out, durations = 0, []
    matched_keys: set = set()
    with open(out_path, "w", encoding="utf-8") as out:
        for src in sources:
            with open(src, encoding="utf-8") as f:
                for line in f:
                    if not line.strip():
                        continue
                    row = json.loads(line)
                    audio = row.get("audio")
                    first = audio[0] if isinstance(audio, list) else audio
                    key = Path(str(first.get("key", row.get("id", "")))).stem
                    hits = flt.get(key) or flt.get(str(row.get("id", "")))
                    if not hits:
                        continue
                    matched_keys.add(key)
                    for fe in hits:
                        new = dict(row)
                        if update_metadata:
                            text = dict(new.get("text") or {})
                            for k in ("caption", "conversations"):
                                if fe.get(k) is not None:
                                    text[k] = fe[k]
                            extra = {
                                k: v for k, v in fe.items()
                                if k not in (
                                    "caption", "conversations", "location",
                                    "audio", "id",
                                ) and v is not None
                            }
                            new["text"] = text
                            if extra:
                                new["meta"] = {**new.get("meta", {}), **extra}
                        if dataset_name:
                            new["dataset_name"] = dataset_name
                        out.write(json.dumps(new, ensure_ascii=False) + "\n")
                        n_out += 1
                        a = audio if isinstance(audio, list) else [audio]
                        durations.extend(
                            float(x.get("duration") or 0.0) for x in a
                        )
    summary = {
        "prefix": prefix,
        "source_manifest_dir": str(source_manifest_dir),
        "filter": str(input_subset_manifest),
        "dataset_name": dataset_name,
        "num_entries": n_out,
        "num_filter_keys": len(flt),
        "num_matched_keys": len(matched_keys),
        "num_unmatched_keys": len(set(flt) - matched_keys),
        "total_duration_s": round(sum(durations), 3),
        "duration_stats": _stats(durations),
        "manifest": os.path.basename(out_path),
    }
    with open(os.path.join(output_dir, f"{prefix}.manifest.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary
