#!/usr/bin/env python
"""Prepare lhotse audio manifests from Kaldi wav.scp (+ optional segments).

Parity with ``UALM/scripts/prepare_audio_lhotse.py``: reads a Kaldi
``wav.scp`` (``<recording_id> <path>`` per line) and an optional
``segments`` file (``<segment_id> <recording_id> <start> <end>``),
extracts per-recording metadata, and writes lhotse's public on-disk
manifest schema — ``recordings.jsonl.gz`` and ``cuts.jsonl.gz`` — into
``--output_dir``. Without segments, one whole-recording cut per
recording (the reference's behavior). Duration statistics print at the
end (print_statistics parity).

The output round-trips through ``data/lhotse_reader.LhotseAudioReader``
(the consumer side of the same contract) and through real lhotse when
installed; metadata extraction uses the shared WAV front-end (no
soundfile in-image — wav only, matching the rest of the ETL suite).

Usage:
  python cli/prepare_audio_lhotse.py --wav_scp data/wav.scp \
      --segments data/segments --output_dir manifests/ --num_jobs 4
"""

from __future__ import annotations

import argparse
import gzip
import json
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _recording_row(rec_id: str, path: str) -> dict | None:
    from audio_intelligence_tpu.data.tarshard import wav_header_info

    try:
        sr, n, ch = wav_header_info(path)
    except Exception as e:
        print(f"WARNING: skipping {rec_id}: {e}", file=sys.stderr)
        return None
    return {
        "id": rec_id,
        "sources": [
            {"type": "file", "channels": list(range(ch)), "source": str(path)}
        ],
        "sampling_rate": int(sr),
        "num_samples": int(n),
        "duration": round(n / sr, 6),
        "channel_ids": list(range(ch)),
    }


def _cut_row(cut_id: str, rec: dict, start: float, duration: float) -> dict:
    chans = rec["channel_ids"]
    return {
        "id": cut_id,
        "start": round(start, 6),
        "duration": round(duration, 6),
        "channel": chans[0] if len(chans) == 1 else chans,
        "supervisions": [],
        "recording": {k: v for k, v in rec.items() if k != "channel_ids"},
        "type": "MonoCut" if len(chans) == 1 else "MultiCut",
    }


def _write_jsonl_gz(path: Path, rows) -> int:
    n = 0
    with gzip.open(path, "wt", encoding="utf-8") as f:
        for row in rows:
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
            n += 1
    return n


def prepare_audio_lhotse(wav_scp: str, segments: str | None, output_dir: str,
                         num_jobs: int = 4) -> dict:
    scp = []
    for line_num, line in enumerate(open(wav_scp, encoding="utf-8"), 1):
        parts = line.strip().split(maxsplit=1)
        if not parts:
            continue
        if len(parts) != 2:
            print(f"WARNING: wav.scp line {line_num} invalid: {line.strip()}",
                  file=sys.stderr)
            continue
        scp.append((parts[0], parts[1]))

    with ThreadPoolExecutor(max(1, num_jobs)) as ex:
        rows = list(ex.map(lambda kv: _recording_row(*kv), scp))
    recordings = {r["id"]: r for r in rows if r is not None}

    cuts = []
    if segments:
        skipped = 0
        for line_num, line in enumerate(open(segments, encoding="utf-8"), 1):
            parts = line.strip().split()
            if not parts:
                continue
            if len(parts) != 4:
                print(f"WARNING: segments line {line_num} invalid",
                      file=sys.stderr)
                skipped += 1
                continue
            seg_id, rec_id, start_s, end_s = parts
            rec = recordings.get(rec_id)
            try:
                start, end = float(start_s), float(end_s)
            except ValueError:
                skipped += 1
                continue
            if rec is None or end <= start or start < 0 or end > rec["duration"] + 1e-3:
                print(f"WARNING: segments line {line_num}: invalid bounds or "
                      f"unknown recording {rec_id!r}", file=sys.stderr)
                skipped += 1
                continue
            cuts.append(_cut_row(seg_id, rec, start, min(end, rec["duration"]) - start))
        if skipped:
            print(f"Skipped {skipped} invalid segments", file=sys.stderr)
    else:
        for rec in recordings.values():
            cuts.append(_cut_row(rec["id"], rec, 0.0, rec["duration"]))

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    n_rec = _write_jsonl_gz(
        out / "recordings.jsonl.gz",
        ({k: v for k, v in r.items() if k != "channel_ids"}
         for r in recordings.values()),
    )
    n_cut = _write_jsonl_gz(out / "cuts.jsonl.gz", cuts)

    durs = sorted(c["duration"] for c in cuts)
    stats = {
        "num_recordings": n_rec,
        "num_cuts": n_cut,
        "total_duration_s": round(sum(durs), 3),
        "min_duration_s": round(durs[0], 3) if durs else None,
        "max_duration_s": round(durs[-1], 3) if durs else None,
    }
    print(json.dumps(stats, indent=2))
    return stats


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wav_scp", required=True)
    p.add_argument("--segments", default=None)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--num_jobs", type=int, default=4)
    args = p.parse_args(argv)
    prepare_audio_lhotse(args.wav_scp, args.segments, args.output_dir,
                         args.num_jobs)


if __name__ == "__main__":
    main()
