#!/usr/bin/env python
"""Shard audio (+captions/conversations) into tar archives with
byte-offset indexes and a per-entry NDJSON manifest.

Parity with UALM/tools/object_storage_manifest/create_manifest.py:
jsonl/json/txt/dir entry loading, WAV-header metadata extraction
(duration, sample rate, byte data_offset for S3-style range reads),
multiprocessing shard writes, resume (complete shards are skipped),
duration statistics and a summary index.

Usage:
  python cli/create_manifest.py --audio_dir wavs/ --out_dir shards/
  python cli/create_manifest.py --jsonl data.jsonl --out_dir shards/ \
      --num_workers 8 --resume --prefix train
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--audio_dir", help="recursive *.wav scan")
    src.add_argument("--filelist", help="lines: path[<TAB>caption] or key<TAB>path")
    src.add_argument("--jsonl", help='rows: {"location", "text"/"caption"?, "conversations"?, "start"?, "duration"?}')
    p.add_argument("--out_dir", required=True)
    p.add_argument("--shard_size", type=int, default=512)
    p.add_argument("--prefix", default="shard")
    p.add_argument("--num_workers", type=int, default=0,
                   help="shards written in parallel processes when > 1")
    p.add_argument("--resume", action="store_true",
                   help="skip shards whose tar + full index already exist")
    p.add_argument("--audio_source_dir", default=None,
                   help="base dir for relative locations in --jsonl entries")
    p.add_argument("--location_key", default="location")
    p.add_argument("--caption_key", default="text")
    p.add_argument("--multi_audio", action="store_true",
                   help="entries may carry an 'audios' list (or a list "
                        "'location'); writes {prefix}.multi.manifest.jsonl "
                        "with one audio dict per clip "
                        "(_process_multi_audio_entry parity)")
    p.add_argument("--normalize_sr", type=int, default=None,
                   help="pre-pass: decode + downmix + polyphase-resample "
                        "every wav to this rate before sharding "
                        "(AudioConverter parity; wav-only in-image)")
    args = p.parse_args(argv)

    from audio_intelligence_tpu.data.manifest import (
        create_manifest_pipeline,
        create_multi_audio_manifest,
        load_entries,
        normalize_wav_batch,
    )

    if args.audio_dir:
        entries = load_entries(args.audio_dir)
    elif args.jsonl:
        entries = load_entries(
            args.jsonl,
            location_key=args.location_key,
            caption_key=args.caption_key,
        )
    else:
        entries = []
        for line in open(args.filelist, encoding="utf-8"):
            line = line.strip()
            if not line:
                continue
            if "\t" in line:
                a, b = line.split("\t", 1)
                if Path(a).suffix == ".wav" or "/" in a:
                    entries.append({"location": a, "caption": b})
                else:  # legacy key<TAB>path form
                    entries.append({"id": a, "location": b})
            else:
                entries.append({"location": line})

    if args.normalize_sr:
        norm_dir = str(Path(args.out_dir) / "normalized")
        paths = [e["location"] for e in entries if e.get("location")]
        outs = normalize_wav_batch(
            paths, norm_dir, target_sr=args.normalize_sr,
            num_workers=max(1, args.num_workers),
        )
        remap = dict(zip(paths, outs))
        for e in entries:
            if e.get("location") in remap:
                e["location"] = remap[e["location"]]

    pipeline = (
        create_multi_audio_manifest if args.multi_audio
        else create_manifest_pipeline
    )
    summary = pipeline(
        entries,
        args.out_dir,
        prefix=args.prefix,
        shard_size=args.shard_size,
        num_workers=args.num_workers,
        resume=args.resume,
        audio_source_dir=args.audio_source_dir,
    )
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
