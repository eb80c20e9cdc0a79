#!/usr/bin/env python
"""Create a subset manifest referencing existing tar shards
(UALM tools/create_subset_manifest.py parity): filter by key prefix /
duration bounds / limit, write a new jsonl index — no audio copying.

Usage:
  python cli/create_subset_manifest.py --index shards/train.sqlite \
      --output subset.index.jsonl --limit 100 --min_seconds 1.0
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--key_prefix", default=None)
    p.add_argument("--min_seconds", type=float, default=None)
    p.add_argument("--max_seconds", type=float, default=None)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)

    from audio_intelligence_tpu.data.tarshard import TarballMetadataReader

    meta = TarballMetadataReader(args.index)
    kept = []
    for key in meta.keys():
        info = meta[key]
        secs = info.num_samples / info.sample_rate
        if args.key_prefix and not key.startswith(args.key_prefix):
            continue
        if args.min_seconds is not None and secs < args.min_seconds:
            continue
        if args.max_seconds is not None and secs > args.max_seconds:
            continue
        kept.append(info)
        if args.limit is not None and len(kept) >= args.limit:
            break

    with open(args.output, "w") as f:
        for info in kept:
            f.write(info.to_json() + "\n")
    print(f"wrote {args.output}: {len(kept)}/{len(meta.keys())} entries")


if __name__ == "__main__":
    main()
