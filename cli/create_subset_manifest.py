#!/usr/bin/env python
"""Create a subset manifest referencing existing tar shards
(UALM tools/object_storage_manifest/create_subset_manifest.py parity).

Two modes, no audio copying in either:

FILTER mode (the reference workflow): match existing sharded manifests
against a filter manifest, preserving tarball byte-seek metadata and
optionally updating captions/metadata + stamping a dataset name:

  python cli/create_subset_manifest.py \
      --input_subset_manifest filter.jsonl \
      --source_manifest_dir shards/ --output_dir subset/ \
      --prefix subset_train --dataset_name my_subset_v1 --update_metadata

INDEX mode (quick index filtering): filter a shard byte index by key
prefix / duration bounds / limit into a new jsonl index:

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
    p.add_argument("--index")
    p.add_argument("--output")
    p.add_argument("--input_subset_manifest",
                   help="filter manifest (.json/.jsonl or a directory)")
    p.add_argument("--source_manifest_dir")
    p.add_argument("--output_dir")
    p.add_argument("--prefix", default="subset")
    p.add_argument("--dataset_name", default=None)
    p.add_argument("--update_metadata", action="store_true")
    p.add_argument("--key_prefix", default=None)
    p.add_argument("--min_seconds", type=float, default=None)
    p.add_argument("--max_seconds", type=float, default=None)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)

    if args.input_subset_manifest:
        from audio_intelligence_tpu.data.manifest import create_subset_manifest

        if not (args.source_manifest_dir and args.output_dir):
            p.error("filter mode needs --source_manifest_dir and --output_dir")
        summary = create_subset_manifest(
            args.input_subset_manifest,
            args.source_manifest_dir,
            args.output_dir,
            prefix=args.prefix,
            update_metadata=args.update_metadata,
            dataset_name=args.dataset_name,
        )
        print(
            f"wrote {summary['manifest']}: {summary['num_entries']} entries "
            f"({summary['num_matched_keys']}/{summary['num_filter_keys']} "
            f"filter keys matched)"
        )
        return

    if not (args.index and args.output):
        p.error("index mode needs --index and --output")

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
