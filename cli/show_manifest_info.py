#!/usr/bin/env python
"""Inspect a tar-shard manifest (UALM tools/show_manifest_info.py parity).

Usage: python cli/show_manifest_info.py --index shards/train.sqlite [--key utt0]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", help=".sqlite or .index.jsonl path")
    p.add_argument("--manifest", default=None,
                   help="*.manifest.jsonl: print the full dataset statistics "
                        "report (ManifestStatistics parity) instead")
    p.add_argument("--key", default=None)
    p.add_argument("--limit", type=int, default=10)
    args = p.parse_args(argv)

    if args.manifest:
        import json

        from audio_intelligence_tpu.data.manifest import manifest_statistics

        print(json.dumps(manifest_statistics(args.manifest), indent=2))
        return
    if not args.index:
        p.error("need --index or --manifest")

    from audio_intelligence_tpu.data.tarshard import TarballMetadataReader

    meta = TarballMetadataReader(args.index)
    keys = meta.keys()
    total_samples = sum(meta[k].num_samples for k in keys)
    total_secs = sum(meta[k].num_samples / meta[k].sample_rate for k in keys)
    print(f"{len(keys)} entries, {total_samples} samples, {total_secs/3600:.2f} h")
    show = [args.key] if args.key else keys[: args.limit]
    for k in show:
        info = meta[k]
        print(
            f"  {k}: {info.tar_path} @ byte {info.data_offset} "
            f"({info.data_size} B), {info.num_channels}ch "
            f"{info.num_samples}@{info.sample_rate}Hz"
        )


if __name__ == "__main__":
    main()
