#!/usr/bin/env python
"""Shard audio files into tar archives + byte-offset manifests.

Parity with UALM/tools/object_storage_manifest/create_manifest.py: packs
wavs into tar shards and writes jsonl + sqlite indexes with absolute data
offsets for S3-style range reads.

Usage:
  python cli/create_manifest.py --audio_dir wavs/ --out_dir shards/ \
      --shard_size 512 --prefix train
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--audio_dir", default=None)
    p.add_argument("--filelist", default=None, help="lines: key<TAB>path (or just path)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--shard_size", type=int, default=512)
    p.add_argument("--prefix", default="shard")
    args = p.parse_args(argv)

    from audio_intelligence_tpu.data.etta_dataset import get_audio_filenames
    from audio_intelligence_tpu.data.tarshard import create_tar_shards

    files: list[tuple[str, str]] = []
    if args.audio_dir:
        for path in get_audio_filenames([args.audio_dir], exts=(".wav",)):
            files.append((Path(path).stem, path))
    elif args.filelist:
        for line in open(args.filelist):
            line = line.strip()
            if not line:
                continue
            if "\t" in line:
                key, path = line.split("\t", 1)
            else:
                key, path = Path(line).stem, line
            files.append((key, path))
    else:
        p.error("need --audio_dir or --filelist")

    idx_paths = create_tar_shards(
        files, args.out_dir, shard_size=args.shard_size, prefix=args.prefix
    )
    print(f"wrote {len(idx_paths)} shards ({len(files)} files) under {args.out_dir}")
    print(f"sqlite index: {args.out_dir}/{args.prefix}.sqlite")


if __name__ == "__main__":
    main()
