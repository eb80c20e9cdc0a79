#!/usr/bin/env python
"""Convert stage-1 shard manifests into UALM training manifests.

Parity with UALM/tools/tar_to_ualm_manifest_converter/
convert_tar_to_ualm_manifest.py: per-dataset config (task, weight,
segmentation), token-length estimation for bucket batching, audio-only
segmentation into fixed windows, and suggested training specifiers.
Outputs feed SingleDataset / DataIteratorFactory directly.

Usage (single dataset):
  python cli/convert_tar_to_manifest.py --manifest shards/train.manifest.jsonl \
      --name musiccaps --task caption_to_audio --out_dir exp/manifests

Usage (config mode, several datasets):
  python cli/convert_tar_to_manifest.py --config datasets.yaml --out_dir exp/manifests

Config YAML:
  audio_fps: 50.0
  tokenizer: null            # HF name, optional (offline heuristic otherwise)
  datasets:
    - name: musiccaps
      manifest: shards/train.manifest.jsonl
      task: caption_to_audio
      factor: 2.0
    - name: fma
      manifest: shards/fma.manifest.jsonl
      task: audio_only
      segment_duration_max: 30.0
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None, help="YAML with a datasets: list")
    p.add_argument("--manifest", default=None, help="single {prefix}.manifest.jsonl")
    p.add_argument("--name", default=None)
    p.add_argument("--task", default="caption_to_audio")
    p.add_argument("--factor", type=float, default=1.0)
    p.add_argument("--audio_fps", type=float, default=50.0)
    p.add_argument("--tokenizer", default=None, help="HF tokenizer for exact lengths")
    p.add_argument("--segment_duration_max", type=float, default=0.0)
    p.add_argument("--segment_duration_min", type=float, default=1.0)
    p.add_argument("--out_dir", required=True)
    args = p.parse_args(argv)

    from audio_intelligence_tpu.data.manifest import (
        ConvertConfig,
        convert_shard_manifest_to_ualm,
    )

    cfgs = []
    if args.config:
        import yaml

        with open(args.config, encoding="utf-8") as f:
            doc = yaml.safe_load(f)
        defaults = {
            "audio_fps": doc.get("audio_fps", args.audio_fps),
            "tokenizer": doc.get("tokenizer", args.tokenizer),
        }
        for ds in doc["datasets"]:
            cfgs.append(ConvertConfig(**{**defaults, **ds}))
    else:
        if not (args.manifest and args.name):
            p.error("need --config, or --manifest + --name")
        cfgs.append(
            ConvertConfig(
                name=args.name,
                manifest=args.manifest,
                task=args.task,
                factor=args.factor,
                audio_fps=args.audio_fps,
                tokenizer=args.tokenizer,
                segment_duration_max=args.segment_duration_max,
                segment_duration_min=args.segment_duration_min,
            )
        )

    results = [convert_shard_manifest_to_ualm(c, args.out_dir) for c in cfgs]
    print(json.dumps(results, indent=2))
    print("\nsuggested --data_specifiers:")
    for r in results:
        print(" ", r["specifier"])


if __name__ == "__main__":
    main()
