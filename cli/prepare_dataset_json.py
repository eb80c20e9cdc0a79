#!/usr/bin/env python
"""Build a UALM dataset JSON from name,path,reader triplets.

Parity with UALM/scripts/prepare_dataset_json.py: each triplet names one
data entry; the sample list is the intersection of ids across all
sources. Readers: text | dialogue | tar_audio (lhotse_audio aliases to
the tar-shard reader — lhotse is not in this image).

Usage:
  python cli/prepare_dataset_json.py \
      --triplets audio1,shards/train.sqlite,tar_audio \
                 text1,captions.jsonl,text \
      --output_json data/train_dataset.json
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--triplets", nargs="+", required=True,
                   help="name,path,reader triplets")
    p.add_argument("--output_json", required=True)
    args = p.parse_args(argv)

    from audio_intelligence_tpu.data.datasets import prepare_dataset_json

    n = prepare_dataset_json(args.triplets, args.output_json)
    print(f"wrote {args.output_json} with {n} samples")


if __name__ == "__main__":
    main()
