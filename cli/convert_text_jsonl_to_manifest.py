#!/usr/bin/env python
"""Convert text-only jsonl corpora into UALM text_only manifests.

Parity with UALM/tools/tar_to_ualm_manifest_converter/
convert_text_only_jsonl_to_ualm_manifest.py: prompt/response rows or
ShareGPT-style conversations become text1/text2 reader files, a
SingleDataset json, and per-sample length stats for bucket batching.

Usage:
  python cli/convert_text_jsonl_to_manifest.py --jsonl chat.jsonl \
      --name openhermes --out_dir exp/manifests --factor 0.5
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--jsonl", required=True)
    p.add_argument("--name", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--text_key", default="text")
    p.add_argument("--response_key", default="response")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--factor", type=float, default=1.0)
    args = p.parse_args(argv)

    from audio_intelligence_tpu.data.manifest import convert_text_jsonl_to_ualm

    result = convert_text_jsonl_to_ualm(
        args.jsonl,
        args.out_dir,
        args.name,
        text_key=args.text_key,
        response_key=args.response_key,
        tokenizer=args.tokenizer,
        factor=args.factor,
    )
    print(json.dumps(result, indent=2))
    print("\nsuggested specifier:", result["specifier"])


if __name__ == "__main__":
    main()
