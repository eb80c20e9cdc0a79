#!/usr/bin/env python
"""Precompute token-length stats for batch planning
(``UALM/scripts/prepare_length_stats.py`` parity).

Runs ``preprocessor.find_length`` over dataset manifests (multiprocess)
and writes ``stats_{task}_{name}.jsonl`` files consumed by
DataIteratorFactory.

Usage:
  python cli/prepare_length_stats.py --manifest data.jsonl \
      --task caption_to_audio --name ds1 --out_dir stats/
"""

from __future__ import annotations

import argparse
import json
import sys
from multiprocessing import Pool
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_intelligence_tpu.data.ualm_iterator import write_stats_file

_WORKER = {}


def _init(task):
    from audio_intelligence_tpu.models.ualm.text_io import ByteTextIO
    from audio_intelligence_tpu.models.ualm.audio_io import DiscreteAudioIO
    from audio_intelligence_tpu.models.ualm.preprocessor import UALMPreprocessor
    from audio_intelligence_tpu.models.ualm.vocab import build_vocabulary

    dio = DiscreteAudioIO(codec=None, codec_variables=None)
    ios = {"text": ByteTextIO(), "discrete_audio": dio}
    vocab, intervals = build_vocabulary(ios)
    _WORKER["pre"] = UALMPreprocessor(
        multimodal_io=ios, vocab=vocab, vocab_intervals=intervals,
        audio_input="discrete_audio", audio_output="discrete_audio",
    )
    _WORKER["task"] = task


def _length(item):
    ex_id, sample = item
    try:
        return ex_id, _WORKER["pre"].find_length((_WORKER["task"], "", ex_id), sample)
    except Exception as e:
        print(f"skip {ex_id}: {e}")
        return ex_id, None


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--manifest", required=True, help="jsonl rows with text1/text2/audio1 fields")
    p.add_argument("--task", required=True)
    p.add_argument("--name", required=True)
    p.add_argument("--out_dir", default="stats")
    p.add_argument("--workers", type=int, default=4)
    args = p.parse_args(argv)

    items = []
    for i, line in enumerate(open(args.manifest)):
        if line.strip():
            items.append((str(i), json.loads(line)))

    with Pool(args.workers, initializer=_init, initargs=(args.task,)) as pool:
        results = pool.map(_length, items)

    lengths = {k: v for k, v in results if v is not None}
    out = Path(args.out_dir) / f"stats_{args.task}_{args.name}.jsonl"
    write_stats_file(str(out), lengths)
    print(f"wrote {out} ({len(lengths)} entries)")


if __name__ == "__main__":
    main()
