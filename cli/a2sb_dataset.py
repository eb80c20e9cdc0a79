#!/usr/bin/env python
"""A2SB dataset-level restoration driver.

Parity with A2SB/inference/A2SB_upsample_dataset.py:77-122 and
A2SB_inpaint_dataset.py:78-173: batch-process a filelist —
- upsample: per-file auto rolloff cutoff, 50 steps,
- inpaint: synthetic gap schedule (a gap of ``--inpaint_len`` seconds every
  ``--inpaint_every`` seconds), 200 steps, optional fast-inpaint mode,
  recursive segmentation of files longer than ``--max_segment_length``.

Usage:
  python cli/a2sb_dataset.py --filelist files.txt --task inpaint \
      --inpaint_every 5 --inpaint_len 0.5 --output_dir out/
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_intelligence_tpu.utils.platform import maybe_force_platform

maybe_force_platform()

import numpy as np


def gap_schedule(duration: float, every: float, length: float) -> list[tuple[float, float]]:
    """Gaps of ``length`` seconds starting every ``every`` seconds
    (A2SB_inpaint_dataset.py:104-126)."""
    gaps = []
    t = every
    while t + length < duration:
        gaps.append((t, length))
        t += every
    return gaps


def segment_spans(duration: float, max_len: float) -> list[tuple[float, float]]:
    """Recursive halving until every span ≤ max_len."""
    def rec(start, end):
        if end - start <= max_len:
            return [(start, end)]
        mid = (start + end) / 2
        return rec(start, mid) + rec(mid, end)

    return rec(0.0, duration)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--filelist", required=True, help="one wav path per line")
    p.add_argument("--output_dir", default="a2sb_outputs")
    p.add_argument("--task", choices=["upsample", "inpaint"], default="upsample")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--n_steps", type=int, default=None)
    p.add_argument("--inpaint_every", type=float, default=5.0)
    p.add_argument("--inpaint_len", type=float, default=0.5)
    p.add_argument("--max_segment_length", type=float, default=30.0)
    p.add_argument("--fast_inpaint_mode", action="store_true")
    p.add_argument("--win_length", type=int, default=256)
    p.add_argument("--hop_length", type=int, default=128)
    p.add_argument("--model_scale", choices=["flagship", "small"], default="small")
    args = p.parse_args(argv)

    from cli.a2sb_restore import main as restore_main
    from audio_intelligence_tpu.data.audio_io import read_wav, write_wav

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    files = [l.strip() for l in open(args.filelist) if l.strip()]
    n_steps = args.n_steps or (200 if args.task == "inpaint" else 50)

    for i, path in enumerate(files):
        audio, sr = read_wav(path)
        duration = audio.shape[-1] / sr
        stem = out_dir / f"{Path(path).stem}_{i:04d}"

        if args.task == "upsample":
            restore_main([
                "-f", path, "-o", str(stem) + ".recon.wav",
                "--task", "upsample", "--n_steps", str(n_steps),
                "--win_length", str(args.win_length),
                "--hop_length", str(args.hop_length),
                "--model_scale", args.model_scale,
                *( ["--checkpoint", args.checkpoint] if args.checkpoint else [] ),
            ])
            continue

        # inpainting: process per segment to bound memory, gap schedule inside
        gaps = gap_schedule(duration, args.inpaint_every, args.inpaint_len)
        spans = segment_spans(duration, args.max_segment_length)
        print(f"[{i}] {path}: {len(gaps)} gaps over {len(spans)} segments")
        for j, (s0, s1) in enumerate(spans):
            seg = audio[:, int(s0 * sr) : int(s1 * sr)]
            seg_path = str(stem) + f".seg{j}.wav"
            write_wav(seg_path, sr, seg)
            seg_gaps = [(g - s0, l) for g, l in gaps if s0 <= g and g + l <= s1]
            for g_start, g_len in seg_gaps:
                restore_main([
                    "-f", seg_path, "-o", seg_path,  # iterative in-place fills
                    "--task", "inpaint", "--n_steps", str(n_steps),
                    "--inpaint_start", str(g_start), "--inpaint_len", str(g_len),
                    "--win_length", str(args.win_length),
                    "--hop_length", str(args.hop_length),
                    "--model_scale", args.model_scale,
                    *( ["--checkpoint", args.checkpoint] if args.checkpoint else [] ),
                ])
        # stitch segments
        parts = [read_wav(str(stem) + f".seg{j}.wav")[0] for j in range(len(spans))]
        write_wav(str(stem) + ".recon.wav", sr, np.concatenate(parts, axis=-1))
        print(f"[{i}] wrote {stem}.recon.wav")


if __name__ == "__main__":
    main()
