"""Unified vocabulary builder (UALM/models/ualm/ualm_job.py:71-110).

256 reserved special-token slots, then each discrete IO's vocabulary
appended with per-stream interval bookkeeping.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

SPECIAL_TOKENS = [
    "<|pad|>",
    "<|bos|>",
    "<|eos|>",
    "<|eot|>",
    "<|system|>",
    "<|user|>",
    "<|assistant|>",
    "<|text|>",
    "<|audio|>",
    "<|speech|>",
    "<|image|>",
    "<|video|>",
    "<|toolcall|>",
]

NUM_SPECIAL_TOKENS = 256


def build_vocabulary(
    ios: Dict[str, object], num_special_tokens: int = NUM_SPECIAL_TOKENS
) -> Tuple[List[str], Dict[str, List[Tuple[int, int]]]]:
    """ios: {name: io} where discrete ios expose .get_vocabulary() and
    .get_stream_interval(). Returns (vocab, vocab_intervals)."""
    vocab = list(SPECIAL_TOKENS)
    while len(vocab) < num_special_tokens:
        vocab.append(f"<|unused_{len(vocab)}|>")
    vocab_intervals: Dict[str, List[Tuple[int, int]]] = {
        "special_token": [(0, num_special_tokens)]
    }

    start = num_special_tokens
    for io_name, io in ios.items():
        if getattr(io, "is_discrete", False):
            vocab.extend(io.get_vocabulary())
            vocab_intervals[io_name] = [
                (start + s, start + e) for s, e in io.get_stream_interval()
            ]
            start = len(vocab)

    assert len(vocab) == len(set(vocab)), "duplicate tokens in unified vocab"
    return vocab, vocab_intervals


def build_loss_intervals(
    vocab_intervals: Dict[str, List[Tuple[int, int]]],
    max_loss_interval: int = 13192,
) -> List[Tuple[int, int]]:
    """Split non-text interval unions into ≤max chunks for the interval
    softmax (UALM parallel.py:151-173)."""
    out: List[Tuple[int, int]] = []
    for io_name, intervals in vocab_intervals.items():
        if io_name in ("text", "special_token"):
            continue
        cur_start, end = intervals[0]
        for _, end in intervals[1:]:
            if end - cur_start <= max_loss_interval:
                continue
            out.append((cur_start, end))
            cur_start = end
        if end > cur_start:
            out.append((cur_start, end))
    return out
