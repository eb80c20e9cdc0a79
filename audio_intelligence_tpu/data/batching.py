"""Token-budget batching (UALM/dataloader/batch.py:17-187).

- ``batchfy_bucket``: sort by length, fill while max_len·count ≤ budget
  (flagship: bucket, 16000 tokens — UALM conf/train.yaml).
- ``batchfy_pack``: best-fit-decreasing packing for the pack collation.
- ``synchronize_batches``: equalize batch counts across data-parallel
  ranks (batch.py:183).
"""

from __future__ import annotations

from typing import Dict, Hashable, List, Sequence


def batchfy_bucket(keys, key_to_length, batch_token: int):
    sorted_keys = sorted(keys, key=lambda k: key_to_length[k])
    buckets: List[list] = []
    current: list = []
    for key in sorted_keys:
        if not current:
            current = [key]
            continue
        if key_to_length[key] * (len(current) + 1) <= batch_token:
            current.append(key)
        else:
            buckets.append(current)
            current = [key]
    if current:
        buckets.append(current)
    return buckets


def batchfy_pack(keys, key_to_length, batch_token: int):
    """Best-fit decreasing; batches ≥99% full retire early."""
    sorted_keys = sorted(keys, key=lambda k: key_to_length[k], reverse=True)
    finished, active, totals = [], [], []
    threshold = 0.99 * batch_token
    for key in sorted_keys:
        length = key_to_length[key]
        best, best_remaining = -1, float("inf")
        for idx, total in enumerate(totals):
            remaining = batch_token - total
            if length <= remaining < best_remaining:
                best, best_remaining = idx, remaining
        if best >= 0:
            active[best].append(key)
            totals[best] += length
            if totals[best] >= threshold:
                finished.append(active.pop(best))
                totals.pop(best)
        else:
            active.append([key])
            totals.append(length)
    return finished + active


def batchfy(keys, key_to_length, batch_token: int, method: str = "bucket"):
    if method == "bucket":
        return batchfy_bucket(keys, key_to_length, batch_token)
    if method == "pack":
        return batchfy_pack(keys, key_to_length, batch_token)
    raise ValueError(f"unknown batchfy method {method}")


def synchronize_batches(per_rank_batches: Sequence[list]) -> List[list]:
    """Trim every rank's batch list to the global minimum count so all
    data-parallel ranks step in lockstep (batch.py:183-226)."""
    n = min(len(b) for b in per_rank_batches)
    return [b[:n] for b in per_rank_batches]
