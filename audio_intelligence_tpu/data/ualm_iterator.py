"""UALM data iterator: deterministic resumable global batch plans.

Capability parity with ``DataIteratorFactory``
(UALM/dataloader/iterator.py:24-332):

- data specifiers ``task:name[:json][:factor]`` (parse_data_specifier),
- per-example token-length stats loaded from ``stats_{task}_{name}.jsonl``
  files (:394-449),
- dataset resampling by factor (duplicate/subsample, :452-506),
- token-budget batchfy into a precomputed batch plan, epoch-seeded
  shuffle, rank sharding,
- loader-state JSON save/restore so resume replays the exact batch order
  (:288-332),
- sequential mode for inference (:126-147).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from audio_intelligence_tpu.data.batching import batchfy, synchronize_batches
from audio_intelligence_tpu.utils.config import parse_data_specifier

Key = Tuple[str, str, str]  # (task, dataset_name, example_id)


def load_stats_file(path: str) -> Dict[str, int]:
    """stats jsonl rows: {"id": ..., "length": N} (prepare_length_stats output)."""
    out = {}
    with open(path) as f:
        for line in f:
            if line.strip():
                row = json.loads(line)
                out[str(row["id"])] = int(row["length"])
    return out


def write_stats_file(path: str, lengths: Dict[str, int]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for k, v in lengths.items():
            f.write(json.dumps({"id": k, "length": int(v)}) + "\n")


def resample_keys(
    keys: List[Key], factor: float, rng: np.random.Generator
) -> List[Key]:
    """factor > 1: duplicate (int part + random remainder); < 1: subsample."""
    if factor == 1.0:
        return list(keys)
    whole = int(factor)
    frac = factor - whole
    out = list(keys) * whole
    n_extra = int(round(frac * len(keys)))
    if n_extra > 0:
        idx = rng.choice(len(keys), size=n_extra, replace=False)
        out.extend(keys[i] for i in idx)
    return out


@dataclass
class DataIteratorFactory:
    """Builds deterministic batch plans over multiple specifier datasets.

    specifiers: list of 'task:name[:json][:factor]' strings.
    stats_dir: directory of stats_{task}_{name}.jsonl files.
    """

    specifiers: Sequence[str]
    stats_dir: str
    batch_token: int = 16000
    batchfy_method: str = "bucket"
    rank: int = 0
    world_size: int = 1
    seed: int = 0
    loader_state_path: Optional[str] = None

    def __post_init__(self):
        self.parsed = [parse_data_specifier(s) for s in self.specifiers]
        self.key_to_length: Dict[Key, int] = {}
        for spec in self.parsed:
            stats_path = os.path.join(
                self.stats_dir, f"stats_{spec['task']}_{spec['name']}.jsonl"
            )
            for ex_id, length in load_stats_file(stats_path).items():
                self.key_to_length[(spec["task"], spec["name"], ex_id)] = length

    def build_batches(self, epoch: int = 0) -> List[List[Key]]:
        """Epoch-seeded plan: resample → batchfy → shuffle → rank shard."""
        rng = np.random.default_rng(self.seed + epoch)
        keys: List[Key] = []
        for spec in self.parsed:
            spec_keys = [
                k for k in self.key_to_length
                if k[0] == spec["task"] and k[1] == spec["name"]
            ]
            keys.extend(resample_keys(sorted(spec_keys), spec["factor"], rng))

        batches = batchfy(keys, self.key_to_length, self.batch_token, self.batchfy_method)
        order = rng.permutation(len(batches))
        batches = [batches[i] for i in order]

        if self.world_size > 1:
            per_rank = [batches[r :: self.world_size] for r in range(self.world_size)]
            batches = synchronize_batches(per_rank)[self.rank]
        return batches

    def build_iter(
        self,
        load_fn: Callable[[List[Key]], object],
        epoch: int = 0,
        resume: bool = True,
    ) -> Iterable:
        """Yield collated batches; resumable via loader-state JSON."""
        from audio_intelligence_tpu.train.checkpoint import (
            load_batch_plan,
            save_batch_plan,
        )

        batches: Optional[List[List[Key]]] = None
        consumed = 0
        if resume and self.loader_state_path:
            plan, consumed = load_batch_plan(self.loader_state_path)
            if plan is not None:
                batches = [[tuple(k) for k in b] for b in plan]
        if batches is None:
            batches = self.build_batches(epoch)
            if self.loader_state_path:
                save_batch_plan(
                    self.loader_state_path,
                    [[list(k) for k in b] for b in batches],
                    0,
                )

        for i in range(consumed, len(batches)):
            # mark consumed before yielding: a batch handed to the trainer
            # counts as delivered, so resume never replays it
            if self.loader_state_path:
                save_batch_plan(
                    self.loader_state_path,
                    [[list(k) for k in b] for b in batches],
                    i + 1,
                )
            yield load_fn(batches[i])

    def sequential_batches(self, batch_size: int) -> List[List[Key]]:
        """Inference mode: fixed-size batches in key order, rank-sharded."""
        keys = sorted(self.key_to_length)
        batches = [
            keys[i : i + batch_size] for i in range(0, len(keys), batch_size)
        ]
        return batches[self.rank :: self.world_size]
