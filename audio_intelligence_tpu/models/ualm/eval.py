"""Sharded dataset-scale batch inference for UALM.

TPU-native redesign of the reference's multi-worker inference driver
(UALM/scripts/inference.py:156-304): the reference ``mp.spawn``s one
worker per GPU, shards the test set ``samples[rank::world]``, runs
sample-at-a-time inference, and aggregates per-worker ``results.json``.
Here the equivalent sharding is two-level and mesh-native:

- across HOSTS: each JAX process takes ``samples[process_index ::
  process_count]`` (the reference's worker sharding, kept so multi-host
  pods split the set without any coordination);
- across DEVICES: samples are packed into batches of
  ``per_device · n_devices`` rows, LEFT-padded to a shared bucket length,
  and one jitted ``generate_segment`` runs with the batch dimension
  sharded over the mesh's ``data`` axis — XLA moves nothing between
  devices (decode is embarrassingly parallel over rows), so this scales
  over ICI without collectives.

Left-padding correctness rides the segment machinery (pad slots get
cache segment −1, real tokens segment 0 with restarted positions), so a
padded batched decode is equivalent to per-sample decodes — test-gated
in the greedy regime (tests/test_ualm_inference.py).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.ualm.decode import generate_segment
from audio_intelligence_tpu.models.ualm.lm import ParallelLM


def shard_for_process(samples: Sequence, process_index: int | None = None,
                      process_count: int | None = None) -> list:
    """The reference's worker sharding: samples[rank::world]
    (scripts/inference.py:193)."""
    rank = jax.process_index() if process_index is None else process_index
    world = jax.process_count() if process_count is None else process_count
    return list(samples)[rank::world]


def sharded_batch_inference(
    model: ParallelLM,
    variables,
    prompts: Sequence[np.ndarray],  # each [T_i, S] int
    max_steps: int,
    logit_mask,
    eos_id: int,
    key,
    mesh: jax.sharding.Mesh | None = None,
    data_axis: str = "data",
    per_device: int = 1,
    cfg_scale: float = 1.0,
    top_k: int = 20,
    temperature: float = 0.8,
    stream_intervals=None,
    length_multiple: int = 8,
):
    """Run ``generate_segment`` over a list of variable-length prompts,
    batched and (optionally) sharded over the mesh's data axis.

    Returns a list of (tokens [max_steps, S], n_valid) per prompt, in
    input order. With ``mesh=None`` the batch still packs ``per_device``
    rows per call on the single default device.
    """
    n_dev = mesh.shape[data_axis] if mesh is not None else 1
    batch = per_device * n_dev
    s = int(prompts[0].shape[-1])

    in_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        in_sharding = NamedSharding(mesh, P(data_axis))

    jitted = {}

    def run_batch(ids, lengths, subkey):
        t = ids.shape[1]
        if t not in jitted:
            def fn(ids, lengths, subkey):
                return generate_segment(
                    model, variables, ids, max_steps, logit_mask, eos_id,
                    subkey, cfg_scale=cfg_scale, top_k=top_k,
                    temperature=temperature,
                    stream_intervals=stream_intervals,
                    prompt_lengths=lengths,
                )

            kwargs = {}
            if in_sharding is not None:
                kwargs["in_shardings"] = (in_sharding, in_sharding, None)
            jitted[t] = jax.jit(fn, **kwargs)
        return jitted[t](ids, lengths, subkey)

    results = []
    for lo in range(0, len(prompts), batch):
        chunk = list(prompts[lo : lo + batch])
        real = len(chunk)
        while len(chunk) < batch:  # pad the final batch with a dummy row
            chunk.append(chunk[0])
        lengths = np.asarray([c.shape[0] for c in chunk], np.int32)
        t_max = int(lengths.max())
        t_pad = -(-t_max // length_multiple) * length_multiple
        ids = np.zeros((batch, t_pad, s), np.int64)
        for i, c in enumerate(chunk):
            ids[i, t_pad - c.shape[0] :] = c  # LEFT padding
        key, subkey = jax.random.split(key)
        tokens, done = run_batch(
            jnp.asarray(ids, jnp.int32), jnp.asarray(lengths), subkey
        )
        tokens = np.asarray(tokens)
        done = np.asarray(done)
        for i in range(real):
            nz = np.nonzero(done[i])[0]
            n_valid = int(nz[0]) if nz.size else tokens.shape[1]
            results.append((tokens[i], n_valid))
    return results


def write_results_shard(
    out_dir: str | Path, records: list, process_index: int | None = None
) -> Path:
    """Per-process results shard + aggregation (the reference's workers
    each write results, merged by the driver — scripts/inference.py
    main:307-375). Process 0 merges every present shard into
    ``results.json``.

    In a real multi-host run the merge must not race slower hosts'
    shard writes (the reference joins its mp.spawn workers before
    aggregating — scripts/inference.py:361-370); a global device sync
    after the shard write provides the same barrier here."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    rank = jax.process_index() if process_index is None else process_index
    shard = out_dir / f"results_shard_{rank}.json"
    shard.write_text(json.dumps(records, indent=1))
    if process_index is None and jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("ualm_eval_shards_written")
    if rank == 0:
        merged = []
        for f in sorted(out_dir.glob("results_shard_*.json")):
            merged.extend(json.loads(f.read_text()))
        (out_dir / "results.json").write_text(json.dumps(merged, indent=1))
    return shard
