"""GSPMD mesh utilities — the single distributed runtime.

Replaces the reference's three communication stacks (PTL-DDP for A2SB,
DeepSpeed ZeRO-1/2 for ETTA/UALM, DeepSpeed-MoE expert parallelism —
SURVEY.md §2.4) with one ``jax.sharding.Mesh`` over ICI/DCN:

- ``data``   axis — batch sharding (DDP analogue; XLA emits the gradient
  psum the way NCCL all-reduce did).
- ``fsdp``   axis — parameter/optimizer-state sharding (ZeRO analogue;
  XLA emits reduce-scatter/all-gather pairs).
- ``tensor`` axis — optional tensor parallelism for large LMs.
- ``expert`` axis — MoE expert parallelism (ragged all-to-all).
"""

from audio_intelligence_tpu.parallel.mesh import (
    MeshSpec,
    make_mesh,
    batch_sharding,
    replicated,
    fsdp_sharding_for_tree,
    shard_batch,
)
