"""Tensor-parallel sharding rules for the UALM backbone.

Megatron-style PartitionSpecs over the ``tensor`` mesh axis for the
Qwen-style decoder (models/ualm/backbone.py):

- attention q/k/v projections: column-parallel (shard the head dim),
- attention output projection: row-parallel (shard the input dim),
- MLP gate/up: column-parallel; down: row-parallel,
- embeddings / lm_head / stream_emb: vocab- or hidden-sharded,
- norms and biases: replicated.

With these specs under jit, XLA inserts the all-reduce after o_proj /
down_proj automatically (GSPMD) — no hand-written collectives. Combine
with the 'fsdp' axis from parallel/mesh.py for 2-D sharding.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_COLUMN = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
_ROW = ("o_proj", "down_proj")


def _spec_for(path: str, shape) -> P:
    ndim = len(shape)
    last = path.rsplit("/", 2)
    name = "/".join(last)
    if any(f"/{m}/" in f"/{path}/" for m in _COLUMN):
        if path.endswith("kernel") and ndim == 2:
            return P(None, "tensor")
        if path.endswith("bias"):
            return P("tensor")
    if any(f"/{m}/" in f"/{path}/" for m in _ROW):
        if path.endswith("kernel") and ndim == 2:
            return P("tensor", None)
        return P()  # row-parallel bias replicated (added after all-reduce)
    if "embed_tokens" in path and path.endswith("embedding"):
        return P(None, "tensor")  # hidden-sharded embedding
    if path.endswith("lm_head_kernel"):
        return P(None, "tensor")  # vocab-sharded head
    if "moe" in path and ndim == 3:
        return P("expert", None, None)
    return P()


def tp_shardings_for_params(params, mesh: Mesh):
    """NamedSharding tree implementing the rules above."""

    def leaf(path_keys, x):
        path = "/".join(str(getattr(k, "key", k)) for k in path_keys)
        return NamedSharding(mesh, _spec_for(path, getattr(x, "shape", ())))

    return jax.tree_util.tree_map_with_path(leaf, params)
