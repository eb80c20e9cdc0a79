"""Sparse Mixture-of-Experts FFN with expert parallelism.

Replaces the reference's DeepSpeed-MoE expert parallelism
(UALM/models/ualm/moe_utils/replace_moe_layer.py:29-269 — Qwen3-MoE blocks
wrapped into deepspeed.moe layers with all-to-all dispatch over ep_size
GPUs) with the GSPMD-native formulation:

- top-k softmax routing with capacity-bounded GShard-style dispatch/combine
  one-hots — pure einsums, so XLA lowers the expert exchange to all-to-all
  over the ``expert`` mesh axis when expert weights are sharded
  P('expert', ...) and tokens are batch-sharded,
- the switch/Qwen load-balancing auxiliary loss
  (router_aux_loss_coef, parallel.py:374-382),
- ``replace_mlp_with_moe``-style usage: drop-in for the dense MLP in
  ``DecoderLayer`` via BackboneConfig.moe settings.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
from jax.sharding import PartitionSpec as P


def load_balancing_loss(router_probs: jax.Array, expert_mask: jax.Array) -> jax.Array:
    """Switch-transformer aux loss: E · Σ_e f_e · P_e.

    router_probs [T, E] softmax probabilities; expert_mask [T, E] one-hot
    of selected experts (top-k ORed). Matches HF's
    load_balancing_loss_func semantics used by Qwen-MoE.
    """
    num_experts = router_probs.shape[-1]
    # fraction of tokens dispatched to each expert
    f = jnp.mean(expert_mask.astype(jnp.float32), axis=0)
    # mean router prob per expert
    p = jnp.mean(router_probs, axis=0)
    return num_experts * jnp.sum(f * p)


class SparseMoEBlock(nn.Module):
    """Capacity-bounded top-k MoE FFN (SwiGLU experts).

    x [B, T, H] → (y [B, T, H], aux_loss). Expert weights are stacked
    [E, ...] so sharding P('expert', ...) gives expert parallelism.
    """

    hidden_size: int
    intermediate_size: int
    num_experts: int = 8
    top_k: int = 2
    capacity_factor: float = 1.25

    @nn.compact
    def __call__(self, x):
        b, t, h = x.shape
        e = self.num_experts
        tokens = x.reshape(b * t, h)
        n = b * t
        capacity = max(int(self.capacity_factor * n * self.top_k / e), 1)

        router_logits = nn.Dense(e, use_bias=False, name="router")(tokens)
        router_probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)

        # top-k selection
        gate_vals, expert_idx = jax.lax.top_k(router_probs, self.top_k)  # [N, k]
        gate_vals = gate_vals / jnp.maximum(
            jnp.sum(gate_vals, axis=-1, keepdims=True), 1e-9
        )

        # GShard dispatch: position of each token within its expert's queue
        onehot = jax.nn.one_hot(expert_idx, e, dtype=jnp.int32)  # [N, k, E]
        # priority: earlier tokens first; cumulative count per expert over (N·k)
        flat = onehot.reshape(n * self.top_k, e)
        pos_in_expert = jnp.cumsum(flat, axis=0) - flat  # [N·k, E]
        pos = jnp.sum(flat * pos_in_expert, axis=-1).reshape(n, self.top_k)
        keep = pos < capacity

        # dispatch/combine tensors [N, k, E, C] → summed over k to [N, E, C]
        slot = (
            jax.nn.one_hot(expert_idx, e, dtype=x.dtype)[..., None]
            * jax.nn.one_hot(
                jnp.where(keep, pos, capacity), capacity + 1, dtype=x.dtype
            )[:, :, None, :]
        )[..., :capacity]  # [N, k, E, C]
        dispatch = jnp.sum(slot, axis=1)  # [N, E, C]
        combine = jnp.sum(slot * gate_vals[..., None, None], axis=1)  # [N, E, C]

        expert_inputs = jnp.einsum("nec,nh->ech", dispatch, tokens)  # [E, C, H]

        w_gate = self.param(
            "w_gate",
            nn.initializers.lecun_normal(),
            (e, h, self.intermediate_size),
        )
        w_up = self.param(
            "w_up", nn.initializers.lecun_normal(), (e, h, self.intermediate_size)
        )
        w_down = self.param(
            "w_down", nn.initializers.lecun_normal(), (e, self.intermediate_size, h)
        )
        g = jax.nn.silu(jnp.einsum("ech,ehi->eci", expert_inputs, w_gate))
        u = jnp.einsum("ech,ehi->eci", expert_inputs, w_up)
        expert_out = jnp.einsum("eci,eih->ech", g * u, w_down)  # [E, C, H]

        y = jnp.einsum("nec,ech->nh", combine, expert_out).reshape(b, t, h)

        expert_mask = jnp.max(
            jax.nn.one_hot(expert_idx, e, dtype=jnp.float32), axis=1
        )
        aux = load_balancing_loss(router_probs, expert_mask)
        return y, aux


def moe_param_shardings(params: dict, mesh) -> dict:
    """NamedSharding tree for a SparseMoEBlock: expert-stacked weights
    shard over the 'expert' axis, router replicated."""
    from jax.sharding import NamedSharding

    def leaf(path, x):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if any(w in name for w in ("w_gate", "w_up", "w_down")):
            return NamedSharding(mesh, P("expert", None, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf, params)
