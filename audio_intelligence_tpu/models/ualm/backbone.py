"""Decoder-only LM backbone (Qwen2.5-compatible architecture), flax.

The UALM core wraps a HF causal LM (Qwen2.5-1.5B flagship, Qwen3-MoE
supported — UALM/models/ualm/lm/parallel.py:44-48). This is the TPU-native
backbone: RMSNorm, SwiGLU MLP, GQA attention with RoPE and qkv biases
(Qwen2 convention), with

- segment-aware causal masking: packed batches (UALM pack mode,
  ualm_job.py:262-270) restart position_ids per document; attention is
  causal *within* a document and blocked across documents — the TPU
  equivalent of flash-attn varlen cu_seqlens.
- a functional KV cache for autoregressive decode: fixed-size buffers
  threaded through the call (no mutable state), so the decode loop is one
  ``lax.scan``.

Sharding intent (GSPMD): weights shard over ('tensor',) on the head/ffn
axes, activations over ('data', None); applied by the caller via
NamedSharding — the module itself is sharding-agnostic.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


@dataclass(frozen=True)
class BackboneConfig:
    hidden_size: int = 1536
    num_layers: int = 28
    num_heads: int = 12
    num_kv_heads: int = 2
    intermediate_size: int = 8960
    rope_theta: float = 1e6
    rms_eps: float = 1e-6
    qkv_bias: bool = True  # Qwen2 convention
    # MoE (Qwen3-MoE-style sparse FFN; 0 experts = dense)
    num_experts: int = 0
    num_experts_per_tok: int = 2
    moe_intermediate_size: int = 0
    # capacity factor e/k guarantees no token drops (needed for exact
    # prefill↔decode consistency); lower values match training-time MoE
    moe_capacity_factor: float = 1.25
    # sequences at/above this length route attention through the
    # segment-aware causal pallas flash kernel instead of the dense
    # [B, H, T, S] bias path (whose f32 scores are ~13 GB at the UALM
    # 16k bucket — single-chip OOM). Decode steps (t=1) keep the dense
    # path; only long prefill/training forwards switch. The kernel has a
    # FlashAttention-2 custom_vjp backward, so training forwards route
    # through it too (the reference trains its 16000-token bucket on
    # differentiable CUDA flash-attn — conf/train.yaml:35-37).
    flash_min_len: int = 4096
    # static bound on any packed segment's length (the data pipeline's
    # per-clip token cap; UALM buckets pack clips far shorter than the
    # 16000-token bucket). When set, the flash kernel walks only the
    # diagonal K/V band — at the 16k bucket this removes ~87% of the
    # attention DMA/steps in fwd AND bwd. None = full scan (always
    # correct); setting it is a promise that no segment exceeds it.
    flash_max_segment_len: int | None = None
    # flash kernel block sizes. With a segment window, smaller k blocks
    # tighten the diagonal band (less overfetch): at L=2048 the walk is
    # ceil((block_q+L)/block_k)+1 k-blocks ≈ L + block_k + block_q keys.
    flash_block_q: int = 256
    flash_block_k: int = 512
    # per-layer activation rematerialization (ualm_job.py:153-154 /
    # deepspeed.json activation checkpointing): at the 16k bucket the
    # un-remat'd backward's per-layer intermediates exceed one chip.
    remat: bool = False

    @staticmethod
    def qwen25_1_5b():
        return BackboneConfig()

    @staticmethod
    def tiny():
        return BackboneConfig(
            hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
            intermediate_size=128,
        )


class KVCache(NamedTuple):
    """Per-layer stacked buffers [L, B, max_len, kv_heads, head_dim]."""

    k: jax.Array
    v: jax.Array
    index: jax.Array  # [] current fill length

    @staticmethod
    def init(cfg: BackboneConfig, batch: int, max_len: int, dtype=jnp.float32):
        head_dim = cfg.hidden_size // cfg.num_heads
        shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, head_dim)
        return KVCache(
            jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), jnp.zeros((), jnp.int32)
        )


def _rope(x, position_ids, theta):
    """x [B, T, H, D], position_ids [B, T] — NeoX half-split rotation."""
    d = x.shape[-1]
    inv = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    ang = position_ids[..., None].astype(jnp.float32) * inv  # [B, T, d/2]
    cos = jnp.cos(ang)[:, :, None, :].astype(x.dtype)
    sin = jnp.sin(ang)[:, :, None, :].astype(x.dtype)
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


def segment_ids_from_positions(position_ids):
    """Documents restart position_ids at 0 → segment id = #resets so far."""
    resets = (position_ids == 0).astype(jnp.int32)
    return jnp.cumsum(resets, axis=-1)


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        x32 = x.astype(jnp.float32)
        x32 = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + self.eps)
        return (x32 * w).astype(x.dtype)


class Attention(nn.Module):
    cfg: BackboneConfig

    @nn.compact
    def __call__(self, x, position_ids, attn_bias, layer_cache=None, flash_info=None):
        cfg = self.cfg
        b, t, _ = x.shape
        head_dim = cfg.hidden_size // cfg.num_heads
        q = nn.Dense(cfg.num_heads * head_dim, use_bias=cfg.qkv_bias, name="q_proj")(x)
        k = nn.Dense(cfg.num_kv_heads * head_dim, use_bias=cfg.qkv_bias, name="k_proj")(x)
        v = nn.Dense(cfg.num_kv_heads * head_dim, use_bias=cfg.qkv_bias, name="v_proj")(x)
        q = q.reshape(b, t, cfg.num_heads, head_dim)
        k = k.reshape(b, t, cfg.num_kv_heads, head_dim)
        v = v.reshape(b, t, cfg.num_kv_heads, head_dim)
        q = _rope(q, position_ids, cfg.rope_theta)
        k = _rope(k, position_ids, cfg.rope_theta)

        new_cache = None
        if layer_cache is not None:
            ck, cv, idx = layer_cache
            ck = jax.lax.dynamic_update_slice_in_dim(ck, k, idx, axis=1)
            cv = jax.lax.dynamic_update_slice_in_dim(cv, v, idx, axis=1)
            k, v = ck, cv
            new_cache = (ck, cv)

        groups = cfg.num_heads // cfg.num_kv_heads
        kx = jnp.repeat(k, groups, axis=2)
        vx = jnp.repeat(v, groups, axis=2)

        if flash_info is not None:
            # segment-aware causal flash (O(T) VMEM): the dense path
            # below materializes [B, H, T, S] f32 scores — 13 GB at the
            # reference's 16k token bucket. Shapes pad to block
            # multiples; padded queries/keys carry segment −2/−1 so they
            # match nothing and slice away.
            from audio_intelligence_tpu.ops.pallas_attention import (
                flash_attention_segmented,
            )

            q_pos, q_seg, kv_pos, kv_seg = flash_info
            s_len = kx.shape[1]
            pad_t = (-t) % cfg.flash_block_q
            pad_s = (-s_len) % cfg.flash_block_k
            qh = jnp.moveaxis(q, 2, 1)
            kh = jnp.moveaxis(kx, 2, 1)
            vh = jnp.moveaxis(vx, 2, 1)
            if pad_t:
                qh = jnp.pad(qh, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
                q_pos = jnp.pad(q_pos, ((0, 0), (0, pad_t)))
                q_seg = jnp.pad(
                    q_seg, ((0, 0), (0, pad_t)), constant_values=-2
                )
            if pad_s:
                kh = jnp.pad(kh, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
                vh = jnp.pad(vh, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
                kv_pos = jnp.pad(kv_pos, ((0, 0), (0, pad_s)))
                kv_seg = jnp.pad(
                    kv_seg, ((0, 0), (0, pad_s)), constant_values=-1
                )
            out = flash_attention_segmented(
                qh, kh, vh, q_pos, kv_pos, q_seg, kv_seg,
                block_q=cfg.flash_block_q, block_k=cfg.flash_block_k,
                max_segment_len=cfg.flash_max_segment_len,
            )
            out = jnp.moveaxis(out[:, :, :t], 1, 2)
        else:
            scale = 1.0 / np.sqrt(head_dim)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, kx).astype(jnp.float32)
            logits = logits + attn_bias
            probs = jax.nn.softmax(logits, axis=-1).astype(vx.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, vx)
        out = out.reshape(b, t, cfg.num_heads * head_dim)
        out = nn.Dense(cfg.hidden_size, use_bias=False, name="o_proj")(out)
        return out, new_cache


class MLP(nn.Module):
    cfg: BackboneConfig

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.cfg.intermediate_size, use_bias=False, name="gate_proj")(x)
        u = nn.Dense(self.cfg.intermediate_size, use_bias=False, name="up_proj")(x)
        return nn.Dense(self.cfg.hidden_size, use_bias=False, name="down_proj")(
            jax.nn.silu(h) * u
        )


class DecoderLayer(nn.Module):
    cfg: BackboneConfig

    @nn.compact
    def __call__(self, x, position_ids, attn_bias, layer_cache=None, flash_info=None):
        h, new_cache = Attention(self.cfg, name="self_attn")(
            RMSNorm(self.cfg.rms_eps, name="input_layernorm")(x),
            position_ids,
            attn_bias,
            layer_cache,
            flash_info=flash_info,
        )
        x = x + h
        normed = RMSNorm(self.cfg.rms_eps, name="post_attention_layernorm")(x)
        aux = 0.0
        if self.cfg.num_experts > 0:
            from audio_intelligence_tpu.models.ualm.moe import SparseMoEBlock

            ffn_out, aux = SparseMoEBlock(
                hidden_size=self.cfg.hidden_size,
                intermediate_size=self.cfg.moe_intermediate_size
                or self.cfg.intermediate_size,
                num_experts=self.cfg.num_experts,
                top_k=self.cfg.num_experts_per_tok,
                capacity_factor=self.cfg.moe_capacity_factor,
                name="moe",
            )(normed)
            x = x + ffn_out
        else:
            x = x + MLP(self.cfg, name="mlp")(normed)
        return x, new_cache, aux


class QwenBackbone(nn.Module):
    """embeds [B, T, H] → hidden [B, T, H]; optional functional KV cache."""

    cfg: BackboneConfig

    def _attn_bias(self, position_ids, kv_positions, kv_segments, q_segments, kv_valid):
        """[B, 1, Tq, Tk] additive bias: causal within matching segments."""
        q_pos = position_ids[:, None, :, None]
        k_pos = kv_positions[:, None, None, :]
        causal = k_pos <= q_pos
        same_seg = kv_segments[:, None, None, :] == q_segments[:, None, :, None]
        ok = causal & same_seg & kv_valid[:, None, None, :]
        return jnp.where(ok, 0.0, -1e9)

    @nn.compact
    def __call__(
        self,
        embeds,
        position_ids=None,
        cache: Optional[KVCache] = None,
        cache_positions=None,
        cache_segments=None,
        q_segments=None,
    ):
        """``q_segments`` overrides the position-derived segment ids —
        needed for left-padded batched decoding, where a length-1 decode
        step cannot recover its document id from its position alone."""
        cfg = self.cfg
        b, t, _ = embeds.shape
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(t), (b, t))
        explicit_q_segments = q_segments is not None
        if q_segments is None:
            q_segments = segment_ids_from_positions(position_ids)

        flash_info = None
        use_flash = t >= cfg.flash_min_len
        if cache is None:
            if use_flash:
                bias = None
                flash_info = (position_ids, q_segments, position_ids, q_segments)
            else:
                bias = self._attn_bias(
                    position_ids, position_ids, q_segments, q_segments,
                    jnp.ones((b, t), bool),
                )
        else:
            max_len = cache.k.shape[2]
            kv_valid = jnp.arange(max_len)[None, :] < (cache.index + t)
            kv_valid = jnp.broadcast_to(kv_valid, (b, max_len))
            kv_pos = cache_positions if cache_positions is not None else jnp.broadcast_to(
                jnp.arange(max_len), (b, max_len)
            )
            if cache_segments is None:
                # single-document decode: everything is one segment
                kv_seg = jnp.zeros((b, max_len), jnp.int32)
                if not explicit_q_segments:
                    q_segments = jnp.zeros_like(q_segments)
            else:
                kv_seg = cache_segments
            if use_flash:
                bias = None
                flash_info = (
                    position_ids, q_segments, kv_pos,
                    jnp.where(kv_valid, kv_seg, -1),
                )
            else:
                bias = self._attn_bias(
                    position_ids, kv_pos, kv_seg, q_segments, kv_valid
                )

        x = embeds
        new_k, new_v = [], []
        moe_aux = 0.0
        layer_cls = DecoderLayer
        if cfg.remat:
            layer_cls = nn.remat(
                DecoderLayer,
                policy=jax.checkpoint_policies.nothing_saveable,
            )
        for i in range(cfg.num_layers):
            layer_cache = None
            if cache is not None:
                layer_cache = (cache.k[i], cache.v[i], cache.index)
            x, lc, aux = layer_cls(cfg, name=f"layers_{i}")(
                x, position_ids, bias, layer_cache, flash_info=flash_info
            )
            moe_aux = moe_aux + aux
            if lc is not None:
                new_k.append(lc[0])
                new_v.append(lc[1])

        x = RMSNorm(cfg.rms_eps, name="norm")(x)
        self.sow("intermediates", "moe_aux", moe_aux)
        if cache is not None:
            new_cache = KVCache(jnp.stack(new_k), jnp.stack(new_v), cache.index + t)
            return x, new_cache
        return x
