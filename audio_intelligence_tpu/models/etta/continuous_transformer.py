"""Continuous transformer — the stable-audio-open alternate backbone.

Parity with ETTA/stable_audio_tools/models/transformer.py
(ContinuousTransformer:701-816, TransformerBlock:589, Attention:275-552,
FeedForward:225 GLU): pre-LN blocks with RoPE self-attention, optional
cross-attention, GLU(SiLU) feed-forward, and optional adaLN global
conditioning — selectable as ``transformer_type='continuous_transformer'``
in DiT configs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from audio_intelligence_tpu.models.etta.dit import (
    LayerNormNoAffine,
    apply_neox_rope,
    _attend,
)


class GLUFeedForward(nn.Module):
    """dim → (inner, gate) → SiLU-GLU → dim (transformer.py FeedForward:225)."""

    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult * 2 / 3)
        hg = nn.Dense(inner * 2, use_bias=False, name="proj_in")(x)
        h, g = jnp.split(hg, 2, axis=-1)
        return nn.Dense(self.dim, use_bias=False, name="proj_out")(h * jax.nn.silu(g))


class CTBlock(nn.Module):
    dim: int
    heads: int
    cross_attend: bool = False
    cond_token_dim: int = 0
    global_cond_dim: int = 0
    rope_base: float = 10000.0

    @nn.compact
    def __call__(self, x, context=None, context_mask=None, global_cond=None):
        b, t, c = x.shape
        d_head = c // self.heads

        # optional adaLN-ish scale/shift from global cond (transformer.py:640-668)
        if self.global_cond_dim > 0 and global_cond is not None:
            mod = nn.Dense(
                6 * c, kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros, name="to_scale_shift_gate",
            )(jax.nn.silu(global_cond))
            (s_sa, sh_sa, g_sa, s_ff, sh_ff, g_ff) = jnp.split(mod, 6, axis=-1)
        else:
            s_sa = sh_sa = g_sa = s_ff = sh_ff = g_ff = None

        h = LayerNormNoAffine(name="pre_norm")(x)
        if s_sa is not None:
            h = h * (1 + s_sa[:, None]) + sh_sa[:, None]
        qkv = nn.Dense(3 * c, use_bias=False, name="attn_qkv")(h)
        qkv = qkv.reshape(b, t, 3, self.heads, d_head)
        q, k, v = [jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3)]
        q = apply_neox_rope(q, self.rope_base)
        k = apply_neox_rope(k, self.rope_base)
        attn = _attend(q, k, v)
        attn = jnp.transpose(attn, (0, 2, 1, 3)).reshape(b, t, c)
        attn = nn.Dense(c, use_bias=False, name="attn_out")(attn)
        x = x + (attn * g_sa[:, None] if g_sa is not None else attn)

        if self.cross_attend and context is not None:
            h = LayerNormNoAffine(name="xattn_norm")(x)
            q = nn.Dense(c, use_bias=False, name="xattn_q")(h)
            kv = nn.Dense(2 * c, use_bias=False, name="xattn_kv")(context)
            tm = context.shape[1]
            q = q.reshape(b, t, self.heads, d_head).transpose(0, 2, 1, 3)
            kv = kv.reshape(b, tm, 2, self.heads, d_head)
            kk = kv[:, :, 0].transpose(0, 2, 1, 3)
            vv = kv[:, :, 1].transpose(0, 2, 1, 3)
            bias = (
                jnp.where(context_mask, 0.0, -1e9)[:, None, None, :]
                if context_mask is not None
                else None
            )
            xa = _attend(q, kk, vv, bias)
            xa = jnp.transpose(xa, (0, 2, 1, 3)).reshape(b, t, c)
            x = x + nn.Dense(c, use_bias=False, name="xattn_out")(xa)

        h = LayerNormNoAffine(name="ff_norm")(x)
        if s_ff is not None:
            h = h * (1 + s_ff[:, None]) + sh_ff[:, None]
        ff = GLUFeedForward(c, name="ff")(h)
        x = x + (ff * g_ff[:, None] if g_ff is not None else ff)
        return x


class ContinuousTransformer(nn.Module):
    """dim_in → depth × CTBlock → dim_out (transformer.py:701-816)."""

    dim: int
    depth: int
    heads: int
    dim_in: Optional[int] = None
    dim_out: Optional[int] = None
    cross_attend: bool = False
    cond_token_dim: int = 0
    global_cond_dim: int = 0
    rope_base: float = 10000.0

    @nn.compact
    def __call__(self, x, context=None, context_mask=None, global_cond=None):
        if self.dim_in is not None:
            x = nn.Dense(self.dim, use_bias=False, name="project_in")(x)
        for i in range(self.depth):
            x = CTBlock(
                dim=self.dim,
                heads=self.heads,
                cross_attend=self.cross_attend,
                cond_token_dim=self.cond_token_dim,
                global_cond_dim=self.global_cond_dim,
                rope_base=self.rope_base,
                name=f"layer{i}",
            )(x, context, context_mask, global_cond)
        if self.dim_out is not None:
            x = nn.Dense(self.dim_out, use_bias=False, name="project_out")(x)
        return x
