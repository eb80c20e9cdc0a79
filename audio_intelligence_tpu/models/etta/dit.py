"""ETTA-DiT — the adaLN-Zero latent-diffusion transformer, TPU-native flax.

Capability parity with the reference stack (ETTA/stable_audio_tools/models/
dit.py DiffusionTransformer:18-405 + etta_transformer.py ETTADiTBlock:817,
ETTADiTStack:957, ETTATransformerWrapper:1018, Attention:244,
PositionwiseConvFF:213, FinalLayer:107, modulate:36):

- Fourier timestep features (256) → MLP global embedding, summed with the
  projected global conditioning; adaLN-Zero modulation (9-way chunk per
  block: shift/scale/gate for self-attn, cross-attn, and FF).
- Self-attention with NeoX-style RoPE (flash-attn rotary convention,
  base 16384 flagship), cross-attention over T5 states (d_memory 768,
  16 heads, no positional encoding), optional qk-norm.
- Zero-init: adaLN projections, FinalLayer linear, pre/post 1×1 convs.
- CFG by batch-doubling against the zero "null" embedding, negative
  conditioning support, CFG rescale (scale_phi).

Flagship: depth 24, d 1536, 24 heads, kernel 1 ConvFF, p_dropout 0.1
(etta_dit.json:72-101).

TPU-first notes: everything is [B, T, C]; attention is fused einsum →
MXU with fp32 softmax; masks are additive biases (True = valid, the
wrapper handles the reference's inverted-mask convention internally);
RoPE tables are host-precomputed per static length.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


def modulate(x, shift, scale):
    """adaLN modulate in fp32 (etta_transformer.py:36-43)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    out = x32 * (1.0 + scale[:, None].astype(jnp.float32)) + shift[:, None].astype(
        jnp.float32
    )
    return out.astype(dtype)


class LayerNormNoAffine(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        y = nn.LayerNorm(epsilon=self.eps, use_bias=False, use_scale=False)(
            x.astype(jnp.float32)
        )
        return y.astype(dtype)


class LayerNormScaleOnly(nn.Module):
    """LayerNorm with weight, no bias, fp32 (etta_transformer.py:127-148)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        y = nn.LayerNorm(epsilon=self.eps, use_bias=False, use_scale=True)(
            x.astype(jnp.float32)
        )
        return y.astype(dtype)


def neox_rope_angles(seq_len: int, dim: int, base: float) -> np.ndarray:
    """Half-split (NeoX / flash-attn) RoPE cos-sin tables [T, dim/2]."""
    inv_freq = 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    t = np.arange(seq_len, dtype=np.float32)
    return np.outer(t, inv_freq)  # [T, dim/2]


def apply_neox_rope(x: jax.Array, base: float) -> jax.Array:
    """Rotate [B, H, T, D] with half-split RoPE over the full head dim."""
    b, h, t, d = x.shape
    ang = jnp.asarray(neox_rope_angles(t, d, base))  # [T, d/2]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    cos = cos[None, None].astype(x.dtype)
    sin = sin[None, None].astype(x.dtype)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


def alibi_bias(
    n_heads: int, t: int, symmetric: bool = True
) -> jax.Array:
    """ALiBi attention bias [1, H, T, T] (etta_transformer.py:16-33):
    slope_h = (2^8)^(-(h+1)/H); bias = slope · rel_pos with
    rel_pos = −|i−j| (symmetric) or (j−i) (asymmetric)."""
    x = jnp.arange(t)[None, :]
    y = jnp.arange(t)[:, None]
    rel = x - y
    if symmetric:
        rel = -jnp.abs(rel)
    base = (2.0**8) ** (1.0 / n_heads)
    slopes = 1.0 / base ** (jnp.arange(1, n_heads + 1, dtype=jnp.float32))
    return (slopes[:, None, None] * rel.astype(jnp.float32))[None]


def _attend(q, k, v, bias=None):
    """[B, H, Tq, D] × [B, H, Tk, D] fused attention, fp32 softmax;
    bf16 operands stay on the MXU with fp32 accumulation."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
    ).astype(v.dtype)


class SelfAttention(nn.Module):
    """Fused-QKV self-attention with NeoX RoPE (etta_transformer.py:244-542).

    use_flash: route through the Pallas flash-attention kernel (the TPU
    analogue of the reference's flash-attn path) when block shapes allow.
    """

    n_heads: int
    rope_base: float = 16384.0
    use_rope: bool = True
    qknorm: Optional[str] = None
    use_flash: bool = False
    pos_emb_name: str = "rope"  # rope | alibi | alibi-asymmetric | ''

    @nn.compact
    def __call__(self, x, mask=None):
        b, t, c = x.shape
        d_head = c // self.n_heads
        qkv = nn.Dense(3 * c, use_bias=False, name="qkv_net")(x)
        qkv = qkv.reshape(b, t, 3, self.n_heads, d_head)
        q, k, v = [jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3)]
        if self.qknorm == "rmsnorm":
            q = nn.RMSNorm(name="norm_q")(q)
            k = nn.RMSNorm(name="norm_k")(k)
        elif self.qknorm == "l2":
            q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-6)
            k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-6)
        use_alibi = self.pos_emb_name.startswith("alibi")
        if self.use_rope and self.pos_emb_name == "rope":
            q = apply_neox_rope(q, self.rope_base)
            k = apply_neox_rope(k, self.rope_base)
        if (
            self.use_flash and not use_alibi
            and t % 128 == 0 and d_head % 64 == 0
        ):
            from audio_intelligence_tpu.ops.pallas_attention import flash_attention

            out = flash_attention(q, k, v, kv_mask=mask, block_q=128, block_k=128)
        else:
            bias = None
            if use_alibi:  # etta_transformer.py:457-466 naive alibi path
                bias = alibi_bias(
                    self.n_heads, t,
                    symmetric=self.pos_emb_name == "alibi",
                )
            if mask is not None:  # mask [B, T] True = valid
                mbias = jnp.where(mask, 0.0, -1e9)[:, None, None, :]
                bias = mbias if bias is None else bias + mbias
            out = _attend(q, k, v, bias)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, t, c)
        return nn.Dense(c, use_bias=False, name="o_net")(out)


class CrossAttention(nn.Module):
    """Cross-attention; head dim follows d_memory (etta_transformer.py:262-267),
    no positional encoding (flagship context_xattn.pos_emb_name='')."""

    n_heads: int
    d_memory: int

    @nn.compact
    def __call__(self, x, memory, memory_mask=None):
        b, t, c = x.shape
        d_head = self.d_memory // self.n_heads
        inner = self.n_heads * d_head
        q = nn.Dense(inner, use_bias=False, name="q_net")(x)
        kv = nn.Dense(2 * inner, use_bias=False, name="kv_net")(memory)
        tm = memory.shape[1]
        q = q.reshape(b, t, self.n_heads, d_head).transpose(0, 2, 1, 3)
        kv = kv.reshape(b, tm, 2, self.n_heads, d_head)
        k = kv[:, :, 0].transpose(0, 2, 1, 3)
        v = kv[:, :, 1].transpose(0, 2, 1, 3)
        bias = None
        if memory_mask is not None:  # [B, Tm] True = valid
            bias = jnp.where(memory_mask, 0.0, -1e9)[:, None, None, :]
        out = _attend(q, k, v, bias)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, t, inner)
        return nn.Dense(c, use_bias=False, name="o_net")(out)


class PositionwiseConvFF(nn.Module):
    """conv(k) → GELU(tanh) → conv(k), no bias (etta_transformer.py:213-241).
    kernel_size 1 (flagship) is a plain matmul."""

    d_model: int
    kernel_size: int = 1
    p_dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        pad = (self.kernel_size - 1) // 2
        h = nn.Conv(
            self.d_model * 4, (self.kernel_size,), padding=pad, use_bias=False,
            name="proj",
        )(x)
        h = jax.nn.gelu(h, approximate=True)
        h = nn.Conv(
            self.d_model, (self.kernel_size,), padding=pad, use_bias=False,
            name="o_net",
        )(h)
        return nn.Dropout(self.p_dropout, deterministic=deterministic)(h)


class ETTADiTBlock(nn.Module):
    """adaLN-Zero DiT block (etta_transformer.py:817-954)."""

    d_model: int
    n_heads: int
    xattn_heads: int = 16
    xattn_d_memory: int = 768
    kernel_size: int = 1
    p_dropout: float = 0.1
    rope_base: float = 16384.0
    has_xattn: bool = True
    apply_norm_to_cond: bool = True
    qknorm: Optional[str] = None

    @nn.compact
    def __call__(
        self, x, cond, global_cond, x_mask=None, cond_mask=None, deterministic=True
    ):
        mod = nn.Dense(
            9 * self.d_model,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="adaLN_modulation",
        )(jax.nn.silu(global_cond))
        (
            shift_msa, scale_msa, gate_msa,
            shift_mxa, scale_mxa, gate_mxa,
            shift_mlp, scale_mlp, gate_mlp,
        ) = jnp.split(mod, 9, axis=-1)

        valid = (
            x_mask[..., None].astype(x.dtype)
            if x_mask is not None
            else jnp.ones((x.shape[0], x.shape[1], 1), x.dtype)
        )

        h = modulate(LayerNormNoAffine(name="norm_self")(x), shift_msa, scale_msa)
        h = SelfAttention(
            self.n_heads, rope_base=self.rope_base, qknorm=self.qknorm,
            name="self_attention",
        )(h, mask=x_mask)
        x = (x + gate_msa[:, None] * h) * valid

        if self.has_xattn and cond is not None:
            h = modulate(
                LayerNormNoAffine(name="norm_xattn_self")(x), shift_mxa, scale_mxa
            )
            memory = cond
            if self.apply_norm_to_cond:
                memory = LayerNormScaleOnly(name="norm_xattn_cross")(cond)
            h = CrossAttention(
                self.xattn_heads, self.xattn_d_memory, name="cross_attention"
            )(h, memory, memory_mask=cond_mask)
            x = (x + gate_mxa[:, None] * h) * valid

        h = modulate(LayerNormScaleOnly(name="norm_pos_ff")(x), shift_mlp, scale_mlp)
        h = PositionwiseConvFF(
            self.d_model, self.kernel_size, self.p_dropout, name="pos_ff"
        )(h, deterministic=deterministic)
        x = (x + gate_mlp[:, None] * h) * valid
        return x


class FinalLayer(nn.Module):
    """adaLN final projection, zero-init (etta_transformer.py:107-124)."""

    out_channels: int

    @nn.compact
    def __call__(self, x, c):
        d = x.shape[-1]
        mod = nn.Dense(
            2 * d,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="adaLN_modulation",
        )(jax.nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = modulate(LayerNormNoAffine(name="norm_final")(x), shift, scale)
        return nn.Dense(
            self.out_channels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="linear",
        )(x)


class FourierFeatures(nn.Module):
    """Random Fourier timestep features (blocks.py:88-98): f = 2π·x·Wᵀ,
    output cos‖sin."""

    out_features: int = 256
    std: float = 1.0

    @nn.compact
    def __call__(self, x):  # x [B, 1]
        w = self.param(
            "weight",
            lambda key, shape: self.std * jax.random.normal(key, shape),
            (self.out_features // 2, 1),
        )
        f = 2 * jnp.pi * x @ w.T
        return jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)


class MLPProj(nn.Module):
    """Linear → SiLU → Linear (the to_*_embed stacks in dit.py:44-77)."""

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.features, use_bias=self.use_bias, name="fc1")(x)
        return nn.Dense(self.features, use_bias=self.use_bias, name="fc2")(
            jax.nn.silu(h)
        )


class DiffusionTransformer(nn.Module):
    """The full ETTA-DiT denoiser (dit.py DiffusionTransformer, flagship args).

    __call__(x [B, T, io_channels], t [B], cross_attn_cond [B, Tc, cond_token_dim],
    global_cond [B, global_cond_dim]) → [B, T, io_channels].

    CFG (batch-doubling vs zero null-embedding, rescale) lives in
    ``cfg_forward`` so the plain forward stays scan/vmap-friendly.
    """

    io_channels: int = 64
    embed_dim: int = 1536
    depth: int = 24
    num_heads: int = 24
    cond_token_dim: int = 768
    global_cond_dim: int = 1536
    project_cond_tokens: bool = False
    patch_size: int = 1
    kernel_size: int = 1
    p_dropout: float = 0.1
    rope_base: float = 16384.0
    xattn_heads: int = 16
    xattn_d_memory: int = 768
    apply_norm_to_cond: bool = True
    qknorm: Optional[str] = None
    input_concat_dim: int = 0
    # per-block activation rematerialization (the reference's
    # checkpoint() helpers, ETTA models/transformer.py:29): the whole-
    # model jax.checkpoint wrapper is NOT enough for larger train
    # batches — its backward recomputation stores every block's
    # intermediates at once; per-block remat bounds that at one block
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        t,
        cross_attn_cond=None,
        cross_attn_cond_mask=None,
        global_cond=None,
        input_concat_cond=None,
        x_mask=None,
        deterministic: bool = True,
    ):
        b, seq, _ = x.shape

        t_feat = FourierFeatures(256, name="timestep_features")(t[:, None])
        t_embed = nn.Dense(self.embed_dim, name="to_timestep_embed_fc1")(t_feat)
        t_embed = nn.Dense(self.embed_dim, name="to_timestep_embed_fc2")(
            jax.nn.silu(t_embed)
        )

        if cross_attn_cond is not None:
            cond_dim = (
                self.embed_dim if self.project_cond_tokens else self.cond_token_dim
            )
            cross_attn_cond = MLPProj(cond_dim, name="to_cond_embed")(cross_attn_cond)

        if global_cond is not None:
            g = MLPProj(self.embed_dim, name="to_global_embed")(global_cond)
            global_embed = g + t_embed
        else:
            global_embed = t_embed

        if input_concat_cond is not None:
            x = jnp.concatenate([x, input_concat_cond], axis=-1)

        # zero-init pre-conv + residual (dit.py:153-156)
        x = (
            nn.Conv(
                x.shape[-1], (1,), use_bias=False,
                kernel_init=nn.initializers.zeros, name="preprocess_conv",
            )(x)
            + x
        )

        if self.patch_size > 1:
            x = x.reshape(b, seq // self.patch_size, -1)

        h = nn.Conv(self.embed_dim, (1,), name="project_in")(x)
        block_cls = ETTADiTBlock
        if self.remat:
            block_cls = nn.remat(
                ETTADiTBlock,
                policy=jax.checkpoint_policies.nothing_saveable,
                static_argnums=(6,),  # deterministic
            )
        for i in range(self.depth):
            h = block_cls(
                d_model=self.embed_dim,
                n_heads=self.num_heads,
                xattn_heads=self.xattn_heads,
                xattn_d_memory=self.xattn_d_memory,
                kernel_size=self.kernel_size,
                p_dropout=self.p_dropout,
                rope_base=self.rope_base,
                has_xattn=self.cond_token_dim > 0,
                apply_norm_to_cond=self.apply_norm_to_cond,
                qknorm=self.qknorm,
                name=f"block{i}",
            )(h, cross_attn_cond, global_embed, x_mask, cross_attn_cond_mask, deterministic)

        out_ch = self.io_channels * self.patch_size
        out = FinalLayer(out_ch, name="project_out")(h, global_embed)

        if self.patch_size > 1:
            out = out.reshape(b, seq, self.io_channels)

        out = (
            nn.Conv(
                self.io_channels, (1,), use_bias=False,
                kernel_init=nn.initializers.zeros, name="postprocess_conv",
            )(out)
            + out
        )
        return out


def cfg_forward(
    apply_fn,
    x,
    t,
    cross_attn_cond,
    cross_attn_cond_mask=None,
    global_cond=None,
    negative_cross_attn_cond=None,
    cfg_scale: float = 3.5,
    scale_phi: float = 0.0,
    **kwargs,
):
    """Classifier-free guidance by batch-doubling (dit.py:277-390).

    Unconditional branch uses the zero null embedding (or the negative
    conditioning); CFG rescale blends toward the conditional std when
    scale_phi > 0.
    """
    if cfg_scale == 1.0 or cross_attn_cond is None:
        return apply_fn(
            x, t, cross_attn_cond, cross_attn_cond_mask, global_cond, **kwargs
        )

    null = (
        jnp.zeros_like(cross_attn_cond)
        if negative_cross_attn_cond is None
        else negative_cross_attn_cond
    )
    bx = jnp.concatenate([x, x], axis=0)
    bt = jnp.concatenate([t, t], axis=0)
    bc = jnp.concatenate([cross_attn_cond, null], axis=0)
    bm = (
        jnp.concatenate([cross_attn_cond_mask, cross_attn_cond_mask], axis=0)
        if cross_attn_cond_mask is not None
        else None
    )
    bg = (
        jnp.concatenate([global_cond, global_cond], axis=0)
        if global_cond is not None
        else None
    )
    # batch-doubled call: any batched kwargs must double too
    icc = kwargs.get("input_concat_cond")
    if icc is not None:
        kwargs = dict(kwargs, input_concat_cond=jnp.concatenate([icc, icc], axis=0))
    out = apply_fn(bx, bt, bc, bm, bg, **kwargs)
    cond_out, uncond_out = jnp.split(out, 2, axis=0)
    cfg_out = uncond_out + (cond_out - uncond_out) * cfg_scale
    if scale_phi != 0.0:
        cond_std = jnp.std(cond_out, axis=1, keepdims=True)
        cfg_std = jnp.std(cfg_out, axis=1, keepdims=True)
        cfg_out = (
            scale_phi * (cfg_out * (cond_std / jnp.maximum(cfg_std, 1e-8)))
            + (1 - scale_phi) * cfg_out
        )
    return cfg_out
