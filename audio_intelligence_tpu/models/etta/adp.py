"""Legacy 1-D diffusion UNets (audio-diffusion-pytorch / Dance-Diffusion).

Capability parity with ETTA/stable_audio_tools/models/adp.py (UNet1d:1008,
UNetCFG1d:1290 with FixedEmbedding CFG) and models/diffusion.py
DiffusionAttnUnet1D:385-497 (+ blocks.py ResConvBlock:26, SelfAttention1d:38,
SkipBlock:80, FourierFeatures:88, Downsample1d/Upsample1d:115-160). These are
the selectable legacy model types ("adp_cfg_1d", "adp_1d", "dance_diffusion");
the ETTA flagship uses the DiT instead.

TPU-native design notes (not a translation):
- NWC layout ([B, T, C]) so every conv hits XLA's native 1-D conv path.
- FIR up/down-sampling is a depthwise conv with the same linear/cubic
  kernels (reference blocks.py:103-160) via ``feature_group_count``.
- The recursive SkipBlock nesting (diffusion.py:414-462) is built with a
  plain Python loop at trace time — static depth, no dynamic control flow.
- Attention runs as one fused dot-product einsum per level (MXU), matching
  the reference's math (q·scale)·(kᵀ·scale) — i.e. a 1/√d split across both
  operands (blocks.py:68-76).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

_FIR_KERNELS = {
    "linear": [1 / 8, 3 / 8, 3 / 8, 1 / 8],
    "cubic": [
        -0.01171875, -0.03515625, 0.11328125, 0.43359375,
        0.43359375, 0.11328125, -0.03515625, -0.01171875,
    ],
}


class FourierFeatures(nn.Module):
    """x [B, d_in] → [cos(2πxW) ‖ sin(2πxW)] (blocks.py:88-99)."""

    features: int
    std: float = 1.0

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            nn.initializers.normal(self.std),
            (x.shape[-1], self.features // 2),
        )
        f = 2 * math.pi * x @ w.astype(x.dtype)
        return jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)


def _gn1(x, name=None):
    """GroupNorm(1 group) == LayerNorm over (T, C) jointly, fp32 stats."""
    return nn.GroupNorm(num_groups=1, epsilon=1e-5, name=name)(x)


class ResConvBlock1d(nn.Module):
    """conv-GN-GELU ×2 with 1×1-conv skip (blocks.py ResConvBlock:26-36), NWC."""

    c_mid: int
    c_out: int
    kernel_size: int = 5
    is_last: bool = False
    use_snake: bool = False

    @nn.compact
    def __call__(self, x):
        def act(h):
            if self.use_snake:
                a = self.param(f"snake_alpha_{h.shape[-1]}", nn.initializers.ones, (h.shape[-1],))
                a = a.astype(h.dtype)
                return h + (1.0 / (a + 1e-9)) * jnp.sin(a * h) ** 2
            return jax.nn.gelu(h)

        h = nn.Conv(self.c_mid, (self.kernel_size,), padding=self.kernel_size // 2,
                    name="conv0")(x)
        h = act(_gn1(h, name="norm0"))
        h = nn.Conv(self.c_out, (self.kernel_size,), padding=self.kernel_size // 2,
                    name="conv1")(h)
        if not self.is_last:
            h = act(_gn1(h, name="norm1"))
        if x.shape[-1] != self.c_out:
            x = nn.Conv(self.c_out, (1,), use_bias=False, name="skip")(x)
        return x + h


class SelfAttention1d(nn.Module):
    """GN → fused qkv 1×1 conv → MHA → out proj, residual (blocks.py:38-78)."""

    n_head: int = 1

    @nn.compact
    def __call__(self, x):
        b, t, c = x.shape
        h = _gn1(x, name="norm")
        qkv = nn.Conv(c * 3, (1,), name="qkv_proj")(h)
        qkv = qkv.reshape(b, t, 3, self.n_head, c // self.n_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, T, H, hd]
        scale = (c // self.n_head) ** -0.25
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q * scale, k * scale,
            preferred_element_type=jnp.float32,
        )
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        y = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, c)
        return x + nn.Conv(c, (1,), name="out_proj")(y)


def _fir_resample(x, kernel_name: str, up: bool):
    """Depthwise FIR down(stride2)/up(transpose stride2) (blocks.py:115-160)."""
    k = np.asarray(_FIR_KERNELS[kernel_name], np.float32)
    c = x.shape[-1]
    if up:
        k = k * 2
    pad = len(k) // 2 - 1
    kern = jnp.asarray(k, x.dtype)[:, None, None] * jnp.ones((1, 1, c), x.dtype)
    if up:
        # conv_transpose(stride 2, padding 2·pad+1) == zero-stuff between
        # samples then depthwise-correlate (kernel is symmetric, no flip);
        # torch semantics: reflect-pad (pad+1)//2, out length = 2·L
        x = jnp.pad(x, ((0, 0), ((pad + 1) // 2,) * 2, (0, 0)), mode="reflect")
        b, l, _ = x.shape
        stuffed = jnp.stack([x, jnp.zeros_like(x)], axis=2).reshape(b, 2 * l, c)
        stuffed = stuffed[:, : 2 * l - 1]
        edge = len(k) - 1 - (pad * 2 + 1)
        if edge:
            stuffed = jnp.pad(stuffed, ((0, 0), (edge,) * 2, (0, 0)))
        return jax.lax.conv_general_dilated(
            stuffed, kern, window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c,
        )
    x = jnp.pad(x, ((0, 0), (pad,) * 2, (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(2,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c,
    )


class DiffusionAttnUnet1D(nn.Module):
    """Dance-Diffusion UNet (diffusion.py:385-497): recursive skip structure,
    FIR cubic resampling, 3 ResConvBlocks (+attention at deep levels) per
    side. ``cond`` [B, T', D] is linearly resized to T and channel-concat.

    The reference halves every parameter at init (diffusion.py:464-467);
    use ``scale_params(params, 0.5)`` after ``init`` for that behavior.
    """

    io_channels: int = 2
    depth: int = 14
    n_attn_layers: int = 6
    channels: Sequence[int] = (128, 128, 256, 256) + (512,) * 10
    cond_dim: int = 0
    kernel_size: int = 5

    @nn.compact
    def __call__(self, x, t, cond=None):
        """x [B, T, io_channels], t [B] → [B, T, io_channels]."""
        te = FourierFeatures(16, name="timestep_embed")(t[:, None])
        te = jnp.broadcast_to(te[:, None, :], (x.shape[0], x.shape[1], 16))
        inputs = [x.astype(te.dtype), te]
        if cond is not None:
            if cond.shape[1] != x.shape[1]:
                cond = jax.image.resize(
                    cond, (cond.shape[0], x.shape[1], cond.shape[2]), "linear"
                )
            inputs.append(cond.astype(te.dtype))
        h = jnp.concatenate(inputs, axis=-1)

        attn_from = self.depth - self.n_attn_layers
        ch = list(self.channels)

        def conv(cm, co, name, is_last=False):
            return ResConvBlock1d(cm, co, self.kernel_size, is_last=is_last, name=name)

        def level(h, i):
            """Level i (i: 1 → depth). Levels ≥ 2 are the reference's
            SkipBlock: return cat(main(h), h) — so the caller consumes the
            2× channel concat directly (diffusion.py:425-462, blocks.py:80-86)."""
            c = ch[i - 1]
            if i == 1:
                h = conv(c, c, "in0")(h)
                h = conv(c, c, "in1")(h)
                h = conv(c, c, "in2")(h)
                if self.depth >= 2:
                    h = level(h, 2)  # [B, T, 2c]
                h = conv(c, c, "out0")(h)
                h = conv(c, c, "out1")(h)
                return conv(c, self.io_channels, "out2", is_last=True)(h)
            add_attn = i >= attn_from and self.n_attn_layers > 0
            c_prev = ch[i - 2]
            nm = f"lvl{i}_"
            g = _fir_resample(h, "cubic", up=False)
            g = conv(c, c, nm + "d0")(g)
            if add_attn:
                g = SelfAttention1d(max(1, c // 32), name=nm + "a0")(g)
            g = conv(c, c, nm + "d1")(g)
            if add_attn:
                g = SelfAttention1d(max(1, c // 32), name=nm + "a1")(g)
            g = conv(c, c, nm + "d2")(g)
            if add_attn:
                g = SelfAttention1d(max(1, c // 32), name=nm + "a2")(g)
            if i < self.depth:
                g = level(g, i + 1)  # inner SkipBlock returns 2c channels
            g = conv(c, c, nm + "u0")(g)
            if add_attn:
                g = SelfAttention1d(max(1, c // 32), name=nm + "a3")(g)
            g = conv(c, c, nm + "u1")(g)
            if add_attn:
                g = SelfAttention1d(max(1, c // 32), name=nm + "a4")(g)
            g = conv(c, c_prev, nm + "u2")(g)
            if add_attn:
                g = SelfAttention1d(max(1, c_prev // 32), name=nm + "a5")(g)
            g = _fir_resample(g, "cubic", up=True)
            return jnp.concatenate([g, h], axis=-1)

        return level(h, 1)


def scale_params(params, factor: float = 0.5):
    """The reference's post-init ``param *= 0.5`` (diffusion.py:464-467)."""
    return jax.tree.map(lambda p: p * factor, params)


class UNet1d(nn.Module):
    """Compact a-unet style 1-D UNet (adp.py UNet1d:1008-1289 capabilities):
    multiplier/factor/num_blocks/attention schedules, Fourier t-embedding →
    MLP modulation, optional cross-attention on ``embedding`` at attention
    levels. NWC."""

    in_channels: int = 2
    channels: int = 128
    multipliers: Sequence[int] = (1, 2, 4, 4)
    factors: Sequence[int] = (4, 4, 2)
    num_blocks: Sequence[int] = (2, 2, 2)
    attentions: Sequence[int] = (0, 0, 1)
    attention_heads: int = 8
    embedding_features: int | None = None

    @nn.compact
    def __call__(self, x, t, embedding=None, embedding_mask=None):
        te = FourierFeatures(self.channels, name="to_time")(t[:, None])
        te = nn.Dense(self.channels * 4, name="t_mlp0")(te)
        te = nn.Dense(self.channels * 4, name="t_mlp1")(jax.nn.silu(te))

        def film(h, name):
            ss = nn.Dense(2 * h.shape[-1], name=name)(jax.nn.silu(te))
            scale, shift = jnp.split(ss[:, None, :].astype(h.dtype), 2, axis=-1)
            return h * (1 + scale) + shift

        def xattn(h, name):
            if embedding is None:
                return h
            b, tt, c = h.shape
            hd = c // self.attention_heads
            q = nn.Dense(c, name=name + "_q")(_gn1(h, name=name + "_n"))
            k = nn.Dense(c, name=name + "_k")(embedding.astype(h.dtype))
            v = nn.Dense(c, name=name + "_v")(embedding.astype(h.dtype))
            split = lambda z: z.reshape(b, -1, self.attention_heads, hd)
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", split(q) / math.sqrt(hd), split(k),
                preferred_element_type=jnp.float32,
            )
            if embedding_mask is not None:
                logits = jnp.where(
                    embedding_mask[:, None, None, :], logits, -1e9
                )
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", probs, split(v)).reshape(b, tt, c)
            return h + nn.Dense(c, name=name + "_o")(o)

        chs = [self.channels * m for m in self.multipliers]
        h = nn.Conv(chs[0], (7,), padding=3, name="in_conv")(x)
        skips = []
        for li, (f, nb) in enumerate(zip(self.factors, self.num_blocks)):
            for bi in range(nb):
                h = ResConvBlock1d(chs[li], chs[li], name=f"d{li}_{bi}")(h)
                h = film(h, f"d{li}_{bi}_film")
                if self.attentions[li]:
                    h = SelfAttention1d(self.attention_heads, name=f"d{li}_{bi}_attn")(h)
                    h = xattn(h, f"d{li}_{bi}_xattn")
            skips.append(h)
            h = nn.Conv(chs[li + 1], (2 * f,), strides=f, padding=f // 2,
                        name=f"down{li}")(h)
        h = ResConvBlock1d(chs[-1], chs[-1], name="mid0")(h)
        h = SelfAttention1d(self.attention_heads, name="mid_attn")(h)
        h = xattn(h, "mid_xattn")
        h = ResConvBlock1d(chs[-1], chs[-1], name="mid1")(h)
        for li in reversed(range(len(self.factors))):
            f = self.factors[li]
            h = nn.ConvTranspose(chs[li], (2 * f,), strides=(f,), padding="SAME",
                                 name=f"up{li}")(h)
            h = h[:, : skips[li].shape[1]]
            h = jnp.concatenate([h, skips[li]], axis=-1)
            for bi in range(self.num_blocks[li]):
                h = ResConvBlock1d(chs[li], chs[li], name=f"u{li}_{bi}")(h)
                h = film(h, f"u{li}_{bi}_film")
                if self.attentions[li]:
                    h = SelfAttention1d(self.attention_heads, name=f"u{li}_{bi}_attn")(h)
                    h = xattn(h, f"u{li}_{bi}_xattn")
        return nn.Conv(self.in_channels, (7,), padding=3, name="out_conv")(h)


class UNetCFG1d(nn.Module):
    """UNet1d + classifier-free guidance on the text embedding
    (adp.py UNetCFG1d:1290-1412): a learned FixedEmbedding replaces the
    real embedding with probability ``embedding_mask_proba`` at train time;
    at inference ``embedding_scale`` blends cond/uncond predictions."""

    in_channels: int = 2
    channels: int = 128
    multipliers: Sequence[int] = (1, 2, 4, 4)
    factors: Sequence[int] = (4, 4, 2)
    num_blocks: Sequence[int] = (2, 2, 2)
    attentions: Sequence[int] = (0, 0, 1)
    attention_heads: int = 8
    embedding_max_length: int = 64
    embedding_features: int = 768

    def setup(self):
        self.unet = UNet1d(
            in_channels=self.in_channels,
            channels=self.channels,
            multipliers=self.multipliers,
            factors=self.factors,
            num_blocks=self.num_blocks,
            attentions=self.attentions,
            attention_heads=self.attention_heads,
            embedding_features=self.embedding_features,
        )
        self.fixed_embedding = self.param(
            "fixed_embedding",
            nn.initializers.normal(1.0),
            (self.embedding_max_length, self.embedding_features),
        )

    def __call__(
        self,
        x,
        t,
        embedding,
        embedding_mask=None,
        *,
        embedding_mask_proba: float = 0.0,
        embedding_scale: float = 1.0,
        rng=None,
    ):
        b = x.shape[0]
        null = jnp.broadcast_to(
            self.fixed_embedding[None, : embedding.shape[1]].astype(embedding.dtype),
            embedding.shape,
        )
        if embedding_mask_proba > 0.0 and rng is not None:
            drop = jax.random.bernoulli(rng, embedding_mask_proba, (b, 1, 1))
            embedding = jnp.where(drop, null, embedding)
        if embedding_scale != 1.0:
            out_c = self.unet(x, t, embedding, embedding_mask)
            out_u = self.unet(x, t, null, embedding_mask)
            return out_u + (out_c - out_u) * embedding_scale
        return self.unet(x, t, embedding, embedding_mask)
