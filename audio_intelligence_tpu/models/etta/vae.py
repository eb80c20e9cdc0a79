"""Oobleck VAE — the ETTA waveform codec, TPU-native flax.

Capability parity with the reference (ETTA/stable_audio_tools/models/
autoencoders.py: ResidualUnit:66, EncoderBlock:133, DecoderBlock:211,
OobleckEncoder:322, OobleckDecoder:407, AudioAutoencoder:542) and
blocks.py SnakeBeta:315. Flagship: stereo 44.1 kHz → 64-dim latent at
~21.5 Hz via strides (2,4,4,8,8) ⇒ ×2048 (etta_vae.json).

TPU-first notes:
- NWC layout ([B, T, C]) so channels ride the 128-lane dim and convs hit
  the MXU as implicit matmuls.
- Weight-norm is an explicit reparameterization (direction v ‖ scale g)
  with the norm axes matching torch's ``weight_norm(dim=0)`` for both conv
  (per-out-channel) and transposed conv (per-in-channel) so reference
  checkpoints convert 1:1.
- snake-beta is elementwise (x + exp(−β)·sin²(exp(α)·x)) — XLA fuses it
  into the surrounding convs.
- Chunked streaming encode/decode for arbitrarily long audio mirrors the
  reference's overlap-32-latent scheme (autoencoders.py:766-905).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


def snake_beta(x, alpha, beta, eps: float = 1e-9):
    """x + (1/(β+ε))·sin²(α·x)  (blocks.py:305-306)."""
    return x + (1.0 / (beta + eps)) * jnp.square(jnp.sin(x * alpha))


class SnakeBeta(nn.Module):
    """Per-channel trainable snake activation, log-scale α/β init 0
    (blocks.py:315-343). Input [..., C]."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        alpha = self.param("alpha", nn.initializers.zeros, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        return snake_beta(x, jnp.exp(alpha), jnp.exp(beta))


class WNConv(nn.Module):
    """1-D weight-normalized conv, NWC, torch-compatible padding.

    kernel param layout [kw, in, out]; g normalizes over (kw, in) per out
    channel (torch ``weight_norm(Conv1d)`` dim=0 semantics).
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: int | str = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        v = self.param(
            "v",
            nn.initializers.he_uniform(),
            (self.kernel_size, in_ch, self.features),
        )
        g = self.param(
            "g",
            lambda key, shape: jnp.linalg.norm(
                v.reshape(-1, self.features), axis=0
            ),
            (self.features,),
        )
        norm = jnp.linalg.norm(v.reshape(-1, self.features), axis=0)
        kernel = (v * (g / jnp.maximum(norm, 1e-12))).astype(x.dtype)

        pad = (
            [(self.padding, self.padding)]
            if isinstance(self.padding, int)
            else self.padding
        )
        out = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride,),
            padding=pad,
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias
        return out


class WNConvTranspose(nn.Module):
    """1-D weight-normalized transposed conv, torch semantics:
    out_len = (L−1)·stride − 2·padding + kernel_size.

    g normalizes per *input* channel (torch weight_norm dim=0 on the
    (in, out, k) ConvTranspose1d weight)."""

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        v = self.param(
            "v",
            nn.initializers.he_uniform(),
            (self.kernel_size, in_ch, self.features),
        )
        # norm over (kw, out) per input channel
        g = self.param(
            "g",
            lambda key, shape: jnp.linalg.norm(
                jnp.transpose(v, (1, 0, 2)).reshape(in_ch, -1), axis=1
            ),
            (in_ch,),
        )
        norm = jnp.linalg.norm(jnp.transpose(v, (1, 0, 2)).reshape(in_ch, -1), axis=1)
        kernel = (v * (g / jnp.maximum(norm, 1e-12))[None, :, None]).astype(x.dtype)

        # torch ConvTranspose1d is the conv adjoint (kernel spatially
        # flipped relative to jax's fractionally-strided correlation).
        out = jax.lax.conv_transpose(
            x,
            kernel[::-1],
            strides=(self.stride,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.padding > 0:
            out = out[:, self.padding : out.shape[1] - self.padding, :]
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias
        return out


class ResidualUnit(nn.Module):
    """snake → dilated WNConv(k=7) → snake → WNConv(k=1), residual
    (autoencoders.py:66-130)."""

    channels: int
    dilation: int
    kernel_size: int = 7

    @nn.compact
    def __call__(self, x):
        pad = (self.dilation * (self.kernel_size - 1)) // 2
        h = SnakeBeta(name="act1")(x)
        h = WNConv(
            self.channels, self.kernel_size, dilation=self.dilation, padding=pad,
            name="conv1",
        )(h)
        h = SnakeBeta(name="act2")(h)
        h = WNConv(self.channels, 1, name="conv2")(h)
        return x + h


class EncoderBlock(nn.Module):
    """3 dilated residual units → snake → strided downsample conv."""

    out_channels: int
    stride: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        for i, d in enumerate((1, 3, 9)):
            x = ResidualUnit(in_ch, d, name=f"res{i}")(x)
        x = SnakeBeta(name="act")(x)
        x = WNConv(
            self.out_channels,
            2 * self.stride,
            stride=self.stride,
            padding=math.ceil(self.stride / 2),
            name="down",
        )(x)
        return x


class DecoderBlock(nn.Module):
    """snake → transposed upsample conv → 3 dilated residual units."""

    out_channels: int
    stride: int

    @nn.compact
    def __call__(self, x):
        x = SnakeBeta(name="act")(x)
        # even strides: torch-parity k=2s, p=⌈s/2⌉ (exact ×s). Odd strides
        # (e.g. the codec's ×5) need k=2s+1, p=(s+1)/2 to keep out = L·s.
        if self.stride % 2 == 0:
            k, p = 2 * self.stride, math.ceil(self.stride / 2)
        else:
            k, p = 2 * self.stride + 1, (self.stride + 1) // 2
        x = WNConvTranspose(
            self.out_channels,
            k,
            stride=self.stride,
            padding=p,
            name="up",
        )(x)
        for i, d in enumerate((1, 3, 9)):
            x = ResidualUnit(self.out_channels, d, name=f"res{i}")(x)
        return x


class OobleckEncoder(nn.Module):
    """Waveform [B, T, in_channels] → latent [B, T/∏strides, latent_dim]."""

    in_channels: int = 2
    channels: int = 128
    latent_dim: int = 128  # 2× the VAE latent (mean ‖ scale)
    c_mults: Sequence[int] = (1, 2, 4, 8, 16)
    strides: Sequence[int] = (2, 4, 4, 8, 8)

    @nn.compact
    def __call__(self, x):
        c_mults = [1] + list(self.c_mults)
        x = WNConv(c_mults[0] * self.channels, 7, padding=3, name="first_conv")(x)
        for i, s in enumerate(self.strides):
            x = EncoderBlock(c_mults[i + 1] * self.channels, s, name=f"block{i}")(x)
        x = SnakeBeta(name="final_act")(x)
        x = WNConv(self.latent_dim, 3, padding=1, name="final_conv")(x)
        return x


class OobleckDecoder(nn.Module):
    """Latent [B, L, latent_dim] → waveform [B, L·∏strides, out_channels]."""

    out_channels: int = 2
    channels: int = 128
    latent_dim: int = 64
    c_mults: Sequence[int] = (1, 2, 4, 8, 16)
    strides: Sequence[int] = (2, 4, 4, 8, 8)
    final_tanh: bool = False

    @nn.compact
    def __call__(self, x):
        c_mults = [1] + list(self.c_mults)
        x = WNConv(c_mults[-1] * self.channels, 7, padding=3, name="first_conv")(x)
        depth = len(c_mults)
        for j, i in enumerate(range(depth - 1, 0, -1)):
            x = DecoderBlock(
                c_mults[i - 1] * self.channels, self.strides[i - 1], name=f"block{j}"
            )(x)
        x = SnakeBeta(name="final_act")(x)
        x = WNConv(self.out_channels, 7, padding=3, use_bias=False, name="final_conv")(x)
        if self.final_tanh:
            x = jnp.tanh(x)
        return x


class AudioAutoencoder(nn.Module):
    """Encoder + bottleneck + decoder composite (autoencoders.py:542-905).

    ``encode`` returns (latents, info); with the VAE bottleneck the encoder
    emits 2×latent_dim channels split into (mean, scale).
    """

    encoder: nn.Module
    decoder: nn.Module
    bottleneck: nn.Module | None = None
    downsampling_ratio: int = 2048
    io_channels: int = 2
    sample_rate: int = 44100

    def encode(self, x, rng=None, return_info: bool = False):
        h = self.encoder(x)
        info = {}
        if self.bottleneck is not None:
            h, info = self.bottleneck.encode(h, rng)
        return (h, info) if return_info else h

    def decode(self, z):
        if self.bottleneck is not None:
            z = self.bottleneck.decode(z)
        return self.decoder(z)

    def __call__(self, x, rng=None):
        z, info = self.encode(x, rng=rng, return_info=True)
        return self.decode(z), info


def chunked_apply(
    apply_fn,
    x: jax.Array,
    in_chunk: int,
    out_chunk: int,
    in_overlap: int,
    out_overlap: int,
) -> jax.Array:
    """Streaming overlap-chunked encode/decode for arbitrarily long audio.

    Mirrors the reference's stitching (autoencoders.py:766-905): slide
    windows of ``in_chunk`` frames with ``in_chunk − in_overlap`` hop, map
    each through ``apply_fn`` ([B, in_chunk, C] → [B, out_chunk, C']),
    discard half the overlap at interior seams, place the final window
    flush against the end. Chunk evaluation is a ``lax.map`` so memory is
    bounded by one chunk's activations.

    For VAE encode: in_chunk = chunk_latents·ratio, out_chunk = chunk_latents.
    For decode: in_chunk = chunk_latents, out_chunk = chunk_latents·ratio.
    """
    total = x.shape[1]
    if total <= in_chunk:
        return apply_fn(x)
    hop = in_chunk - in_overlap
    n_interior = (total - in_chunk) // hop + 1
    has_tail = (n_interior - 1) * hop + in_chunk != total
    starts = [i * hop for i in range(n_interior)]
    if has_tail:
        starts.append(total - in_chunk)
    num_chunks = len(starts)

    chunks = jnp.stack([x[:, s : s + in_chunk] for s in starts])  # [N, B, T, C]
    ys = jax.lax.map(apply_fn, chunks)  # [N, B, out_chunk, C']

    scale = out_chunk / in_chunk
    out_total = int(round(total * scale))
    ol = out_overlap // 2
    pieces = []
    cursor = 0
    for i in range(num_chunks):
        t_start = out_total - out_chunk if i == num_chunks - 1 else int(starts[i] * scale)
        c_start = 0 if i == 0 else ol
        c_end = out_chunk if i == num_chunks - 1 else out_chunk - ol
        # clip against what previous pieces already covered
        skip = max(0, cursor - (t_start + c_start))
        c_start += skip
        pieces.append(ys[i][:, c_start:c_end])
        cursor = t_start + c_end
    return jnp.concatenate(pieces, axis=1)
