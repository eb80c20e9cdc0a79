"""Xcodec — the reference's pretrained audio tokenizer, TPU-native flax.

UALM's DiscreteAudioIO wraps HF Xcodec (hubert-general, 8 RVQ streams ×
1024 codes @ 50 Hz on 16 kHz mono — UALM/models/ualm/multimodal_io/
audio.py:203-232). This is a from-scratch flax implementation of that
architecture plus a weight converter, so converted Xcodec checkpoints
tokenize/detokenize audio with reference numerics on TPU:

- acoustic path: DAC encoder/decoder (snake activations, dilated residual
  units; Xcodec variant — ConvTranspose output_padding = stride % 2 and
  no final tanh),
- semantic path: HuBERT (conv feature extractor, conv positional
  embedding, post-LN transformer; hidden-state mean) → SemanticEncoder,
- fusion fc + residual vector quantizer (Euclidean codebooks),
- decode: RVQ sum → fc2 → acoustic decoder.

Everything is [B, T, C] (NLC) internally; the converter transposes torch
[out, in, k] Conv1d weights to [k, in, out]. Parity is gated against
``transformers.XcodecModel`` executed on random tiny configs in
tests/test_xcodec_parity.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


@dataclass(frozen=True)
class XcodecTowerConfig:
    # acoustic (DAC)
    acoustic_hidden: int = 256  # DAC latent width
    encoder_hidden: int = 64
    decoder_hidden: int = 1024
    ratios: tuple = (8, 5, 4, 2)  # encoder downsampling ratios
    up_ratios: tuple | None = None  # decoder upsampling (defaults to ratios)
    # semantic (HuBERT)
    semantic_hidden: int = 768
    hubert_conv_dim: tuple = (512,) * 7
    hubert_conv_stride: tuple = (5, 2, 2, 2, 2, 2, 2)
    hubert_conv_kernel: tuple = (10, 3, 3, 3, 3, 2, 2)
    hubert_layers: int = 12
    hubert_heads: int = 12
    hubert_ffn: int = 3072
    hubert_pos_kernel: int = 128
    hubert_pos_groups: int = 16
    # semantic codec head
    kernel_size: int = 3
    channel_ratios: tuple = (1.0, 1.0)
    strides: tuple = (1, 1)
    block_dilations: tuple = (1, 1)
    unit_kernel_size: int = 3
    # quantizer
    num_quantizers: int = 8
    codebook_size: int = 1024

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.ratios))

    @property
    def upsampling(self) -> tuple:
        return self.up_ratios or self.ratios

    @property
    def fused_hidden(self) -> int:
        return self.acoustic_hidden + self.semantic_hidden

    @staticmethod
    def tiny():
        return XcodecTowerConfig(
            acoustic_hidden=32, encoder_hidden=16, decoder_hidden=32,
            ratios=(4, 5), semantic_hidden=32, hubert_conv_dim=(16, 16, 16),
            hubert_conv_stride=(5, 2, 2), hubert_conv_kernel=(10, 3, 3),
            hubert_layers=2, hubert_heads=2, hubert_ffn=64,
            hubert_pos_kernel=16, hubert_pos_groups=2,
            num_quantizers=8, codebook_size=64,
        )


def _conv1d(x, kernel, bias=None, stride=1, padding=0, dilation=1, groups=1):
    """torch-semantics Conv1d on [B, T, C] with flax [k, in/g, out] kernel."""
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=((padding, padding),),
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if bias is not None:
        y = y + bias
    return y


class TConv1d(nn.Module):
    """torch-parity Conv1d module ([B, T, C] NLC)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, x.shape[-1] // self.groups, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return _conv1d(
            x, kernel.astype(x.dtype),
            bias.astype(x.dtype) if bias is not None else None,
            self.stride, self.padding, self.dilation, self.groups,
        )


class TConvTranspose1d(nn.Module):
    """torch-parity ConvTranspose1d: out = (L−1)s − 2p + k + output_padding."""

    features: int
    kernel_size: int
    stride: int
    padding: int
    output_padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, in_ch, self.features),
        )
        out = jax.lax.conv_transpose(
            x,
            kernel[::-1].astype(x.dtype),  # torch adjoint = flipped kernel
            strides=(self.stride,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        end = out.shape[1] - self.padding + self.output_padding
        out = out[:, self.padding : end, :]
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias.astype(out.dtype)
        return out


class Snake1d(nn.Module):
    """x + sin²(αx)/α (modeling_dac.py Snake1d:86-101)."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (x.shape[-1],))
        a = alpha.astype(jnp.float32)[None, None, :]
        x32 = x.astype(jnp.float32)
        y = x32 + jnp.square(jnp.sin(a * x32)) / (a + 1e-9)
        return y.astype(x.dtype)


class DacResidualUnit(nn.Module):
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = Snake1d(name="snake1")(x)
        h = TConv1d(c, 7, padding=3 * self.dilation, dilation=self.dilation,
                    name="conv1")(h)
        h = Snake1d(name="snake2")(h)
        h = TConv1d(c, 1, name="conv2")(h)
        return x + h


class DacEncoder(nn.Module):
    cfg: XcodecTowerConfig

    @nn.compact
    def __call__(self, x):
        """waveform [B, T, 1] → latents [B, T/hop, acoustic_hidden]."""
        cfg = self.cfg
        h = TConv1d(cfg.encoder_hidden, 7, padding=3, name="conv1")(x)
        for i, stride in enumerate(cfg.ratios):
            dim = cfg.encoder_hidden * 2 ** (i + 1)
            for j, d in enumerate((1, 3, 9)):
                h = DacResidualUnit(d, name=f"block{i}_res{j + 1}")(h)
            h = Snake1d(name=f"block{i}_snake")(h)
            h = TConv1d(dim, 2 * stride, stride=stride,
                        padding=math.ceil(stride / 2), name=f"block{i}_down")(h)
        h = Snake1d(name="snake_out")(h)
        return TConv1d(cfg.acoustic_hidden, 3, padding=1, name="conv2")(h)


class DacDecoder(nn.Module):
    """Xcodec's DAC decoder: output_padding = stride % 2 on every
    ConvTranspose and NO final tanh (modeling_xcodec.py
    _adjust_dac_decoder:419-431)."""

    cfg: XcodecTowerConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        h = TConv1d(cfg.decoder_hidden, 7, padding=3, name="conv1")(z)
        for i, stride in enumerate(cfg.upsampling):
            out_dim = cfg.decoder_hidden // 2 ** (i + 1)
            h = Snake1d(name=f"block{i}_snake")(h)
            h = TConvTranspose1d(
                out_dim, 2 * stride, stride=stride,
                padding=math.ceil(stride / 2), output_padding=stride % 2,
                name=f"block{i}_up",
            )(h)
            for j, d in enumerate((1, 3, 9)):
                h = DacResidualUnit(d, name=f"block{i}_res{j + 1}")(h)
        h = Snake1d(name="snake_out")(h)
        return TConv1d(1, 7, padding=3, name="conv2")(h)


class SemanticResidualUnit(nn.Module):
    """ELU → dilated conv(k) → ELU → conv(1), residual, no biases
    (modeling_xcodec.py ResidualUnit:67-91)."""

    kernel_size: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        pad = ((self.kernel_size - 1) // 2) * self.dilation
        h = jax.nn.elu(x)
        h = TConv1d(c, self.kernel_size, padding=pad, dilation=self.dilation,
                    use_bias=False, name="conv1")(h)
        h = jax.nn.elu(h)
        h = TConv1d(c, 1, use_bias=False, name="conv2")(h)
        return x + h


class SemanticEncoder(nn.Module):
    cfg: XcodecTowerConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        c = cfg.semantic_hidden
        h = TConv1d(c, cfg.kernel_size, padding=cfg.kernel_size // 2,
                    use_bias=False, name="conv")(x)
        for i, stride in enumerate(cfg.strides):
            out_c = int(c * cfg.channel_ratios[i])
            for j, d in enumerate(cfg.block_dilations):
                h = SemanticResidualUnit(cfg.unit_kernel_size, d,
                                         name=f"block{i}_res{j}")(h)
            kernel = 3 if stride == 1 else 2 * stride
            h = TConv1d(out_c, kernel, stride=stride,
                        padding=(kernel - 1) // 2, name=f"block{i}_conv")(h)
        return h


class SemanticDecoder(nn.Module):
    cfg: XcodecTowerConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        c = cfg.semantic_hidden
        h = TConv1d(int(c * cfg.channel_ratios[0]), cfg.kernel_size,
                    padding=cfg.kernel_size // 2, use_bias=False, name="conv1")(x)
        for i, stride in enumerate(cfg.strides):
            out_c = (
                int(c * cfg.channel_ratios[i + 1])
                if i < len(cfg.channel_ratios) - 1
                else c
            )
            if stride != 1:
                raise NotImplementedError(
                    "semantic decoder transpose strides unused by Xcodec "
                    "configs (strides are all 1)"
                )
            h = TConv1d(out_c, 3, stride=1, padding=1, name=f"block{i}_conv")(h)
            for j, d in enumerate(cfg.block_dilations):
                h = SemanticResidualUnit(cfg.unit_kernel_size, d,
                                         name=f"block{i}_res{j}")(h)
        return TConv1d(c, cfg.kernel_size, padding=cfg.kernel_size // 2,
                       use_bias=False, name="conv2")(h)


class HubertTower(nn.Module):
    """HuBERT base (post-LN variant, group-norm first conv layer) returning
    the MEAN of all hidden states — exactly Xcodec's
    _extract_semantic_features (modeling_xcodec.py:433-441)."""

    cfg: XcodecTowerConfig

    @nn.compact
    def __call__(self, wav):
        """wav [B, T] → features [B, frames, semantic_hidden]."""
        cfg = self.cfg
        h = wav[..., None]  # [B, T, 1]
        for i, (dim, k, s) in enumerate(
            zip(cfg.hubert_conv_dim, cfg.hubert_conv_kernel, cfg.hubert_conv_stride)
        ):
            h = TConv1d(dim, k, stride=s, use_bias=False, name=f"feat_conv{i}")(h)
            if i == 0:  # feat_extract_norm="group": GroupNorm(dim, dim) on layer 0
                h32 = h.astype(jnp.float32)
                mean = h32.mean(axis=1, keepdims=True)
                var = h32.var(axis=1, keepdims=True)
                g = self.param("feat_gn_scale", nn.initializers.ones, (dim,))
                b = self.param("feat_gn_bias", nn.initializers.zeros, (dim,))
                h = ((h32 - mean) * jax.lax.rsqrt(var + 1e-5) * g + b).astype(h.dtype)
            h = jax.nn.gelu(h, approximate=False)

        h = nn.LayerNorm(epsilon=1e-5, name="feat_proj_norm")(h)
        h = nn.Dense(cfg.semantic_hidden, name="feat_proj")(h)

        # conv positional embedding (grouped, weight-normed in torch; the
        # converter bakes the effective weight) + same-pad trim for even k
        pos = TConv1d(
            cfg.semantic_hidden, cfg.hubert_pos_kernel,
            padding=cfg.hubert_pos_kernel // 2, groups=cfg.hubert_pos_groups,
            name="pos_conv",
        )(h)
        if cfg.hubert_pos_kernel % 2 == 0:
            pos = pos[:, :-1]
        h = h + jax.nn.gelu(pos, approximate=False)
        h = nn.LayerNorm(epsilon=1e-5, name="encoder_norm")(h)

        total = h  # hidden-state running mean numerator
        n_heads = cfg.hubert_heads
        hd = cfg.semantic_hidden // n_heads
        for i in range(cfg.hubert_layers):
            name = f"layer{i}"
            res = h
            b, t, dmodel = h.shape
            q = nn.Dense(dmodel, name=f"{name}_q")(h).reshape(b, t, n_heads, hd)
            k = nn.Dense(dmodel, name=f"{name}_k")(h).reshape(b, t, n_heads, hd)
            v = nn.Dense(dmodel, name=f"{name}_v")(h).reshape(b, t, n_heads, hd)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q / np.sqrt(hd), k).astype(
                jnp.float32
            )
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, dmodel)
            h = res + nn.Dense(dmodel, name=f"{name}_o")(o)
            h = nn.LayerNorm(epsilon=1e-5, name=f"{name}_ln")(h)
            res = h
            f = nn.Dense(cfg.hubert_ffn, name=f"{name}_ff1")(h)
            f = jax.nn.gelu(f, approximate=False)
            h = res + nn.Dense(dmodel, name=f"{name}_ff2")(f)
            h = nn.LayerNorm(epsilon=1e-5, name=f"{name}_final_ln")(h)
            total = total + h
        return total / (cfg.hubert_layers + 1)


class XcodecRVQ(nn.Module):
    """Euclidean residual VQ (modeling_xcodec.py:214-318)."""

    cfg: XcodecTowerConfig

    def setup(self):
        self.codebooks = self.param(
            "codebooks",
            nn.initializers.normal(1.0),
            (self.cfg.num_quantizers, self.cfg.codebook_size, self.cfg.fused_hidden),
        )

    def encode(self, e):
        """[B, T, D] → codes [B, T, n_q]."""
        residual = e.astype(jnp.float32)
        codes = []
        for qi in range(self.cfg.num_quantizers):
            cb = self.codebooks[qi].astype(jnp.float32)  # [K, D]
            dots = jnp.einsum("btd,kd->btk", residual, cb)
            d2 = -2.0 * dots + jnp.sum(cb * cb, axis=-1)[None, None, :]
            idx = jnp.argmin(d2, axis=-1)
            codes.append(idx)
            residual = residual - cb[idx]
        return jnp.stack(codes, axis=-1)

    def decode(self, codes):
        """codes [B, T, n_q] → [B, T, D]."""
        out = 0.0
        for qi in range(self.cfg.num_quantizers):
            out = out + self.codebooks[qi][codes[..., qi]]
        return out


class XcodecFlax(nn.Module):
    """encode(wav [B, T]) → codes [B, frames, n_q];
    decode(codes) → wav [B, T]. HF layout adapters live in the tests."""

    cfg: XcodecTowerConfig

    def setup(self):
        self.acoustic_encoder = DacEncoder(self.cfg)
        self.acoustic_decoder = DacDecoder(self.cfg)
        self.encoder_semantic = SemanticEncoder(self.cfg)
        self.decoder_semantic = SemanticDecoder(self.cfg)
        self.semantic_model = HubertTower(self.cfg)
        self.fc = nn.Dense(self.cfg.fused_hidden)
        self.fc1 = nn.Dense(self.cfg.semantic_hidden)
        self.fc2 = nn.Dense(self.cfg.acoustic_hidden)
        self.quantizer = XcodecRVQ(self.cfg)

    def encode(self, wav):
        cfg = self.cfg
        pad = cfg.hop_length // 2
        padded = jnp.pad(wav, ((0, 0), (pad, pad)))
        sem_feat = self.semantic_model(padded)  # [B, frames, sem]
        e_semantic = self.encoder_semantic(sem_feat)
        e_acoustic = self.acoustic_encoder(wav[..., None])
        if e_acoustic.shape[1] != e_semantic.shape[1]:
            e_acoustic = self.acoustic_encoder(padded[..., None])
        t = min(e_acoustic.shape[1], e_semantic.shape[1])
        fused = jnp.concatenate(
            [e_acoustic[:, :t], e_semantic[:, :t]], axis=-1
        )
        fused = self.fc(fused)
        return self.quantizer.encode(fused)

    def decode(self, codes):
        quantized = self.quantizer.decode(codes)
        z = self.fc2(quantized.astype(jnp.float32))
        wav = self.acoustic_decoder(z)
        return wav[..., 0]

    def __call__(self, wav):
        return self.decode(self.encode(wav))


# ---------------------------------------------------------------------------
# HF → flax conversion
# ---------------------------------------------------------------------------


def infer_xcodec_config(sd: dict) -> XcodecTowerConfig:
    """XcodecTowerConfig from a transformers XcodecModel state dict."""
    enc_hidden = sd["acoustic_encoder.conv1.weight"].shape[0]
    acoustic_hidden = sd["acoustic_encoder.conv2.weight"].shape[0]
    dec_hidden = sd["acoustic_decoder.conv1.weight"].shape[0]
    n_blocks = 1 + max(
        int(k.split(".")[2]) for k in sd
        if k.startswith("acoustic_encoder.block.")
    )
    ratios = []
    for i in range(n_blocks):
        w = sd[f"acoustic_encoder.block.{i}.conv1.weight"]
        ratios.append(w.shape[-1] // 2)  # kernel = 2·stride
    n_up = 1 + max(
        int(k.split(".")[2]) for k in sd
        if k.startswith("acoustic_decoder.block.")
    )
    up_ratios = tuple(
        sd[f"acoustic_decoder.block.{i}.conv_t1.weight"].shape[-1] // 2
        for i in range(n_up)
    )
    feat_layers = 1 + max(
        int(k.split(".")[3]) for k in sd
        if k.startswith("semantic_model.feature_extractor.conv_layers.")
    )
    conv_dim, conv_kernel, conv_stride = [], [], []
    for i in range(feat_layers):
        w = sd[f"semantic_model.feature_extractor.conv_layers.{i}.conv.weight"]
        conv_dim.append(w.shape[0])
        conv_kernel.append(w.shape[-1])
    # strides are not recoverable from shapes — HuBERT convention
    conv_stride = [5] + [2] * (feat_layers - 1)
    sem_hidden = sd["semantic_model.feature_projection.projection.weight"].shape[0]
    n_layers = 1 + max(
        int(k.split(".")[3]) for k in sd
        if k.startswith("semantic_model.encoder.layers.")
    )
    pos_w = sd.get(
        "semantic_model.encoder.pos_conv_embed.conv.parametrizations.weight.original1",
        sd.get("semantic_model.encoder.pos_conv_embed.conv.weight"),
    )
    n_q = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("quantizer.quantizers.")
    )
    cb = sd["quantizer.quantizers.0.codebook.embed"]
    return XcodecTowerConfig(
        acoustic_hidden=acoustic_hidden,
        encoder_hidden=enc_hidden,
        decoder_hidden=dec_hidden,
        ratios=tuple(ratios),
        up_ratios=up_ratios,
        semantic_hidden=sem_hidden,
        hubert_conv_dim=tuple(conv_dim),
        hubert_conv_stride=tuple(conv_stride),
        hubert_conv_kernel=tuple(conv_kernel),
        hubert_layers=n_layers,
        hubert_heads=max(2, sem_hidden // 64),
        hubert_ffn=sd[
            "semantic_model.encoder.layers.0.feed_forward.intermediate_dense.weight"
        ].shape[0],
        hubert_pos_kernel=pos_w.shape[-1],
        hubert_pos_groups=sem_hidden // pos_w.shape[1],
        num_quantizers=n_q,
        codebook_size=cb.shape[0],
    )


def convert_hf_xcodec(sd: dict, cfg: XcodecTowerConfig | None = None) -> dict:
    """transformers XcodecModel state dict (numpy values) → flax params."""
    cfg = cfg or infer_xcodec_config(sd)

    def conv(src, bias=True):
        out = {
            "kernel": np.ascontiguousarray(
                np.asarray(sd[src + ".weight"]).transpose(2, 1, 0)
            )
        }
        if bias and src + ".bias" in sd:
            out["bias"] = np.asarray(sd[src + ".bias"])
        return out

    def tconv(src, bias=True):
        # torch ConvTranspose1d weight [in, out, k] → flax [k, in, out]
        out = {
            "kernel": np.ascontiguousarray(
                np.asarray(sd[src + ".weight"]).transpose(2, 0, 1)
            )
        }
        if bias and src + ".bias" in sd:
            out["bias"] = np.asarray(sd[src + ".bias"])
        return out

    def lin(src):
        out = {"kernel": np.ascontiguousarray(np.asarray(sd[src + ".weight"]).T)}
        if src + ".bias" in sd:
            out["bias"] = np.asarray(sd[src + ".bias"])
        return out

    def ln(src):
        return {
            "scale": np.asarray(sd[src + ".weight"]),
            "bias": np.asarray(sd[src + ".bias"]),
        }

    def snake(src):
        return {"alpha": np.asarray(sd[src + ".alpha"]).reshape(-1)}

    def res_unit(src):
        return {
            "snake1": snake(f"{src}.snake1"),
            "conv1": conv(f"{src}.conv1"),
            "snake2": snake(f"{src}.snake2"),
            "conv2": conv(f"{src}.conv2"),
        }

    ae = {"conv1": conv("acoustic_encoder.conv1"),
          "conv2": conv("acoustic_encoder.conv2"),
          "snake_out": snake("acoustic_encoder.snake1")}
    for i in range(len(cfg.ratios)):
        src = f"acoustic_encoder.block.{i}"
        for j in range(3):
            ae[f"block{i}_res{j + 1}"] = res_unit(f"{src}.res_unit{j + 1}")
        ae[f"block{i}_snake"] = snake(f"{src}.snake1")
        ae[f"block{i}_down"] = conv(f"{src}.conv1")

    ad = {"conv1": conv("acoustic_decoder.conv1"),
          "conv2": conv("acoustic_decoder.conv2"),
          "snake_out": snake("acoustic_decoder.snake1")}
    for i in range(len(cfg.upsampling)):
        src = f"acoustic_decoder.block.{i}"
        ad[f"block{i}_snake"] = snake(f"{src}.snake1")
        ad[f"block{i}_up"] = tconv(f"{src}.conv_t1")
        for j in range(3):
            ad[f"block{i}_res{j + 1}"] = res_unit(f"{src}.res_unit{j + 1}")

    def sem_res(src):
        return {"conv1": conv(f"{src}.conv1"), "conv2": conv(f"{src}.conv2")}

    es = {"conv": conv("encoder_semantic.conv")}
    for i in range(len(cfg.strides)):
        src = f"encoder_semantic.conv_blocks.{i}"
        for j in range(len(cfg.block_dilations)):
            es[f"block{i}_res{j}"] = sem_res(f"{src}.res_units.{j}")
        es[f"block{i}_conv"] = conv(f"{src}.conv")

    ds = {"conv1": conv("decoder_semantic.conv1"),
          "conv2": conv("decoder_semantic.conv2")}
    for i in range(len(cfg.strides)):
        src = f"decoder_semantic.conv_blocks.{i}"
        ds[f"block{i}_conv"] = conv(f"{src}.conv")
        for j in range(len(cfg.block_dilations)):
            ds[f"block{i}_res{j}"] = sem_res(f"{src}.res_units.{j}")

    hub: dict = {}
    pre = "semantic_model"
    for i in range(len(cfg.hubert_conv_dim)):
        hub[f"feat_conv{i}"] = conv(
            f"{pre}.feature_extractor.conv_layers.{i}.conv", bias=False
        )
    hub["feat_gn_scale"] = np.asarray(
        sd[f"{pre}.feature_extractor.conv_layers.0.layer_norm.weight"]
    )
    hub["feat_gn_bias"] = np.asarray(
        sd[f"{pre}.feature_extractor.conv_layers.0.layer_norm.bias"]
    )
    hub["feat_proj_norm"] = ln(f"{pre}.feature_projection.layer_norm")
    hub["feat_proj"] = lin(f"{pre}.feature_projection.projection")
    # weight-normed positional conv: bake the effective weight
    key_v = f"{pre}.encoder.pos_conv_embed.conv.parametrizations.weight.original1"
    if key_v in sd:
        v = np.asarray(sd[key_v])  # [out, in/g, k]
        g = np.asarray(
            sd[f"{pre}.encoder.pos_conv_embed.conv.parametrizations.weight.original0"]
        )  # [1, 1, k] — weight_norm(dim=2)
        norm = np.sqrt((v * v).sum(axis=(0, 1), keepdims=True))
        w = v * (g / np.maximum(norm, 1e-12))
    else:
        w = np.asarray(sd[f"{pre}.encoder.pos_conv_embed.conv.weight"])
    hub["pos_conv"] = {
        "kernel": np.ascontiguousarray(w.transpose(2, 1, 0)),
        "bias": np.asarray(sd[f"{pre}.encoder.pos_conv_embed.conv.bias"]),
    }
    hub["encoder_norm"] = ln(f"{pre}.encoder.layer_norm")
    for i in range(cfg.hubert_layers):
        src = f"{pre}.encoder.layers.{i}"
        hub[f"layer{i}_q"] = lin(f"{src}.attention.q_proj")
        hub[f"layer{i}_k"] = lin(f"{src}.attention.k_proj")
        hub[f"layer{i}_v"] = lin(f"{src}.attention.v_proj")
        hub[f"layer{i}_o"] = lin(f"{src}.attention.out_proj")
        hub[f"layer{i}_ln"] = ln(f"{src}.layer_norm")
        hub[f"layer{i}_ff1"] = lin(f"{src}.feed_forward.intermediate_dense")
        hub[f"layer{i}_ff2"] = lin(f"{src}.feed_forward.output_dense")
        hub[f"layer{i}_final_ln"] = ln(f"{src}.final_layer_norm")

    codebooks = np.stack(
        [
            np.asarray(sd[f"quantizer.quantizers.{qi}.codebook.embed"])
            for qi in range(cfg.num_quantizers)
        ]
    )

    return {
        "acoustic_encoder": ae,
        "acoustic_decoder": ad,
        "encoder_semantic": es,
        "decoder_semantic": ds,
        "semantic_model": hub,
        "fc": lin("fc"),
        "fc1": lin("fc1"),
        "fc2": lin("fc2"),
        "quantizer": {"codebooks": codebooks},
    }
