"""AFWhisper-style continuous audio encoder tower, flax.

Capability parity with the vendored AF-Whisper encoder
(UALM/models/ualm/multimodal_io/modeling_whisper.py AFWhisperEncoder:589-766,
Qwen2Audio-style): log-mel frontend → conv ×2 (second stride 2) → sinusoidal
positions → pre-norm transformer layers → avg-pool ×2 → LayerNorm. Output
length = _get_feat_extract_output_lengths(mel_frames) =
((frames − 1)//2 + 1 − 2)//2 + 1.

Flagship reference scale: 32 layers, d 1280 (Whisper-large); default here is
configurable for tests, same structure.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from audio_intelligence_tpu.ops.mel import log_mel_whisper


@dataclass(frozen=True)
class WhisperTowerConfig:
    d_model: int = 1280
    num_layers: int = 32
    num_heads: int = 20
    ffn_dim: int = 5120
    n_mels: int = 128
    max_positions: int = 1500

    @staticmethod
    def tiny():
        return WhisperTowerConfig(
            d_model=64, num_layers=2, num_heads=4, ffn_dim=128, n_mels=32,
            max_positions=64,
        )


def feat_extract_output_length(mel_frames: int) -> int:
    """modeling_whisper.py:759: conv2 stride-2 then avg-pool ×2."""
    after_conv = (mel_frames - 1) // 2 + 1
    return (after_conv - 2) // 2 + 1


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoidal positions."""
    log_timescale = np.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


class EncoderLayer(nn.Module):
    cfg: WhisperTowerConfig

    @nn.compact
    def __call__(self, x, mask_bias=None):
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=1e-5, name="self_attn_layer_norm")(x)
        b, t, d = h.shape
        hd = d // cfg.num_heads
        q = nn.Dense(d, name="q_proj")(h).reshape(b, t, cfg.num_heads, hd)
        k = nn.Dense(d, use_bias=False, name="k_proj")(h).reshape(b, t, cfg.num_heads, hd)
        v = nn.Dense(d, name="v_proj")(h).reshape(b, t, cfg.num_heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q / np.sqrt(hd), k).astype(jnp.float32)
        if mask_bias is not None:
            logits = logits + mask_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, d)
        x = x + nn.Dense(d, name="out_proj")(o)

        h = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)
        h = nn.Dense(cfg.ffn_dim, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        x = x + nn.Dense(d, name="fc2")(h)
        return x


class WhisperTower(nn.Module):
    """log-mel [B, n_mels, frames] (+ optional frame mask) → features
    [B, out_len, d_model]."""

    cfg: WhisperTowerConfig

    @nn.compact
    def __call__(self, mel, frame_mask=None):
        cfg = self.cfg
        x = jnp.swapaxes(mel, -1, -2)  # [B, T, n_mels]
        x = jax.nn.gelu(nn.Conv(cfg.d_model, (3,), padding=1, name="conv1")(x))
        x = jax.nn.gelu(
            nn.Conv(cfg.d_model, (3,), strides=(2,), padding=1, name="conv2")(x)
        )
        t = x.shape[1]
        # a parameter (sinusoid-initialized), not a fixed table: the
        # reference's embed_positions is a learned nn.Embedding loaded from
        # the checkpoint (modeling_whisper.py:617-618), so converted
        # weights must be able to overwrite it
        pos = self.param(
            "embed_positions",
            lambda _key: jnp.asarray(sinusoids(cfg.max_positions, cfg.d_model)),
        )
        x = x + pos[None, :t].astype(x.dtype)

        bias = None
        if frame_mask is not None:
            # mel-frame mask → post-conv2 mask (stride 2)
            m = frame_mask[:, ::2][:, :t]
            bias = jnp.where(m, 0.0, -1e9)[:, None, None, :]

        for i in range(cfg.num_layers):
            x = EncoderLayer(cfg, name=f"layers_{i}")(x, bias)

        # avg-pool ×2 then final norm (modeling_whisper.py AFWhisper pool)
        t2 = (x.shape[1] // 2) * 2
        x = x[:, :t2].reshape(x.shape[0], t2 // 2, 2, cfg.d_model).mean(axis=2)
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x)
