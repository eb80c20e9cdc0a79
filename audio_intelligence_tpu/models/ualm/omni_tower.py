"""Qwen2.5-Omni audio tower, flax — the reference's OTHER continuous
audio encoder (UALM ContinuousAudioIO encoder_choice="huggingface" with
Qwen/Qwen2.5-Omni-7B, audio.py:929-958: the thinker's audio_tower with
the LM/visual parts deleted).

Architecture (transformers Qwen2_5OmniAudioEncoder): mel is chunked into
windows of 2·n_window mel frames; each chunk runs conv ×2 (stride 2) +
fixed sinusoid positions independently, attention is bidirectional
WITHIN chunks only (the reference realizes this with varlen cu_seqlens;
here chunks are a batch axis — same masking, static shapes); after the
pre-LN transformer the per-audio packed sequence is avg-pooled ×2,
LayerNorm'd and projected to output_dim.

TPU notes: all chunks of a batch process as one [B·n_chunks, n_window, d]
batch. Full chunks are always exactly n_window tokens after the cnn, so
the packed per-audio layout is contiguous and the ×2 pooling pairs never
straddle chunk boundaries (n_window is even) — the ragged HF control flow
becomes static reshapes + masks.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from audio_intelligence_tpu.models.ualm.whisper_tower import sinusoids


@dataclass(frozen=True)
class OmniTowerConfig:
    d_model: int = 1280
    num_layers: int = 32
    num_heads: int = 20
    ffn_dim: int = 5120
    n_mels: int = 128
    n_window: int = 100  # chunk = 2·n_window mel frames (2 s)
    output_dim: int = 3584  # 7B thinker hidden
    max_positions: int = 1500

    @staticmethod
    def tiny():
        return OmniTowerConfig(
            d_model=64, num_layers=2, num_heads=4, ffn_dim=128, n_mels=32,
            n_window=8, output_dim=48, max_positions=64,
        )


class OmniEncoderLayer(nn.Module):
    cfg: OmniTowerConfig

    @nn.compact
    def __call__(self, x, mask_bias):
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=1e-5, name="self_attn_layer_norm")(x)
        b, t, d = h.shape
        hd = d // cfg.num_heads
        q = nn.Dense(d, name="q_proj")(h).reshape(b, t, cfg.num_heads, hd)
        k = nn.Dense(d, use_bias=False, name="k_proj")(h).reshape(
            b, t, cfg.num_heads, hd
        )
        v = nn.Dense(d, name="v_proj")(h).reshape(b, t, cfg.num_heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q / np.sqrt(hd), k).astype(
            jnp.float32
        )
        logits = logits + mask_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, d)
        x = x + nn.Dense(d, name="out_proj")(o)

        h = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)
        h = nn.Dense(self.cfg.ffn_dim, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        return x + nn.Dense(d, name="fc2")(h)


class OmniAudioTower(nn.Module):
    """mel [B, n_mels, T_mel] (+ mel lengths) → (features
    [B, T_out_max, output_dim], output lengths [B]). T_mel must be padded
    to a multiple of 2·n_window (static chunking)."""

    cfg: OmniTowerConfig

    @nn.compact
    def __call__(self, mel, mel_lengths=None):
        cfg = self.cfg
        w = 2 * cfg.n_window
        b, n_mels, t_mel = mel.shape
        if t_mel % w:
            raise ValueError(f"pad mel frames to a multiple of {w}, got {t_mel}")
        n_chunks = t_mel // w
        if mel_lengths is None:
            mel_lengths = jnp.full((b,), t_mel, jnp.int32)

        # [B·chunks, W, n_mels]
        x = mel.reshape(b, n_mels, n_chunks, w)
        x = jnp.transpose(x, (0, 2, 3, 1)).reshape(b * n_chunks, w, n_mels)
        # per-chunk valid mel frames: clip(len − i·W, 0, W)
        chunk_idx = jnp.arange(n_chunks)[None, :]
        chunk_len = jnp.clip(
            mel_lengths[:, None] - chunk_idx * w, 0, w
        ).reshape(b * n_chunks)

        h = jax.nn.gelu(nn.Conv(cfg.d_model, (3,), padding=1, name="conv1")(x))
        # the reference zeroes padded positions between the convs
        # (padded_mask multiply, modeling forward)
        mel_pos = jnp.arange(w)[None, :, None]
        h = h * (mel_pos < chunk_len[:, None, None]).astype(h.dtype)
        h = jax.nn.gelu(
            nn.Conv(cfg.d_model, (3,), strides=(2,), padding=1, name="conv2")(h)
        )
        t = h.shape[1]  # n_window
        pos = jnp.asarray(sinusoids(cfg.max_positions, cfg.d_model))
        h = h + pos[None, :t].astype(h.dtype)

        after_cnn = jnp.where(chunk_len > 0, (chunk_len - 1) // 2 + 1, 0)
        key_pos = jnp.arange(t)
        bias = jnp.where(
            key_pos[None, :] < after_cnn[:, None], 0.0, -1e30
        ).astype(jnp.float32)[:, None, None, :]

        for i in range(cfg.num_layers):
            h = OmniEncoderLayer(cfg, name=f"layers_{i}")(h, bias)

        # pack chunks back per audio: full chunks contribute exactly
        # n_window tokens, so the reshape IS the packed layout
        h = h.reshape(b, n_chunks * t, cfg.d_model)
        total_after_cnn = jnp.where(
            mel_lengths > 0, (mel_lengths - 1) // 2 + 1, 0
        )
        # ×2 avg pool (floor) per audio over the packed sequence
        t2 = (h.shape[1] // 2) * 2
        h = h[:, :t2].reshape(b, t2 // 2, 2, cfg.d_model).mean(axis=2)
        out_lengths = total_after_cnn // 2

        h = nn.LayerNorm(epsilon=1e-5, name="ln_post")(h)
        h = nn.Dense(cfg.output_dim, name="proj")(h)
        # bos/eos feature table (audio_bos_eos_token) — carried for
        # checkpoint completeness; the thinker prepends/appends them
        self.param(
            "audio_bos_eos_token",
            nn.initializers.normal(0.02),
            (2, cfg.output_dim),
        )
        valid = jnp.arange(h.shape[1])[None, :] < out_lengths[:, None]
        return h * valid[..., None].astype(h.dtype), out_lengths


def _strip_tower_prefix(sd: dict) -> dict:
    for prefix in ("thinker.audio_tower.", "audio_tower."):
        if any(k.startswith(prefix) for k in sd):
            return {
                k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)
            }
    return sd


def infer_omni_config(sd: dict, num_heads: int | None = None, n_window: int = 100):
    sd = _strip_tower_prefix(sd)
    d_model, n_mels, _ = sd["conv1.weight"].shape
    num_layers = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("layers.")
    )
    return OmniTowerConfig(
        d_model=d_model,
        num_layers=num_layers,
        num_heads=num_heads or d_model // 64,
        ffn_dim=sd["layers.0.fc1.weight"].shape[0],
        n_mels=n_mels,
        n_window=n_window,
        output_dim=sd["proj.weight"].shape[0],
    )


def convert_omni_tower(sd: dict) -> dict:
    """transformers Qwen2_5OmniAudioEncoder state dict → flax params.
    Accepts thinker-prefixed keys (``audio_tower.`` / ``thinker.audio_tower.``)."""
    sd = _strip_tower_prefix(sd)

    def conv1d(src):
        return {
            "kernel": np.ascontiguousarray(
                np.asarray(sd[src + ".weight"]).transpose(2, 1, 0)
            ),
            "bias": np.asarray(sd[src + ".bias"]),
        }

    def lin(src, bias=True):
        out = {"kernel": np.ascontiguousarray(np.asarray(sd[src + ".weight"]).T)}
        if bias:
            out["bias"] = np.asarray(sd[src + ".bias"])
        return out

    def ln(src):
        return {
            "scale": np.asarray(sd[src + ".weight"]),
            "bias": np.asarray(sd[src + ".bias"]),
        }

    params = {
        "conv1": conv1d("conv1"),
        "conv2": conv1d("conv2"),
        "ln_post": ln("ln_post"),
        "proj": lin("proj"),
        "audio_bos_eos_token": np.asarray(sd["audio_bos_eos_token.weight"]),
    }
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("layers."))
    for i in range(n_layers):
        src = f"layers.{i}"
        params[f"layers_{i}"] = {
            "self_attn_layer_norm": ln(f"{src}.self_attn_layer_norm"),
            "q_proj": lin(f"{src}.self_attn.q_proj"),
            "k_proj": lin(f"{src}.self_attn.k_proj", bias=False),
            "v_proj": lin(f"{src}.self_attn.v_proj"),
            "out_proj": lin(f"{src}.self_attn.out_proj"),
            "final_layer_norm": ln(f"{src}.final_layer_norm"),
            "fc1": lin(f"{src}.fc1"),
            "fc2": lin(f"{src}.fc2"),
        }
    return params
