"""Conditioning: metadata dict → {id: (tensor, mask)} and routing.

Mirrors ETTA/stable_audio_tools/models/conditioners.py (T5Conditioner:241,
NumberConditioner:61, MultiConditioner:472) and the wrapper's routing
(models/diffusion.py get_conditioning_inputs:135-212): cross-attention
conds concatenate over the sequence dim, global conds over channels.

Split host/device:
- Text encoding (T5) is frozen preprocessing — it runs host-side through
  HF transformers when the weights are available locally, else a
  deterministic hash-n-gram embedding fallback (zero-egress images can't
  download t5-base; the fallback keeps every pipeline runnable/testable
  and is clearly flagged). Either way the result enters the jitted graph
  as a plain [B, T, 768] array + mask.
- NumberConditioner is a flax module (learned Fourier embedding, trains
  with the DiT).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


class NumberEmbedder(nn.Module):
    """Continuous-value embedding (adp.py NumberEmbedder:1483 +
    LearnedPositionalEmbedding:670): x → [x ‖ sin(2π·x·w) ‖ cos(2π·x·w)] →
    Linear(dim+1 → features)."""

    features: int
    dim: int = 256

    @nn.compact
    def __call__(self, x):  # x [B]
        w = self.param(
            "freqs", nn.initializers.normal(1.0), (self.dim // 2,)
        )
        f = x[:, None] * w[None, :] * 2 * jnp.pi
        fouriered = jnp.concatenate([jnp.sin(f), jnp.cos(f)], axis=-1)
        fouriered = jnp.concatenate([x[:, None], fouriered], axis=-1)
        return nn.Dense(self.features, name="to_out")(fouriered)


class NumberConditioner(nn.Module):
    """Clamp + min-max normalize + NumberEmbedder (conditioners.py:61-95)."""

    output_dim: int
    min_val: float = 0.0
    max_val: float = 1.0

    @nn.compact
    def __call__(self, floats):  # [B]
        x = jnp.clip(floats, self.min_val, self.max_val)
        x = (x - self.min_val) / (self.max_val - self.min_val)
        emb = NumberEmbedder(self.output_dim, name="embedder")(x)
        return emb[:, None, :], jnp.ones((emb.shape[0], 1), bool)


def hash_text_embedding(
    texts: Sequence[str], dim: int = 768, max_length: int = 128
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic fallback text encoder (NOT T5): per-token embeddings
    seeded from a stable hash of (token, position-free) so identical
    prompts map to identical embeddings. Used when no local T5 weights
    exist; swap in ``t5_embed_host`` for parity runs."""
    b = len(texts)
    out = np.zeros((b, max_length, dim), np.float32)
    mask = np.zeros((b, max_length), bool)
    for i, text in enumerate(texts):
        tokens = text.lower().split()[: max_length - 1] + ["</s>"]
        for j, tok in enumerate(tokens):
            seed = int.from_bytes(
                hashlib.sha256(tok.encode()).digest()[:8], "little"
            ) % (2**32)
            rng = np.random.default_rng(seed)
            out[i, j] = rng.standard_normal(dim).astype(np.float32) / np.sqrt(dim)
            mask[i, j] = True
    return out, mask


def t5_embed_host(
    texts: Sequence[str],
    t5_model_name: str = "t5-base",
    max_length: int = 128,
) -> tuple[np.ndarray, np.ndarray]:
    """Frozen T5 encoding on host CPU via HF transformers
    (conditioners.py:241-326 semantics: masked encoder outputs, fp32 here).

    Requires the model to be available locally (HF_HOME cache or local
    path); raises otherwise — callers fall back to hash_text_embedding.
    """
    import torch
    from transformers import AutoTokenizer, T5EncoderModel

    tokenizer = AutoTokenizer.from_pretrained(t5_model_name)
    model = T5EncoderModel.from_pretrained(t5_model_name).eval()
    enc = tokenizer(
        list(texts),
        truncation=True,
        max_length=max_length,
        padding="max_length",
        return_tensors="pt",
    )
    with torch.no_grad():
        out = model(
            input_ids=enc["input_ids"], attention_mask=enc["attention_mask"]
        ).last_hidden_state
    mask = enc["attention_mask"].bool()
    out = out * mask.unsqueeze(-1)
    return out.numpy(), mask.numpy()


class TokenizerLUTConditioner(nn.Module):
    """Learned token-embedding conditioner
    (conditioners.py TokenizerLUTConditioner:384-440): token ids → LUT
    embeddings + mask. Tokenization happens host-side (HF tokenizer when
    available, ByteTextIO otherwise); the module consumes id arrays."""

    vocab_size: int
    output_dim: int
    max_length: int = 128

    @nn.compact
    def __call__(self, token_ids, mask):
        emb = nn.Embed(self.vocab_size, self.output_dim, name="lut")(token_ids)
        emb = emb * mask[..., None].astype(emb.dtype)
        return emb, mask


def tokenize_for_lut(texts, max_length: int = 128):
    """Host-side byte-level tokenization for TokenizerLUTConditioner
    (ids in [1, 256]; 0 = pad)."""
    ids = np.zeros((len(texts), max_length), np.int32)
    mask = np.zeros((len(texts), max_length), bool)
    for i, t in enumerate(texts):
        b = np.frombuffer(str(t).encode("utf-8"), np.uint8)[: max_length]
        ids[i, : len(b)] = b.astype(np.int32) + 1
        mask[i, : len(b)] = True
    return ids, mask


class MultiConditioner(nn.Module):
    """Applies per-id conditioners to a metadata batch
    (conditioners.py:472-513).

    Text ids are precomputed host-side (arrays passed in metadata);
    number ids run as flax submodules.
    """

    number_ids: Sequence[str] = ("seconds_start", "seconds_total")
    number_dim: int = 768
    number_min: float = 0.0
    number_max: float = 512.0
    text_ids: Sequence[str] = ("prompt",)

    @nn.compact
    def __call__(self, metadata: dict) -> dict:
        out = {}
        for tid in self.text_ids:
            out[tid] = (metadata[f"{tid}_embed"], metadata[f"{tid}_mask"])
        for nid in self.number_ids:
            out[nid] = NumberConditioner(
                self.number_dim, self.number_min, self.number_max, name=nid
            )(metadata[nid])
        return out


def route_conditioning(
    cond: dict,
    cross_attn_ids: Sequence[str] = ("prompt", "seconds_start", "seconds_total"),
    global_ids: Sequence[str] = ("seconds_start", "seconds_total"),
):
    """get_conditioning_inputs (models/diffusion.py:135-212): returns
    (cross_attn_cond [B, ΣT, C], cross_attn_mask [B, ΣT], global_cond [B, ΣC])."""
    xs, masks = [], []
    for key in cross_attn_ids:
        t, m = cond[key]
        if t.ndim == 2:
            t, m = t[:, None, :], m[:, None]
        xs.append(t)
        masks.append(m)
    cross = jnp.concatenate(xs, axis=1) if xs else None
    cross_mask = jnp.concatenate(masks, axis=1) if masks else None

    gs = []
    for key in global_ids:
        g = cond[key][0]
        if g.ndim == 3:
            g = g[:, 0, :]
        gs.append(g)
    global_cond = jnp.concatenate(gs, axis=-1) if gs else None
    return cross, cross_mask, global_cond
