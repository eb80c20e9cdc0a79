"""T5 text encoder in flax — the on-device conditioning path.

The reference conditions ETTA-DiT on a frozen T5-base encoder
(ETTA/stable_audio_tools/models/conditioners.py:241-326, fp16 eval with
masked outputs). This is an original encoder-only T5 implementation with
checkpoint-compatible structure so converted HF weights reproduce HF
outputs (see tools/convert_checkpoint.py --kind t5_encoder and
tests/test_t5_parity.py):

- RMS layer norm without mean-centering or bias (T5LayerNorm).
- Self-attention WITHOUT 1/√d scaling (T5's convention), additive
  relative-position bias shared from block 0.
- ReLU MLP (t5-base) or gated-GeLU (t5-v1.1 / FLAN) feed-forward.
- Pre-norm residual blocks + final RMS norm; dropout off at inference.

Tokenization stays host-side (HF tokenizer); this module consumes
(input_ids, attention_mask) and returns masked hidden states, so the
conditioning runs inside the same jit as the DiT instead of on the host.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    gated_ff: bool = False  # True for t5-v1.1 / FLAN (gated-gelu)

    @staticmethod
    def base():
        return T5Config()

    @staticmethod
    def small():
        return T5Config(d_model=512, d_ff=2048, num_layers=6, num_heads=8)

    @staticmethod
    def large():
        return T5Config(d_model=1024, d_ff=4096, num_layers=24, num_heads=16)


class T5LayerNorm(nn.Module):
    """RMS norm: x/√(mean(x²)+ε) · w — no mean subtraction, no bias."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.epsilon).astype(x.dtype)
        return x * w


def relative_position_bucket(
    relative_position: np.ndarray,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> np.ndarray:
    """Bidirectional T5 relative-position bucketing (host-side, static
    shapes — the table depends only on sequence length)."""
    num_buckets //= 2
    buckets = (relative_position > 0).astype(np.int64) * num_buckets
    rp = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = rp < max_exact
    large = max_exact + (
        np.log(np.maximum(rp, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    return buckets + np.where(is_small, rp, large)


class T5Attention(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False

    @nn.compact
    def __call__(self, x, mask, position_bias):
        c = self.cfg
        b, s, _ = x.shape
        inner = c.num_heads * c.d_kv
        q = nn.Dense(inner, use_bias=False, name="q")(x)
        k = nn.Dense(inner, use_bias=False, name="k")(x)
        v = nn.Dense(inner, use_bias=False, name="v")(x)

        def heads(t):
            return t.reshape(b, s, c.num_heads, c.d_kv).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        # T5: NO 1/√d scaling
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        if self.has_relative_bias:
            rel_emb = self.param(
                "relative_attention_bias",
                nn.initializers.normal(1.0),
                (c.relative_attention_num_buckets, c.num_heads),
            )
            rp = np.arange(s)[None, :] - np.arange(s)[:, None]  # key − query
            buckets = jnp.asarray(
                relative_position_bucket(
                    rp,
                    c.relative_attention_num_buckets,
                    c.relative_attention_max_distance,
                )
            )
            position_bias = jnp.transpose(rel_emb[buckets], (2, 0, 1))[None]
        scores = scores + position_bias.astype(scores.dtype)
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :], scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
        ).astype(v.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, inner)
        return nn.Dense(c.d_model, use_bias=False, name="o")(out), position_bias


class T5FF(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        if c.gated_ff:
            h = jax.nn.gelu(
                nn.Dense(c.d_ff, use_bias=False, name="wi_0")(x), approximate=True
            ) * nn.Dense(c.d_ff, use_bias=False, name="wi_1")(x)
        else:
            h = jax.nn.relu(nn.Dense(c.d_ff, use_bias=False, name="wi")(x))
        return nn.Dense(c.d_model, use_bias=False, name="wo")(h)


class T5Block(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False

    @nn.compact
    def __call__(self, x, mask, position_bias):
        h = T5LayerNorm(self.cfg.layer_norm_epsilon, name="ln0")(x)
        attn, position_bias = T5Attention(
            self.cfg, self.has_relative_bias, name="attn"
        )(h, mask, position_bias)
        x = x + attn
        h = T5LayerNorm(self.cfg.layer_norm_epsilon, name="ln1")(x)
        x = x + T5FF(self.cfg, name="ff")(h)
        return x, position_bias


class T5Encoder(nn.Module):
    """Encoder-only T5. ``__call__(input_ids, attention_mask)`` →
    masked last hidden states [B, S, d_model]."""

    cfg: T5Config = T5Config.base()

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        c = self.cfg
        emb = nn.Embed(c.vocab_size, c.d_model, name="shared")
        x = emb(input_ids)
        position_bias = jnp.zeros((), x.dtype)
        for i in range(c.num_layers):
            x, position_bias = T5Block(
                c, has_relative_bias=(i == 0), name=f"block{i}"
            )(x, attention_mask, position_bias)
        x = T5LayerNorm(c.layer_norm_epsilon, name="final_ln")(x)
        if attention_mask is not None:
            x = x * attention_mask[..., None].astype(x.dtype)
        return x


def t5_tokenize_host(texts, max_length: int = 128, t5_model_name: str = "t5-base"):
    """HF tokenizer on the host (conditioners.py:268-280). Returns numpy
    (input_ids, attention_mask) padded to max_length."""
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(t5_model_name)
    enc = tok(
        list(texts),
        truncation=True,
        max_length=max_length,
        padding="max_length",
        return_tensors="np",
    )
    return enc["input_ids"].astype(np.int32), enc["attention_mask"].astype(bool)


def infer_t5_config(sd: dict) -> T5Config:
    """Derive a T5Config from an HF T5EncoderModel state dict: every
    hyperparameter is recoverable from tensor shapes/keys."""
    vocab, d_model = sd["shared.weight"].shape
    num_layers = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("encoder.block.")
    )
    buckets, heads = sd[
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
    ].shape
    inner = sd["encoder.block.0.layer.0.SelfAttention.q.weight"].shape[0]
    gated = "encoder.block.0.layer.1.DenseReluDense.wi_0.weight" in sd
    d_ff = sd[
        "encoder.block.0.layer.1.DenseReluDense."
        + ("wi_0" if gated else "wi")
        + ".weight"
    ].shape[0]
    return T5Config(
        vocab_size=vocab,
        d_model=d_model,
        d_kv=inner // heads,
        d_ff=d_ff,
        num_layers=num_layers,
        num_heads=heads,
        relative_attention_num_buckets=buckets,
        gated_ff=gated,
    )


def convert_hf_t5_encoder(sd: dict, cfg: T5Config) -> dict:
    """HF T5EncoderModel state_dict (numpy values) → flax params for
    ``T5Encoder`` (linear kernels transposed from torch's [out, in])."""

    def lin(name):
        return {"kernel": np.ascontiguousarray(sd[name].T)}

    params: dict = {"shared": {"embedding": sd["shared.weight"]}}
    for i in range(cfg.num_layers):
        src = f"encoder.block.{i}"
        attn = {
            "q": lin(f"{src}.layer.0.SelfAttention.q.weight"),
            "k": lin(f"{src}.layer.0.SelfAttention.k.weight"),
            "v": lin(f"{src}.layer.0.SelfAttention.v.weight"),
            "o": lin(f"{src}.layer.0.SelfAttention.o.weight"),
        }
        if i == 0:
            attn["relative_attention_bias"] = sd[
                f"{src}.layer.0.SelfAttention.relative_attention_bias.weight"
            ]
        if cfg.gated_ff:
            ff = {
                "wi_0": lin(f"{src}.layer.1.DenseReluDense.wi_0.weight"),
                "wi_1": lin(f"{src}.layer.1.DenseReluDense.wi_1.weight"),
                "wo": lin(f"{src}.layer.1.DenseReluDense.wo.weight"),
            }
        else:
            ff = {
                "wi": lin(f"{src}.layer.1.DenseReluDense.wi.weight"),
                "wo": lin(f"{src}.layer.1.DenseReluDense.wo.weight"),
            }
        params[f"block{i}"] = {
            "attn": attn,
            "ff": ff,
            "ln0": {"scale": sd[f"{src}.layer.0.layer_norm.weight"]},
            "ln1": {"scale": sd[f"{src}.layer.1.layer_norm.weight"]},
        }
    params["final_ln"] = {"scale": sd["encoder.final_layer_norm.weight"]}
    return params
