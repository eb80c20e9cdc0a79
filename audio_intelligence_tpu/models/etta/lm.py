"""Discrete-token audio language model (MusicGen-style) over RVQ codes.

Capability parity with ETTA/stable_audio_tools/models/lm.py:38-474 +
lm_backbone.py:13-151: per-codebook embeddings summed into one stream, a
causal transformer backbone, per-codebook logit heads, delay/parallel/
musiclm codebook patterns (applied host-side via
``audio_intelligence_tpu.models.ualm.interleave``), and temperature/top-k
sampling. The special/masked token id is ``codebook_size`` (one extra row
per embedding table, the reference's pattern special_token_id).

TPU-first design: generation is a ``lax.fori_loop`` over a static-length
token buffer with full re-forward per step (compiled once; the
high-throughput KV-cache multi-stream decode path lives in
``models/ualm/decode.py`` — this module is the ETTA-surface capability).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from audio_intelligence_tpu.models.etta.continuous_transformer import (
    GLUFeedForward,
)
from audio_intelligence_tpu.ops.rotary import rope_angles_np, apply_rotary


def _causal_attention(q, k, v):
    """[B, H, S, D] causal softmax attention (fp32 logits on the MXU)."""
    s = q.shape[-2]
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], q.dtype))
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    causal = jnp.tril(jnp.ones((s, s), bool))
    logits = jnp.where(causal[None, None], logits, -1e9)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
    ).astype(v.dtype)


class CausalSelfAttention(nn.Module):
    dim: int
    heads: int
    rope_base: float = 10000.0

    @nn.compact
    def __call__(self, x):
        b, s, _ = x.shape
        hd = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, use_bias=False, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, s, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        angles = jnp.asarray(rope_angles_np(s, hd, self.rope_base), dtype=q.dtype)
        q = apply_rotary(q, angles)
        k = apply_rotary(k, angles)
        out = _causal_attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, self.dim)
        return nn.Dense(self.dim, use_bias=False, name="o")(out)


class CausalTransformer(nn.Module):
    """Pre-LN causal transformer (lm_backbone.py:13-151 capability)."""

    dim: int
    depth: int
    heads: int
    rope_base: float = 10000.0

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            h = nn.LayerNorm(name=f"ln1_{i}")(x)
            x = x + CausalSelfAttention(
                self.dim, self.heads, self.rope_base, name=f"attn{i}"
            )(h)
            h = nn.LayerNorm(name=f"ln2_{i}")(x)
            x = x + GLUFeedForward(dim=self.dim, name=f"ff{i}")(h)
        return nn.LayerNorm(name="ln_f")(x)


class AudioLanguageModel(nn.Module):
    """Multi-codebook audio LM (models/lm.py:38-141).

    Input codes [B, S, N] (pattern-interleaved, special id = codebook_size),
    output logits [B, S, N, codebook_size]: position s predicts the codes
    at position s+1 (caller shifts for loss / decodes autoregressively).
    """

    num_quantizers: int = 8
    codebook_size: int = 1024
    dim: int = 512
    depth: int = 8
    heads: int = 8
    rope_base: float = 10000.0

    @nn.compact
    def __call__(self, codes: jax.Array) -> jax.Array:
        b, s, n = codes.shape
        assert n == self.num_quantizers
        emb = 0.0
        for q in range(n):
            emb += nn.Embed(
                self.codebook_size + 1, self.dim, name=f"emb{q}"
            )(codes[..., q])
        h = CausalTransformer(
            self.dim, self.depth, self.heads, self.rope_base, name="backbone"
        )(emb)
        logits = [
            nn.Dense(self.codebook_size, use_bias=False, name=f"head{q}")(h)
            for q in range(n)
        ]
        return jnp.stack(logits, axis=2)  # [B, S, N, K]


def lm_cross_entropy(
    logits: jax.Array, targets: jax.Array, special_id: int
) -> tuple[jax.Array, jax.Array]:
    """Per-codebook CE over valid positions (training/lm.py:84-141
    _compute_cross_entropy). logits [B, S, N, K], targets [B, S, N];
    positions equal to ``special_id`` (pattern padding) are excluded.
    Returns (mean loss, per-codebook losses [N])."""
    valid = (targets != special_id).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.clip(targets, 0, logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    per_q = jnp.sum(nll * valid, axis=(0, 1)) / jnp.maximum(
        jnp.sum(valid, axis=(0, 1)), 1.0
    )
    return jnp.mean(per_q), per_q


def sample_tokens(
    key: jax.Array,
    logits: jax.Array,
    temperature: float = 1.0,
    top_k: int = 0,
) -> jax.Array:
    """Temperature/top-k categorical sampling (models/utils.py:54-103).
    logits [..., K] → ids [...]."""
    if temperature <= 0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / temperature
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, -1e9, logits)
    return jax.random.categorical(key, logits, axis=-1)


def generate(
    apply_fn,
    params,
    key: jax.Array,
    batch: int,
    gen_len: int,
    num_quantizers: int,
    codebook_size: int,
    prompt: Optional[jax.Array] = None,
    temperature: float = 1.0,
    top_k: int = 250,
) -> jax.Array:
    """Autoregressive generation over a pattern-interleaved buffer
    (models/lm.py AudioLanguageModelWrapper.generate:144-474).

    Returns codes [B, gen_len, N] with special ids where the pattern pads;
    callers apply the inverse pattern (e.g. interleave.delay_deinterleave)
    and mask/clamp specials before codec decode. ``prompt`` [B, P, N]
    seeds the buffer.
    """
    special = codebook_size
    buf = jnp.full((batch, gen_len, num_quantizers), special, jnp.int32)
    start = 0
    if prompt is not None:
        p = prompt.shape[1]
        buf = buf.at[:, :p].set(prompt)
        start = p

    def body(s, carry):
        buf, key = carry
        key, sub = jax.random.split(key)
        logits = apply_fn(params, buf)  # [B, S, N, K]
        step_logits = jax.lax.dynamic_slice_in_dim(
            logits, s - 1, 1, axis=1
        )[:, 0]  # [B, N, K] — position s−1 predicts position s
        ids = sample_tokens(sub, step_logits, temperature, top_k)
        buf = jax.lax.dynamic_update_slice_in_dim(
            buf, ids[:, None, :].astype(buf.dtype), s, axis=1
        )
        return buf, key

    buf, _ = jax.lax.fori_loop(max(start, 1), gen_len, body, (buf, key))
    return buf
