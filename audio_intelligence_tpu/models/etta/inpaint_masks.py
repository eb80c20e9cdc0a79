"""Inpainting training masks (ETTA training/diffusion.py
DiffusionCondInpaintTrainingWrapper: speechflow_mask:1022, random_mask:1097).

Masks are over latent frames [B, T] in the REFERENCE TRAINING CONVENTION:
**1 = keep (visible context), 0 = masked (to be generated)** — the wrapper
conditions the model on ``masked_input = latents · mask`` plus the mask
itself as input-concat channels, so polarity is part of the checkpoint
contract. (Note this is the opposite of the *inference-side* build_mask
convention in generation.py, where 1 marks the region to regenerate —
faithful to the reference, which is inconsistent between the two.)

Explicit PRNG keys; fully vectorized (no per-sample Python loops).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def speechflow_mask(
    key: jax.Array,
    batch: int,
    length: int,
    p_cond: float = 0.9,
    span_rate_range=(0.7, 1.0),
    min_span: int = 10,
) -> jax.Array:
    """SpeechFlow-style mask (reference :1022-1090): with probability
    ``p_cond`` mask ``length·U(span_rate_range)`` frames using spans of
    ``min_span`` frames at random (possibly overlapping) starts; otherwise
    mask everything (unconditional example). Returns [B, T], 1 = keep.

    Design note: the reference draws spans one by one until the frame
    budget is spent; since spans may overlap there too, we draw the
    maximal static number of spans and activate the first ⌈n_mask/span⌉ —
    same distribution family, compiled shapes.
    """
    k_cond, k_rate, k_start = jax.random.split(key, 3)
    rate = jax.random.uniform(
        k_rate, (batch,), minval=span_rate_range[0], maxval=span_rate_range[1]
    )
    n_mask = jnp.maximum((rate * length).astype(jnp.int32), min_span)
    n_spans = (n_mask + min_span - 1) // min_span  # per-sample active spans
    max_spans = (length + min_span - 1) // min_span

    starts = jax.random.randint(
        k_start, (batch, max_spans), 0, max(length - min_span, 1)
    )
    span_active = jnp.arange(max_spans)[None, :] < n_spans[:, None]  # [B, S]
    pos = jnp.arange(length)[None, None, :]  # [1, 1, T]
    in_span = (
        (pos >= starts[:, :, None])
        & (pos < starts[:, :, None] + min_span)
        & span_active[:, :, None]
    )
    masked = in_span.any(axis=1)  # [B, T] True = masked
    keep = 1.0 - masked.astype(jnp.float32)

    uncond = jax.random.uniform(k_cond, (batch, 1)) >= p_cond
    return jnp.where(uncond, 0.0, keep)


def random_mask(
    key: jax.Array,
    batch: int,
    length: int,
    max_segments: int = 10,
) -> jax.Array:
    """Reference random_mask (:1097-1135): per sample choose between
    (0) several random segments masked, (1) full mask (unconditional),
    (2) causal mask — a random-length suffix masked (prefix continuation).
    Returns [B, T], 1 = keep.

    Design note: the reference samples *distinct* segment lengths via
    random.sample; we draw lengths independently (duplicates possible) to
    stay vectorized — an immaterial distributional difference.
    """
    k_mode, k_nseg, k_len, k_start, k_causal = jax.random.split(key, 5)
    mode = jax.random.randint(k_mode, (batch,), 0, 3)
    pos = jnp.arange(length)[None, None, :]

    # mode 0: num_segments ~ U[1, max_segments] masked segments
    num_segments = jax.random.randint(k_nseg, (batch,), 1, max_segments + 1)
    max_seg_len = jnp.maximum(length // jnp.maximum(num_segments, 1), 1)
    seg_lens = (
        jax.random.uniform(k_len, (batch, max_segments))
        * max_seg_len[:, None]
    ).astype(jnp.int32) + 1
    seg_starts = (
        jax.random.uniform(k_start, (batch, max_segments))
        * jnp.maximum(length - seg_lens, 1)
    ).astype(jnp.int32)
    seg_active = jnp.arange(max_segments)[None, :] < num_segments[:, None]
    in_seg = (
        (pos >= seg_starts[:, :, None])
        & (pos < (seg_starts + seg_lens)[:, :, None])
        & seg_active[:, :, None]
    )
    segments_keep = 1.0 - in_seg.any(axis=1).astype(jnp.float32)

    # mode 2: mask a random suffix (keep a causal prefix)
    suffix = jax.random.randint(k_causal, (batch,), 1, length + 1)
    causal_keep = (jnp.arange(length)[None, :] < (length - suffix)[:, None]).astype(
        jnp.float32
    )

    out = jnp.where(
        mode[:, None] == 0,
        segments_keep,
        jnp.where(mode[:, None] == 1, 0.0, causal_keep),
    )
    return out.astype(jnp.float32)
