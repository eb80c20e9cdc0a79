"""Inpainting training masks (ETTA training/diffusion.py
DiffusionCondInpaintTrainingWrapper: speechflow_mask:1022, random_mask:1097).

Masks are over latent frames [B, T]; 1 = generate, 0 = keep. Explicit PRNG
keys, vmapped over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def speechflow_mask(
    key: jax.Array, batch: int, length: int,
    frac_lengths_range=(0.1, 0.9),
    min_span: int = 10,
) -> jax.Array:
    """SpeechFlow-style mask: mask a random fraction as one contiguous span
    (falling back to full-keep when the span would be empty)."""
    k1, k2 = jax.random.split(key)
    fracs = jax.random.uniform(
        k1, (batch,), minval=frac_lengths_range[0], maxval=frac_lengths_range[1]
    )
    span = jnp.maximum((fracs * length).astype(jnp.int32), min_span)
    start_max = jnp.maximum(length - span, 1)
    starts = (jax.random.uniform(k2, (batch,)) * start_max).astype(jnp.int32)
    pos = jnp.arange(length)[None, :]
    return (
        (pos >= starts[:, None]) & (pos < (starts + span)[:, None])
    ).astype(jnp.float32)


def random_mask(
    key: jax.Array, batch: int, length: int,
    max_mask_fraction: float = 1.0,
) -> jax.Array:
    """Reference random_mask: per-sample choose between full-generation,
    prefix-keep (outpainting), and random span (inpainting)."""
    k_mode, k_a, k_b = jax.random.split(key, 3)
    mode = jax.random.randint(k_mode, (batch,), 0, 3)
    pos = jnp.arange(length)[None, :]

    # mode 0: generate everything
    full = jnp.ones((batch, length))
    # mode 1: keep a random prefix (continuation / outpainting)
    keep = (jax.random.uniform(k_a, (batch,)) * length * max_mask_fraction).astype(jnp.int32)
    prefix = (pos >= keep[:, None]).astype(jnp.float32)
    # mode 2: random contiguous span
    span = speechflow_mask(k_b, batch, length)

    out = jnp.where(mode[:, None] == 0, full, jnp.where(mode[:, None] == 1, prefix, span))
    return out.astype(jnp.float32)
