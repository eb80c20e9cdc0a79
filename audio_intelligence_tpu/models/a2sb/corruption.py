"""Training corruptions: masks + noise fill, as branch-free jax.random ops.

Mirrors A2SB/corruption/corruptions.py (UpsampleMask:18, ExtensionMask:57,
InpaintMask:85, MultinomialInpaintMaskTransform:120,
TimestampedSegmentInpaintMaskTransform:147) with explicit PRNG keys and
comparison-against-iota masks instead of Python slicing, so the whole
degradation pipeline jits and vmaps over the batch.

Layout: spectrograms are [H, W, C] per sample (bands, frames, channels);
masks broadcast over C. The returned mask doubles as the loss mask.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


def mask_with_noise(key, x, mask, noise_level):
    """x·(1−mask) + mask·𝒩(0,1)·noise_level (corruptions.py:14-15)."""
    return x * (1.0 - mask) + mask * jax.random.normal(key, x.shape, x.dtype) * noise_level


def upsample_mask(
    key,
    shape: tuple[int, int, int],
    min_cutoff_freq: int,
    max_cutoff_freq: int,
    sampling_rate: int,
    dc_dropped: bool = True,
) -> jax.Array:
    """Random low-pass: mask all bands above a random cutoff bin."""
    h, w, c = shape
    n_fft = h * 2 if dc_dropped else (h - 1) * 2
    low = int(n_fft * min_cutoff_freq / float(sampling_rate))
    high = min(int(n_fft * max_cutoff_freq / float(sampling_rate)), h)
    high = max(high, low + 1)
    cutoff = jax.random.randint(key, (), low, high)
    band = jnp.arange(h)[:, None, None]
    return (band >= cutoff).astype(jnp.float32) * jnp.ones(shape, jnp.float32)


def extension_mask(key, shape: tuple[int, int, int], min_edge_distance: int = 32) -> jax.Array:
    """Mask everything left or right of a random frame."""
    h, w, c = shape
    k1, k2 = jax.random.split(key)
    start = jax.random.randint(k1, (), min_edge_distance, w - min_edge_distance)
    to_right = jax.random.normal(k2, ()) > 0
    frame = jnp.arange(w)[None, :, None]
    mask = jnp.where(to_right, frame >= start, frame < start)
    return mask.astype(jnp.float32) * jnp.ones(shape, jnp.float32)


def inpaint_mask(
    key,
    shape: tuple[int, int, int],
    min_inpainting_frac: float,
    max_inpainting_frac: float,
    is_random: bool = True,
) -> jax.Array:
    """Mask a random contiguous time segment of random fractional length."""
    h, w, c = shape
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, ())
    frac = u * (max_inpainting_frac - min_inpainting_frac) + min_inpainting_frac
    if is_random:
        start_frac = jax.random.uniform(k2, ()) * (1.0 - frac)
    else:
        start_frac = 0.5 - frac / 2.0
    start = jnp.floor(start_frac * w).astype(jnp.int32)
    end = jnp.floor((start_frac + frac) * w).astype(jnp.int32)
    frame = jnp.arange(w)[None, :, None]
    mask = (frame >= start) & (frame < end)
    return mask.astype(jnp.float32) * jnp.ones(shape, jnp.float32)


def timestamped_segment_mask(
    shape: tuple[int, int, int],
    start_time: float = 0.5,
    end_time: float = 1.0,
    hop_length: int = 512,
    sampling_rate: int = 44100,
) -> jax.Array:
    """Deterministic time-window mask (corruptions.py:147-160)."""
    h, w, c = shape
    start = int(sampling_rate / hop_length * start_time)
    end = int(sampling_rate / hop_length * end_time)
    frame = jnp.arange(w)[None, :, None]
    mask = (frame >= start) & (frame < end)
    return mask.astype(jnp.float32) * jnp.ones(shape, jnp.float32)


@dataclass(frozen=True)
class MultinomialCorruption:
    """Task sampler: upsample / extension / inpaint mask + noise fill.

    Flagship config (A2SB/configs/pretrain.yaml:97-112): p = (0.5, 0, 0.5),
    fill_noise_level 0.5, cutoff 2–16 kHz, inpaint frac 0.034–0.54.
    """

    p_upsample_mask: float = 0.5
    p_extension_mask: float = 0.5
    p_inpaint_mask: float = 0.0
    fill_noise_level: float = 0.5
    sampling_rate: int = 22050
    upsample_mask_kwargs: dict = field(default_factory=dict)
    inpainting_mask_kwargs: dict = field(default_factory=dict)

    def __call__(self, key, spec: jax.Array) -> tuple[jax.Array, jax.Array]:
        """spec [H, W, C] → (corrupted, mask). jit/vmap-safe."""
        shape = spec.shape
        k_choice, k_mask, k_noise = jax.random.split(key, 3)
        probs = jnp.asarray(
            [self.p_upsample_mask, self.p_extension_mask, self.p_inpaint_mask]
        )
        choice = jax.random.categorical(k_choice, jnp.log(probs + 1e-12))
        branches = [
            lambda k: upsample_mask(
                k, shape, sampling_rate=self.sampling_rate, **self.upsample_mask_kwargs
            ),
            lambda k: extension_mask(k, shape),
            lambda k: inpaint_mask(k, shape, **self.inpainting_mask_kwargs),
        ]
        mask = jax.lax.switch(choice, branches, k_mask)
        corrupted = mask_with_noise(k_noise, spec, mask, self.fill_noise_level)
        return corrupted, mask
