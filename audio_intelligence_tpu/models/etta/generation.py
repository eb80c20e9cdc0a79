"""Text-to-audio generation orchestration (inference_tta parity).

Functional re-design of ETTA/stable_audio_tools/inference/generation.py
``generate_diffusion_cond``:111-315: condition → seed noise → RF/v-DDIM
sampling with CFG → VAE decode. The reference's per-prompt Python loop and
per-step host syncs collapse into one jitted program; batch generation is
just a leading batch dim.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from audio_intelligence_tpu.models.etta.dit import cfg_forward
from audio_intelligence_tpu.models.etta.sampling import (
    sample_discrete_euler,
    sample_discrete_heun,
    sample_v_ddim,
)
from audio_intelligence_tpu.models.etta.conditioners import (
    hash_text_embedding,
    route_conditioning,
)


@dataclass(frozen=True)
class GenerationConfig:
    """Flagship defaults (inference_tta.py:235-242, etta_dit.json)."""

    steps: int = 100
    cfg_scale: float = 3.5
    sampler_type: str = "euler"  # euler | heun | v-ddim
    sigma_max: float = 1.0
    scale_phi: float = 0.0
    sample_size: int = 441000  # 10 s stereo 44.1 kHz
    downsampling_ratio: int = 2048
    latent_dim: int = 64


def build_text_conditioning(
    prompts,
    conditioner_apply,
    seconds_start=None,
    seconds_total=None,
    text_embed_fn: Callable = hash_text_embedding,
):
    """Host-side prep: encode prompts, run the (jittable) MultiConditioner,
    route into (cross, cross_mask, global) for the DiT."""
    b = len(prompts)
    emb, mask = text_embed_fn(prompts)
    metadata = {
        "prompt_embed": jnp.asarray(emb),
        "prompt_mask": jnp.asarray(mask),
        "seconds_start": jnp.asarray(
            seconds_start if seconds_start is not None else np.zeros(b, np.float32)
        ),
        "seconds_total": jnp.asarray(
            seconds_total if seconds_total is not None else np.full(b, 10.0, np.float32)
        ),
    }
    cond = conditioner_apply(metadata)
    return route_conditioning(cond)


def generate_diffusion_cond(
    dit_apply: Callable,
    decode_fn: Callable,
    key: jax.Array,
    cross_attn_cond: jax.Array,
    cross_attn_mask: jax.Array,
    global_cond: jax.Array,
    config: GenerationConfig = GenerationConfig(),
    init_latent: Optional[jax.Array] = None,
    init_noise_level: float = 1.0,
) -> jax.Array:
    """Sample latents under CFG and decode to waveform [B, T, channels].

    ``dit_apply(x, t, cond, cond_mask, global_cond)`` is the bare DiT
    forward; ``decode_fn(latents)`` is the VAE decoder (pretransform.decode
    incl. any scale). init_latent enables audio-to-audio
    (generation.py:191-219): start from init + noise·σ at partial σ.
    """
    b = cross_attn_cond.shape[0]
    latent_len = config.sample_size // config.downsampling_ratio
    k_noise, k_sample = jax.random.split(key)
    noise = jax.random.normal(
        k_noise, (b, latent_len, config.latent_dim), jnp.float32
    )

    if init_latent is not None:
        x = init_latent + noise * init_noise_level
        sigma_max = init_noise_level
    else:
        x = noise * config.sigma_max
        sigma_max = config.sigma_max

    def model_fn(x, t):
        return cfg_forward(
            dit_apply,
            x,
            t,
            cross_attn_cond,
            cross_attn_mask,
            global_cond,
            cfg_scale=config.cfg_scale,
            scale_phi=config.scale_phi,
        )

    if config.sampler_type == "euler":
        latents = sample_discrete_euler(model_fn, x, config.steps, sigma_max)
    elif config.sampler_type == "heun":
        latents = sample_discrete_heun(model_fn, x, config.steps, sigma_max)
    elif config.sampler_type == "v-ddim":
        latents = sample_v_ddim(model_fn, x, k_sample, config.steps)
    else:
        raise ValueError(f"unknown sampler_type {config.sampler_type}")

    return decode_fn(latents)


def peak_normalize(audio: jax.Array, peak: float = 0.999) -> jax.Array:
    """inference_tta.py:107-109 output normalization."""
    m = jnp.max(jnp.abs(audio), axis=tuple(range(1, audio.ndim)), keepdims=True)
    return audio / jnp.maximum(m / peak, 1.0)
