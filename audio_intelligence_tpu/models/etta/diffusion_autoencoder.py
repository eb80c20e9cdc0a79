"""Diffusion autoencoder (ETTA models/autoencoders.py
DiffusionAutoencoder:906-957 + training/diffusion.py
DiffusionAutoencoderTrainingWrapper:1658-1831).

An encoder (Oobleck) compresses audio to latents; the decoder is a
*diffusion* model conditioned on those latents via input-concat (latents
upsampled to the diffusion sequence length). Used by the reference as an
alternative to the GAN decoder.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from audio_intelligence_tpu.models.etta.sampling import sample_v_ddim, sample_discrete_euler


def upsample_latents(latents: jax.Array, target_len: int) -> jax.Array:
    """Nearest-neighbor upsample [B, L, C] → [B, target_len, C]
    (F.interpolate mode='nearest' in dit.py:192-195)."""
    l = latents.shape[1]
    idx = (jnp.arange(target_len) * l // target_len).astype(jnp.int32)
    return latents[:, idx, :]


class DiffusionAutoencoder(nn.Module):
    """encoder + latent-conditioned diffusion decoder.

    encoder: module mapping [B, T, C_audio] → [B, T/ratio, latent_dim]
    diffusion: DiffusionTransformer with input_concat_dim == latent_dim
    """

    encoder: nn.Module
    diffusion: nn.Module
    latent_dim: int
    downsampling_ratio: int
    io_channels: int = 2

    def encode(self, audio):
        return self.encoder(audio)

    def diffusion_forward(self, x_t, t, latents):
        cond = upsample_latents(latents, x_t.shape[1])
        return self.diffusion(x_t, t, input_concat_cond=cond)

    def __call__(self, audio, t):
        """Training forward: encode + denoise at timestep t."""
        latents = self.encode(audio)
        return self.diffusion_forward(audio, t, latents), latents


def decode_latents(
    dae: DiffusionAutoencoder,
    variables,
    latents: jax.Array,
    key: jax.Array,
    steps: int = 100,
    objective: str = "rectified_flow",
) -> jax.Array:
    """Sample audio conditioned on latents (autoencoders.py decode path)."""
    b, l, _ = latents.shape
    target_len = l * dae.downsampling_ratio
    noise = jax.random.normal(key, (b, target_len, dae.io_channels))

    def model_fn(x, t):
        return dae.apply(
            variables, x, t, latents, method=DiffusionAutoencoder.diffusion_forward
        )

    if objective == "rectified_flow":
        return sample_discrete_euler(model_fn, noise, steps)
    return sample_v_ddim(model_fn, noise, key, steps)


def dae_rf_loss(variables, dae: DiffusionAutoencoder, key, audio):
    """RF training loss for the diffusion autoencoder."""
    k_t, k_n = jax.random.split(key)
    b = audio.shape[0]
    t = jax.nn.sigmoid(jax.random.normal(k_t, (b,)))
    noise = jax.random.normal(k_n, audio.shape, audio.dtype)
    tt = t.reshape(-1, 1, 1)
    x_t = (1 - tt) * audio + tt * noise
    latents = dae.apply(variables, audio, method=DiffusionAutoencoder.encode)
    pred = dae.apply(
        variables, x_t, t, latents, method=DiffusionAutoencoder.diffusion_forward
    )
    return jnp.mean((pred - (noise - audio)) ** 2)
