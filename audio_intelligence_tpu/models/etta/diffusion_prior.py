"""Mono→stereo diffusion prior (reference diffusion_prior.py:17-103).

The reference's MonoToStereoDiffusionPrior is a conditioned diffusion
wrapper whose conditioning is the dual-mono latent itself, concatenated on
the model input ("source" input-concat conditioning). TPU-native shape:
one jittable ``stereoize`` closure — resample → pad to the model's minimum
input length → dual-mono → encode → sample with the input-concat source →
decode — instead of the reference's wrapper-class + torchaudio transform
stack.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.etta.sampling import (
    sample_discrete_euler,
    sample_discrete_heun,
)
from audio_intelligence_tpu import ops


def stereoize(
    model_fn: Callable,
    encode_fn: Callable,
    decode_fn: Callable,
    audio: jax.Array,
    in_sr: int,
    sample_rate: int = 44100,
    min_input_length: int = 2048,
    steps: int = 8,
    sampler_type: str = "euler",
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Generate stereo audio from mono with a diffusion prior
    (diffusion_prior.py stereoize:28-103).

    model_fn(x, t, source) → velocity, where ``source`` [B, T', D] is the
    dual-mono latent concatenated to the model input channel-wise by the
    caller's closure; encode_fn/decode_fn are the pretransform.
    audio: [B, C, T] waveform at ``in_sr``.
    """
    if in_sr != sample_rate:
        audio = jax.vmap(jax.vmap(lambda w: ops.resample(w, in_sr, sample_rate)))(
            audio
        )
    length = audio.shape[-1]
    pad = (min_input_length - length % min_input_length) % min_input_length
    if pad:
        audio = jnp.pad(audio, ((0, 0), (0, 0), (0, pad)))

    # dual mono [B, 2, T] → NWC [B, T, 2]
    mono = jnp.mean(audio, axis=1, keepdims=True)
    dual = jnp.moveaxis(jnp.repeat(mono, 2, axis=1), 1, -1)
    source = encode_fn(dual)  # [B, T_lat, D]

    if key is None:
        key = jax.random.PRNGKey(0)
    noise = jax.random.normal(key, source.shape, source.dtype)

    def fn(x, t):
        return model_fn(x, t, source)

    if sampler_type == "heun":
        latents = sample_discrete_heun(fn, noise, steps)
    else:
        latents = sample_discrete_euler(fn, noise, steps)
    stereo = decode_fn(latents)  # [B, T, 2]
    return jnp.moveaxis(stereo, -1, 1)[..., :length]
