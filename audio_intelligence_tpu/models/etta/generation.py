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
    get_bmask,
    sample_discrete_euler,
    sample_discrete_euler_inpaint,
    sample_discrete_heun,
    sample_v_ddim,
)
from audio_intelligence_tpu.models.etta.kdiffusion import sample_k
from audio_intelligence_tpu.models.etta.conditioners import (
    hash_text_embedding,
    route_conditioning,
)

RF_SAMPLERS = ("euler", "heun", "v-ddim")
K_SAMPLERS = (
    "k-euler",
    "k-heun",
    "k-dpmpp-2s-ancestral",
    "k-dpm-2",
    "dpm-fast",
    "dpm-adaptive",
    "dpmpp-2m",
    "dpmpp-2m-sde",
    "dpmpp-3m-sde",
)


@dataclass(frozen=True)
class GenerationConfig:
    """Flagship defaults (inference_tta.py:235-242, etta_dit.json)."""

    steps: int = 100
    cfg_scale: float = 3.5
    # RF: euler | heun | v-ddim; v-objective checkpoints: any of K_SAMPLERS
    sampler_type: str = "euler"
    sigma_max: float = 1.0
    scale_phi: float = 0.0
    sample_size: int = 441000  # 10 s stereo 44.1 kHz
    downsampling_ratio: int = 2048
    latent_dim: int = 64
    # k-diffusion (v-objective) sigma ramp (inference_tta.py:235-242)
    sigma_min: float = 0.3
    sigma_max_k: float = 500.0


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


def build_mask(latent_len: int, mask_args: dict) -> np.ndarray:
    """Soft inpainting mask over latent frames (generation.py:322-340).

    ``mask_args`` percentages: maskstart/maskend mark the region to
    REGENERATE (value 1), the rest is kept (0); softnessL/softnessR are
    hann-ramped transitions; ``marination`` ∈ [0, 1) scales the mask down
    so the generated region is re-pinned to the (noised) input during the
    final ``marination`` fraction of the schedule. Note the reference
    build_mask's comment states the opposite polarity of what its callback
    computes — this follows the code.
    """
    maskstart = int(np.floor(mask_args["maskstart"] / 100.0 * latent_len))
    maskend = int(np.ceil(mask_args["maskend"] / 100.0 * latent_len))
    softnessL = int(round(mask_args.get("softnessL", 0.0) / 100.0 * latent_len))
    softnessR = int(round(mask_args.get("softnessR", 0.0) / 100.0 * latent_len))
    marination = float(mask_args.get("marination", 0.0))
    mask = np.zeros((latent_len,), np.float32)
    mask[maskstart:maskend] = 1.0
    if softnessL > 0:
        ramp = np.hanning(softnessL * 2)[:softnessL].astype(np.float32)
        n = len(mask[maskstart : maskstart + softnessL])
        mask[maskstart : maskstart + n] = ramp[:n]
    if softnessR > 0:
        ramp = np.hanning(softnessR * 2)[softnessR:].astype(np.float32)
        n = len(mask[max(maskend - softnessR, 0) : maskend])
        mask[maskend - n : maskend] = ramp[-n:] if n else ramp[:0]
    if marination > 0:
        mask = mask * (1.0 - marination)
    return mask


def cut_paste(
    init_latent: jax.Array, latent_len: int, mask_args: dict
) -> jax.Array:
    """Outpainting cut/paste (generation.py:223-239): copy the segment at
    cropfrom into [pastefrom, pasteto) of a zeroed canvas; percentages over
    the latent length. Static slicing — percentages are host-side."""
    cropfrom = int(np.floor(mask_args.get("cropfrom", 0.0) / 100.0 * latent_len))
    pastefrom = int(np.floor(mask_args.get("pastefrom", 0.0) / 100.0 * latent_len))
    pasteto = int(np.ceil(mask_args.get("pasteto", 100.0) / 100.0 * latent_len))
    assert pastefrom < pasteto, "Paste From should be less than Paste To"
    croplen = pasteto - pastefrom
    if cropfrom + croplen > latent_len:
        croplen = latent_len - cropfrom
    cropto = cropfrom + croplen
    pasteto = pastefrom + croplen
    canvas = jnp.zeros_like(init_latent)
    return canvas.at[:, pastefrom:pasteto, :].set(
        init_latent[:, cropfrom:cropto, :]
    )


def make_inpaint_pre_step(
    init_latent: jax.Array, mask: jax.Array, steps: int
) -> Callable:
    """The shrinking-binary-mask inpainting hook for the k-samplers
    (sampling.py:370-383): before each model evaluation, re-pin reached
    mask positions to init + fresh noise·σ. mask broadcasts over latent
    frames ([T] or [B, T, 1]); 1 = generate, 0 = keep."""
    m = mask if mask.ndim > 1 else mask[None, :, None]

    def pre_step(i, x, sigma, key):
        bmask = get_bmask(i, steps, m)
        noised = init_latent + jax.random.normal(key, x.shape, x.dtype) * sigma
        return bmask * noised + (1.0 - bmask) * x

    return pre_step


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
    mask: Optional[jax.Array] = None,
    input_concat_cond: Optional[jax.Array] = None,
    return_latents: bool = False,
) -> jax.Array:
    """Sample latents under CFG and decode to waveform [B, T, channels].

    ``dit_apply(x, t, cond, cond_mask, global_cond)`` is the bare DiT
    forward; ``decode_fn(latents)`` is the VAE decoder (pretransform.decode
    incl. any scale). init_latent enables audio-to-audio
    (generation.py:191-219): start from init + noise·σ at partial σ.
    init_latent + ``mask`` (latent frames, 1 = generate / 0 = keep, from
    ``build_mask``) enables inpainting/outpainting via the shrinking-bmask
    schedule — on both the RF path (euler) and the v-objective k-samplers.
    """
    b = cross_attn_cond.shape[0]
    latent_len = config.sample_size // config.downsampling_ratio
    k_noise, k_sample = jax.random.split(key)
    noise = jax.random.normal(
        k_noise, (b, latent_len, config.latent_dim), jnp.float32
    )

    inpainting = init_latent is not None and mask is not None
    if init_latent is not None and not inpainting:
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
            input_concat_cond=input_concat_cond,
        )

    sampler = config.sampler_type
    if sampler in RF_SAMPLERS:
        if inpainting:
            latents = sample_discrete_euler_inpaint(
                model_fn,
                x,
                init_latent,
                mask if mask.ndim > 1 else mask[None, :, None],
                k_sample,
                config.steps,
                sigma_max,
            )
        elif sampler == "euler":
            latents = sample_discrete_euler(model_fn, x, config.steps, sigma_max)
        elif sampler == "heun":
            latents = sample_discrete_heun(model_fn, x, config.steps, sigma_max)
        else:
            latents = sample_v_ddim(model_fn, x, k_sample, config.steps)
    elif sampler in K_SAMPLERS:
        pre = (
            make_inpaint_pre_step(init_latent, mask, config.steps)
            if inpainting
            else None
        )
        latents = sample_k(
            model_fn,
            noise,
            steps=config.steps,
            sampler_type=sampler,
            sigma_min=config.sigma_min,
            sigma_max=config.sigma_max_k,
            key=k_sample,
            pre_step=pre,
            init_data=init_latent if not inpainting else None,
        )
        if inpainting:
            m = mask if mask.ndim > 1 else mask[None, :, None]
            latents = jnp.where(m > 0, latents, init_latent)
    else:
        raise ValueError(f"unknown sampler_type {sampler}")

    if return_latents:
        return latents
    return decode_fn(latents)


def peak_normalize(audio: jax.Array, peak: float = 0.999) -> jax.Array:
    """inference_tta.py:107-109 output normalization."""
    m = jnp.max(jnp.abs(audio), axis=tuple(range(1, audio.ndim)), keepdims=True)
    return audio / jnp.maximum(m / peak, 1.0)
