#!/usr/bin/env python
"""ETTA text-to-audio CLI (``inference_tta.py`` parity).

Generates audio from --text_prompt / --text_prompts_file (one prompt per
line) / --ndjson_file ({"caption": ...} rows), writes wav + txt pairs
(reference: ETTA/inference_tta.py:157-373).

Usage:
  python cli/etta_generate.py --text_prompt "a dog barking" --output_dir out/
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_intelligence_tpu.utils.platform import maybe_force_platform

maybe_force_platform()

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--text_prompt", default=None)
    p.add_argument("--text_prompts_file", default=None)
    p.add_argument("--ndjson_file", default=None)
    p.add_argument("--output_dir", default="etta_outputs")
    p.add_argument("--checkpoint", default=None, help="exported DiT params (msgpack)")
    p.add_argument("--vae_checkpoint", default=None)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--cfg_scale", type=float, default=3.5)
    p.add_argument(
        "--sampler_type",
        choices=[
            "euler", "heun", "v-ddim",  # rectified-flow / v-DDIM paths
            # k-diffusion family (v-objective checkpoints)
            "k-euler", "k-heun", "k-dpmpp-2s-ancestral", "k-dpm-2",
            "dpm-fast", "dpm-adaptive", "dpmpp-2m", "dpmpp-2m-sde",
            "dpmpp-3m-sde",
        ],
        default="euler",
    )
    p.add_argument("--seconds_total", type=float, default=10.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--model_scale", choices=["flagship", "small"], default="small")
    args = p.parse_args(argv)

    prompts = []
    if args.text_prompt:
        prompts = [args.text_prompt]
    elif args.text_prompts_file:
        prompts = [l.strip() for l in open(args.text_prompts_file) if l.strip()]
    elif args.ndjson_file:
        prompts = [json.loads(l)["caption"] for l in open(args.ndjson_file) if l.strip()]
    else:
        p.error("need --text_prompt, --text_prompts_file, or --ndjson_file")

    import jax
    import jax.numpy as jnp

    from audio_intelligence_tpu.data.audio_io import write_wav
    from audio_intelligence_tpu.models.etta.bottleneck import VAEBottleneck
    from audio_intelligence_tpu.models.etta.conditioners import (
        MultiConditioner,
        hash_text_embedding,
        route_conditioning,
    )
    from audio_intelligence_tpu.models.etta.dit import DiffusionTransformer
    from audio_intelligence_tpu.models.etta.generation import (
        GenerationConfig,
        generate_diffusion_cond,
        peak_normalize,
    )
    from audio_intelligence_tpu.models.etta.vae import OobleckDecoder

    sr = 44100
    if args.model_scale == "flagship":
        dit = DiffusionTransformer()  # etta_dit.json defaults
        dec = OobleckDecoder()  # ×2048, 64-dim latent, stereo
        cfg = GenerationConfig(
            steps=args.steps, cfg_scale=args.cfg_scale,
            sampler_type=args.sampler_type,
            sample_size=int(args.seconds_total * sr),
        )
        cond_dim, num_dim = 768, 768
    else:
        latent = 8
        dit = DiffusionTransformer(
            io_channels=latent, embed_dim=128, depth=4, num_heads=4,
            cond_token_dim=32, global_cond_dim=64, xattn_heads=4, xattn_d_memory=32,
        )
        dec = OobleckDecoder(
            out_channels=2, channels=16, latent_dim=latent, c_mults=(1, 2, 4),
            strides=(4, 4, 4),
        )
        cfg = GenerationConfig(
            steps=args.steps, cfg_scale=args.cfg_scale,
            sampler_type=args.sampler_type,
            sample_size=int(args.seconds_total * sr) // 64 * 64,
            downsampling_ratio=64, latent_dim=latent,
        )
        cond_dim, num_dim = 32, 32

    mc = MultiConditioner(number_dim=num_dim, text_ids=("prompt",))
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    key = jax.random.PRNGKey(args.seed)
    init_done = False
    for i in range(0, len(prompts), args.batch_size):
        chunk = prompts[i : i + args.batch_size]
        emb, mask = hash_text_embedding(chunk, dim=cond_dim, max_length=64)
        metadata = {
            "prompt_embed": jnp.asarray(emb),
            "prompt_mask": jnp.asarray(mask),
            "seconds_start": jnp.zeros(len(chunk)),
            "seconds_total": jnp.full(len(chunk), args.seconds_total),
        }
        if not init_done:
            mc_params = mc.init(jax.random.PRNGKey(0), metadata)
            x0 = jnp.zeros(
                (1, cfg.sample_size // cfg.downsampling_ratio, cfg.latent_dim)
            )
            cond0 = mc.apply(mc_params, metadata)
            cr0, cm0, g0 = route_conditioning(cond0)
            dit_params = dit.init(
                jax.random.PRNGKey(1), x0, jnp.asarray([0.5]),
                cr0[:1], cm0[:1], g0[:1],
            )
            dec_params = dec.init(jax.random.PRNGKey(2), x0)
            if args.checkpoint:
                from audio_intelligence_tpu.train.checkpoint import load_exported_weights

                dit_params = load_exported_weights(dit_params, args.checkpoint)
            if args.vae_checkpoint:
                from audio_intelligence_tpu.train.checkpoint import load_exported_weights

                dec_params = load_exported_weights(dec_params, args.vae_checkpoint)
            if not (args.checkpoint and args.vae_checkpoint):
                print("WARNING: running with random weights (smoke mode)")
            init_done = True

        cond = mc.apply(mc_params, metadata)
        cross, cross_mask, g = route_conditioning(cond)
        key, sub = jax.random.split(key)
        audio = generate_diffusion_cond(
            lambda x, t, c, m, gc, **kw: dit.apply(dit_params, x, t, c, m, gc),
            lambda z: dec.apply(dec_params, z),
            sub, cross, cross_mask, g, cfg,
        )
        audio = np.asarray(peak_normalize(audio))
        for j, prompt in enumerate(chunk):
            stem = out_dir / f"sample_{i + j:04d}"
            write_wav(str(stem) + ".wav", sr, audio[j].T)
            (stem.parent / (stem.name + ".txt")).write_text(prompt + "\n")
            print(f"wrote {stem}.wav :: {prompt}")


if __name__ == "__main__":
    main()
