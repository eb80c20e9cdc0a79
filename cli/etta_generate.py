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
    p.add_argument(
        "--text_encoder", choices=["auto", "hash", "t5-host", "t5-flax"],
        default="auto",
        help="auto: t5-flax when --t5_checkpoint is given, else t5-host "
        "when a DiT checkpoint is supplied (HF cache required), else hash",
    )
    p.add_argument("--t5_checkpoint", default=None,
                   help="converted flax T5 encoder params (msgpack; "
                   "tools/convert_checkpoint.py --kind t5_encoder)")
    # audio-to-audio / inpainting (reference generate_cond mask args)
    p.add_argument("--init_audio", default=None, help="wav for variation/inpainting")
    p.add_argument("--init_noise_level", type=float, default=1.0)
    p.add_argument("--vae_encoder_checkpoint", default=None)
    p.add_argument("--maskstart", type=float, default=None, help="%% of clip")
    p.add_argument("--maskend", type=float, default=None)
    p.add_argument("--softnessL", type=float, default=0.0)
    p.add_argument("--softnessR", type=float, default=0.0)
    p.add_argument("--marination", type=float, default=0.0)
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
        build_mask,
        generate_diffusion_cond,
        peak_normalize,
    )
    from audio_intelligence_tpu.models.etta.vae import OobleckDecoder, OobleckEncoder

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

    # --- variation / inpainting inputs (generation.py:191-247) ---
    init_latent = None
    inpaint_mask = None
    latent_len = cfg.sample_size // cfg.downsampling_ratio
    if args.init_audio:
        from audio_intelligence_tpu.data.audio_io import read_wav
        from audio_intelligence_tpu.ops.resample import resample

        wav_ct, in_sr = read_wav(args.init_audio)  # [C, T]
        if in_sr != sr:
            wav_ct = np.asarray(resample(jnp.asarray(wav_ct), in_sr, sr))
        wav = np.asarray(wav_ct, np.float32).T  # [T, C]
        if wav.shape[1] == 1:
            wav = np.repeat(wav, 2, axis=1)
        wav = wav[: cfg.sample_size]
        if wav.shape[0] < cfg.sample_size:
            wav = np.pad(wav, ((0, cfg.sample_size - wav.shape[0]), (0, 0)))
        if args.model_scale == "flagship":
            enc = OobleckEncoder()
        else:
            enc = OobleckEncoder(
                in_channels=2, channels=16, latent_dim=2 * cfg.latent_dim,
                c_mults=(1, 2, 4), strides=(4, 4, 4),
            )
        enc_params = enc.init(jax.random.PRNGKey(3), jnp.zeros((1, 4096, 2)))
        if args.vae_encoder_checkpoint:
            from audio_intelligence_tpu.train.checkpoint import load_exported_weights

            enc_params = load_exported_weights(enc_params, args.vae_encoder_checkpoint)
        else:
            print("WARNING: encoding init audio with random encoder weights")
        moments = enc.apply(enc_params, jnp.asarray(wav)[None])
        init_latent = moments[..., : cfg.latent_dim]  # VAE mean half
        if args.maskstart is not None:
            inpaint_mask = jnp.asarray(
                build_mask(latent_len, {
                    "maskstart": args.maskstart,
                    "maskend": args.maskend if args.maskend is not None else 100.0,
                    "softnessL": args.softnessL,
                    "softnessR": args.softnessR,
                    "marination": args.marination,
                })
            )

    # --- text encoder selection (conditioners.py:241-326 is T5-base) ---
    mode = args.text_encoder
    if mode == "auto":
        if args.t5_checkpoint:
            mode = "t5-flax"
        elif args.checkpoint:
            mode = "t5-host"
        else:
            mode = "hash"

    def embed_texts(texts):
        if mode == "t5-flax":
            from flax import serialization

            from audio_intelligence_tpu.models.etta.t5 import (
                T5Config,
                T5Encoder,
                t5_tokenize_host,
            )

            enc = T5Encoder(T5Config.base())
            with open(args.t5_checkpoint, "rb") as f:
                variables = serialization.from_bytes(None, f.read())
            ids, m = t5_tokenize_host(texts, max_length=128)
            out = enc.apply(
                {"params": variables["params"]}, jnp.asarray(ids), jnp.asarray(m)
            )
            return np.asarray(out), m
        if mode == "t5-host":
            from audio_intelligence_tpu.models.etta.conditioners import (
                t5_embed_host,
            )

            return t5_embed_host(texts, max_length=128)
        return hash_text_embedding(texts, dim=cond_dim, max_length=64)

    if mode == "hash" and args.checkpoint:
        print(
            "WARNING: generating from a real checkpoint with HASH text "
            "embeddings — outputs cannot match the reference. Supply "
            "--t5_checkpoint (converted T5) or ensure the HF T5 cache "
            "exists for --text_encoder t5-host."
        )
    if mode != "hash" and cond_dim != 768:
        p.error("T5 encoders produce 768-d embeddings (flagship scale only)")

    key = jax.random.PRNGKey(args.seed)
    init_done = False
    for i in range(0, len(prompts), args.batch_size):
        chunk = prompts[i : i + args.batch_size]
        try:
            emb, mask = embed_texts(chunk)
        except Exception as e:
            print(
                f"WARNING: {mode} text encoder unavailable ({e}); falling "
                "back to hash embeddings — outputs cannot match the reference."
            )
            mode = "hash"
            emb, mask = embed_texts(chunk)
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
        il = (
            jnp.broadcast_to(init_latent, (len(chunk),) + init_latent.shape[1:])
            if init_latent is not None
            else None
        )
        audio = generate_diffusion_cond(
            lambda x, t, c, m, gc, **kw: dit.apply(dit_params, x, t, c, m, gc),
            lambda z: dec.apply(dec_params, z),
            sub, cross, cross_mask, g, cfg,
            init_latent=il,
            init_noise_level=args.init_noise_level,
            mask=inpaint_mask,
        )
        audio = np.asarray(peak_normalize(audio))
        for j, prompt in enumerate(chunk):
            stem = out_dir / f"sample_{i + j:04d}"
            write_wav(str(stem) + ".wav", sr, audio[j].T)
            (stem.parent / (stem.name + ".txt")).write_text(prompt + "\n")
            print(f"wrote {stem}.wav :: {prompt}")


if __name__ == "__main__":
    main()
