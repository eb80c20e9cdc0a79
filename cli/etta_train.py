#!/usr/bin/env python
"""ETTA training CLI (``torchrun train.py --model_config ...`` parity).

Supports both training modes:
- ``--model_type diffusion_cond`` — RF DiT training (logit-normal t,
  cfg-dropout, EMA) over VAE latents,
- ``--model_type autoencoder``    — GAN-VAE training (alternating
  generator/discriminator steps post warmup).

JSON model configs use the reference schema; ``--params a.b.c=v``
dot-overrides apply (ETTA/train.py:100-130 semantics).

Usage:
  python cli/etta_train.py --model_type autoencoder --smoke
  python cli/etta_train.py --model_config cfg.json --dataset_config ds.json
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_intelligence_tpu.utils.platform import maybe_force_platform

maybe_force_platform()

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_config", default=None)
    p.add_argument("--dataset_config", default=None)
    p.add_argument("--model_type", default=None)
    p.add_argument("--params", nargs="*", default=[])
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--ckpt_dir", default="exp/etta")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from audio_intelligence_tpu.train.loop import TrainLoopConfig, run_training
    from audio_intelligence_tpu.utils.config import load_config, update_params, AttrDict

    cfg = AttrDict()
    if args.model_config:
        cfg = load_config(args.model_config)
    update_params(cfg, args.params)
    model_type = args.model_type or cfg.get("model_type", "diffusion_cond")

    if model_type == "autoencoder":
        from audio_intelligence_tpu.models.etta.bottleneck import VAEBottleneck
        from audio_intelligence_tpu.models.etta.discriminators import (
            MultiScaleSTFTDiscriminator,
        )
        from audio_intelligence_tpu.models.etta.training import (
            VAETrainState,
            make_vae_optimizers,
            make_vae_train_steps,
            vae_step_is_disc,
        )
        from audio_intelligence_tpu.models.etta.vae import (
            AudioAutoencoder,
            OobleckDecoder,
            OobleckEncoder,
        )

        if args.smoke:
            latent, channels, c_mults, strides, sr, sample_size, bs = (
                4, 8, (1, 2), (2, 2), 16000, 1024, 2
            )
            disc = MultiScaleSTFTDiscriminator(
                filters=4, n_ffts=(128, 64), hop_lengths=(32, 16),
                win_lengths=(128, 64), in_channels=1,
            )
            io_ch = 1
        else:
            m = cfg.model
            latent = m.get("latent_dim", 64)
            enc_cfg, dec_cfg = m.encoder.config, m.decoder.config
            channels = enc_cfg.get("channels", 128)
            c_mults = tuple(enc_cfg.get("c_mults", (1, 2, 4, 8, 16)))
            strides = tuple(enc_cfg.get("strides", (2, 4, 4, 8, 8)))
            sr = cfg.get("sample_rate", 44100)
            sample_size = cfg.get("sample_size", 65536)
            bs = cfg.get("batch_size", 4)
            io_ch = m.get("io_channels", 2)
            dcfg = cfg.training.loss_configs.discriminator.config
            disc = MultiScaleSTFTDiscriminator(
                filters=dcfg.get("filters", 64),
                n_ffts=tuple(dcfg.get("n_ffts", (2048, 1024, 512, 256, 128))),
                hop_lengths=tuple(dcfg.get("hop_lengths", (512, 256, 128, 64, 32))),
                win_lengths=tuple(dcfg.get("win_lengths", (2048, 1024, 512, 256, 128))),
                in_channels=io_ch,
            )

        enc = OobleckEncoder(
            in_channels=io_ch, channels=channels, latent_dim=2 * latent,
            c_mults=c_mults, strides=strides,
        )
        dec = OobleckDecoder(
            out_channels=io_ch, channels=channels, latent_dim=latent,
            c_mults=c_mults, strides=strides,
        )
        ae = AudioAutoencoder(
            encoder=enc, decoder=dec, bottleneck=VAEBottleneck(), io_channels=io_ch
        )

        reals0 = jnp.zeros((bs, sample_size, io_ch))
        gp = ae.init(jax.random.PRNGKey(0), reals0, jax.random.PRNGKey(1))["params"]
        dp = disc.init(jax.random.PRNGKey(2), reals0)["params"]
        gen_tx, disc_tx = make_vae_optimizers()
        state = VAETrainState(gp, dp, gp, gen_tx.init(gp), disc_tx.init(dp), jnp.zeros((), jnp.int32))
        gen_step, disc_step = make_vae_train_steps(
            ae.apply, disc.apply, gen_tx, disc_tx, sample_rate=sr,
            stereo=io_ch == 2,
        )
        gen_step, disc_step = jax.jit(gen_step), jax.jit(disc_step)

        rng = np.random.default_rng(0)
        key_holder = {"key": jax.random.PRNGKey(0), "i": 0}

        def wrapped(state, reals):
            key_holder["key"], sub = jax.random.split(key_holder["key"])
            i = key_holder["i"]
            key_holder["i"] += 1
            if vae_step_is_disc(i, warmup_steps=1):
                return disc_step(state, sub, jnp.asarray(reals))
            return gen_step(state, sub, jnp.asarray(reals))

        if args.smoke:
            def batches():
                while True:
                    yield rng.standard_normal((bs, sample_size, io_ch)).astype(np.float32) * 0.1
        else:
            from audio_intelligence_tpu.data.etta_dataset import SampleDataset

            ds_cfg = load_config(args.dataset_config)
            ds = SampleDataset(
                configs=list(ds_cfg.get("datasets", [])),
                sample_size=sample_size, sample_rate=sr, channels=io_ch,
            )

            def batches():
                while True:
                    for audio, _ in ds.iter_batches(bs, rng):
                        yield np.moveaxis(audio, 1, -1)

        loop_cfg = TrainLoopConfig(
            max_steps=args.max_steps or 4, save_interval=1000,
            log_interval=1 if args.smoke else 50, ckpt_dir=args.ckpt_dir,
        )
        state, step = run_training(state, wrapped, batches(), loop_cfg)
        print(f"finished VAE training at step {step}")
        return

    # diffusion_cond
    from audio_intelligence_tpu.models.etta.conditioners import (
        MultiConditioner,
        hash_text_embedding,
        route_conditioning,
    )
    from audio_intelligence_tpu.models.etta.dit import DiffusionTransformer
    from audio_intelligence_tpu.models.etta.training import (
        DiffusionTrainState,
        make_diffusion_optimizer,
        make_diffusion_train_step,
    )

    if args.smoke:
        latent, t_len, bs = 4, 16, 2
        dit = DiffusionTransformer(
            io_channels=latent, embed_dim=32, depth=1, num_heads=2,
            cond_token_dim=8, global_cond_dim=16, xattn_heads=2, xattn_d_memory=8,
        )
        cond_dim, num_dim = 8, 8
    else:
        d = cfg.model.diffusion.config
        dit = DiffusionTransformer(
            io_channels=d.get("io_channels", 64),
            embed_dim=d.get("embed_dim", 1536),
            depth=d.get("depth", 24),
            num_heads=d.get("num_heads", 24),
            cond_token_dim=d.get("cond_token_dim", 768),
            global_cond_dim=d.get("global_cond_dim", 1536),
            rope_base=d.get("rope_base", 16384),
            p_dropout=d.get("p_dropout", 0.1),
        )
        latent = d.get("io_channels", 64)
        t_len = cfg.get("sample_size", 441000) // 2048
        bs = cfg.get("batch_size", 4)
        cond_dim = num_dim = d.get("cond_token_dim", 768)

    mc = MultiConditioner(number_dim=num_dim, text_ids=("prompt",))
    rng = np.random.default_rng(0)

    def make_batch():
        prompts = [f"synthetic prompt {rng.integers(100)}" for _ in range(bs)]
        emb, mask = hash_text_embedding(prompts, dim=cond_dim, max_length=16)
        metadata = {
            "prompt_embed": jnp.asarray(emb),
            "prompt_mask": jnp.asarray(mask),
            "seconds_start": jnp.zeros(bs),
            "seconds_total": jnp.full(bs, 10.0),
        }
        return metadata

    md0 = make_batch()
    mc_params = mc.init(jax.random.PRNGKey(3), md0)
    cond0 = mc.apply(mc_params, md0)
    cross0, cm0, g0 = route_conditioning(cond0)
    x0 = jnp.zeros((bs, t_len, latent))
    params = dit.init(
        jax.random.PRNGKey(0), x0, jnp.full((bs,), 0.5), cross0, cm0, g0
    )["params"]
    tx = make_diffusion_optimizer()
    state = DiffusionTrainState(params, params, tx.init(params), jnp.zeros((), jnp.int32))
    step_fn = jax.jit(make_diffusion_train_step(dit.apply, tx))

    key_holder = {"key": jax.random.PRNGKey(0)}

    def wrapped(state, batch):
        key_holder["key"], sub = jax.random.split(key_holder["key"])
        return step_fn(state, sub, batch)

    def batches():
        while True:
            md = make_batch()
            cond = mc.apply(mc_params, md)
            cross, cm, g = route_conditioning(cond)
            yield {
                "latents": jnp.asarray(
                    rng.standard_normal((bs, t_len, latent)), jnp.float32
                ),
                "cross_attn_cond": cross,
                "cross_attn_mask": cm,
                "global_cond": g,
            }

    loop_cfg = TrainLoopConfig(
        max_steps=args.max_steps or 3, save_interval=10000,
        log_interval=1 if args.smoke else 50, ckpt_dir=args.ckpt_dir,
    )
    state, step = run_training(state, wrapped, batches(), loop_cfg)
    print(f"finished DiT training at step {step}")


if __name__ == "__main__":
    main()
