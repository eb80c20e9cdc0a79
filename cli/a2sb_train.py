#!/usr/bin/env python
"""A2SB training CLI (``python main.py fit --config ...`` parity).

YAML config with the reference's structure (model.vf_model init_args,
data.mix_dataset_config, transforms as class_path lists are replaced by
the built-in GT/corruption chain parameters). Runs the jitted bridge
train step over the GSPMD mesh with checkpointing every
``every_n_train_steps``.

Usage:
  python cli/a2sb_train.py --config configs/a2sb_pretrain.yaml
  python cli/a2sb_train.py --smoke        # tiny synthetic run
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
    p.add_argument("--config", default=None)
    p.add_argument("--smoke", action="store_true", help="synthetic tiny training run")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--ckpt_dir", default="exp/a2sb")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from audio_intelligence_tpu import ops
    from audio_intelligence_tpu.models.a2sb import corruption
    from audio_intelligence_tpu.models.a2sb.bridge import BridgeSchedule
    from audio_intelligence_tpu.models.a2sb.training import (
        TrainState,
        make_optimizer,
        make_train_step,
        make_validation_fn,
    )
    from audio_intelligence_tpu.models.a2sb.unet import (
        AttnUNetF,
        sinusoidal_temporal_embedding,
    )
    from audio_intelligence_tpu.train.loop import TrainLoopConfig, run_training
    from audio_intelligence_tpu.utils.config import load_config

    if args.config:
        cfg = load_config(args.config)
        model_args = dict(cfg.model.vf_model.init_args)
        lr = cfg.model.get("learning_rate", 8e-5)
        beta_max = cfg.model.get("beta_max", 1.0)
        seg = cfg.data.get("segment_length", 130560)
        batch_size = cfg.data.get("batch_size", 10)
        mix_cfg = dict(cfg.data.mix_dataset_config)
        max_steps = args.max_steps or cfg.get("max_steps", 1_000_000)
        save_every = cfg.get("checkpoint_callback", {}).get("every_n_train_steps", 1000)
    elif args.smoke:
        model_args = dict(
            n_updown_levels=2, hidden_channels=(16, 32, 32), emb_channels=128,
            band_embedding_dim=4, attention_levels=(1,), n_attn_heads=2,
            num_res_blocks=1, rotary_dim=4,
        )
        lr, beta_max, seg, batch_size = 1e-3, 1.0, 4096, 2
        mix_cfg, max_steps, save_every = None, args.max_steps or 5, 5
    else:
        p.error("need --config or --smoke")

    model = AttnUNetF(**model_args)
    sched = BridgeSchedule(beta_max=beta_max)
    tx = make_optimizer(learning_rate=lr)
    step_fn = jax.jit(make_train_step(model.apply, sched, tx))

    n_fft, hop = 2048, 512

    def gt_transform(wav):
        spec2 = ops.spectrogram(jnp.asarray(wav), n_fft=n_fft, hop_length=hop)
        msp = ops.complex_to_mag_inst_phase(spec2)
        msp = ops.drop_dc_term(msp)
        msp = ops.power_scale_spectrogram(msp, power=0.25, channels=(0,))
        return jnp.moveaxis(msp, 0, -1)

    corr = corruption.MultinomialCorruption(
        p_upsample_mask=0.5, p_extension_mask=0.0, p_inpaint_mask=0.5,
        fill_noise_level=0.5, sampling_rate=44100,
        upsample_mask_kwargs=dict(min_cutoff_freq=2000, max_cutoff_freq=16000),
        inpainting_mask_kwargs=dict(
            min_inpainting_frac=0.03378, max_inpainting_frac=0.5404, is_random=True
        ),
    )

    if mix_cfg is not None:
        from audio_intelligence_tpu.data.a2sb_dataset import MixAudioDataset

        ds = MixAudioDataset(
            mix_cfg, segment_length=seg, sampling_rate=44100,
            gt_transform=gt_transform, corruption=corr,
        )
        rng = np.random.default_rng(0)

        def batches():
            while True:
                yield from ds.iter_batches(batch_size, rng)

        batch_iter = batches()
        sample = next(batch_iter)
        h, w = sample["x_0_clean"].shape[1:3]
        # sampling validation (validation_step semantics,
        # A2SB_lightning_module.py:433-476): hold one batch out as the
        # fixed val set — the 25-step sampler + LSD/SI-SDR run on it at
        # every checkpoint interval
        val_batch = sample
    else:  # smoke: synthetic spectrogram batches
        rng = np.random.default_rng(0)
        h, w = 16, 8

        def batches():
            while True:
                clean = rng.standard_normal((batch_size, h, w, 3)).astype(np.float32)
                yield {
                    "x_0_clean": clean,
                    "x_0_corrupted": clean + rng.standard_normal(clean.shape).astype(np.float32),
                    "loss_mask": np.ones((batch_size, h, w, 1), np.float32),
                }

        batch_iter = batches()
        val_batch = next(batch_iter)

    x0 = jnp.zeros((1, h, w, 3))
    t_emb = sinusoidal_temporal_embedding(jnp.asarray([0.5]), 128)
    params = model.init(jax.random.PRNGKey(0), x0, t_emb)["params"]
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    key_holder = {"key": jax.random.PRNGKey(0)}

    def wrapped_step(state, batch):
        key_holder["key"], sub = jax.random.split(key_holder["key"])
        return step_fn(state, sub, {k: jnp.asarray(v) for k, v in batch.items()})

    valid_fn = make_validation_fn(
        model.apply, sched, val_batch,
        n_steps=5 if args.smoke else 25,
    )

    loop_cfg = TrainLoopConfig(
        max_steps=max_steps, save_interval=save_every, log_interval=1 if args.smoke else 50,
        ckpt_dir=args.ckpt_dir, ckpt_keep=None,
    )
    state, step = run_training(
        state, wrapped_step, batch_iter, loop_cfg, valid_fn=valid_fn
    )
    print(f"finished at step {step}")


if __name__ == "__main__":
    main()
