#!/usr/bin/env python
"""UALM training CLI (``deepspeed scripts/train.py`` parity, GSPMD-native).

YAML job config (conf/train.yaml schema subset) or --smoke. Uses the
resumable DataIteratorFactory with loader-state replay and the sharded
multistream train step.

Usage:
  python cli/ualm_train.py --smoke
  python cli/ualm_train.py --config conf/train.yaml --stats_dir stats/ \
      --specifiers caption_to_audio:ds1 text_only:ds2:2.0
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
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--specifiers", nargs="*", default=[])
    p.add_argument("--stats_dir", default="stats")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--ckpt_dir", default="exp/ualm")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from audio_intelligence_tpu.models.ualm.backbone import BackboneConfig
    from audio_intelligence_tpu.models.ualm.lm import ParallelLM
    from audio_intelligence_tpu.models.ualm.training import (
        UALMTrainState,
        make_ualm_optimizer,
        make_ualm_train_step,
    )
    from audio_intelligence_tpu.models.ualm.vocab import build_loss_intervals
    from audio_intelligence_tpu.train.loop import TrainLoopConfig, run_training
    from audio_intelligence_tpu.utils.config import load_config

    if args.smoke:
        cfg = BackboneConfig.tiny()
        vocab_size, num_stream, bs, seq_len = 300, 4, 2, 24
        loss_intervals = [(260, 300)]
        max_steps = args.max_steps or 4

        rng = np.random.default_rng(0)

        def batches():
            while True:
                ids = rng.integers(1, 260, (bs, seq_len, num_stream))
                ids[:, :, 1:] = rng.integers(260, 300, (bs, seq_len, num_stream - 1))
                yield {
                    "seqs": jnp.asarray(ids),
                    "loss_masks": jnp.asarray(
                        (rng.random((bs, seq_len, num_stream)) > 0.2).astype(np.float32)
                    ),
                }

        batch_iter = batches()
    else:
        job = load_config(args.config)
        mc = job.model.get("model_conf", {})
        cfg = BackboneConfig(
            hidden_size=mc.get("hidden_size", 1536),
            num_layers=mc.get("num_layers", 28),
            num_heads=mc.get("num_heads", 12),
            num_kv_heads=mc.get("num_kv_heads", 2),
            intermediate_size=mc.get("intermediate_size", 8960),
            remat=job.model.get("activation_checkpointing", False),
            # per-clip token cap of the packing pipeline → the flash
            # kernel walks only the diagonal K/V band (its ≤-bound
            # caller contract; see ops/pallas_attention.py)
            flash_max_segment_len=mc.get("flash_max_segment_len"),
        )
        raise SystemExit(
            "full-config training requires prepared stats + manifests; "
            "see data/ualm_iterator.py DataIteratorFactory"
        )

    model = ParallelLM(cfg=cfg, vocab_size=vocab_size, num_stream=num_stream)
    ids0 = jnp.zeros((1, 8, num_stream), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids0)["params"]
    tx = make_ualm_optimizer(params)
    state = UALMTrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step_fn = jax.jit(make_ualm_train_step(model, tx, loss_intervals))

    loop_cfg = TrainLoopConfig(
        max_steps=max_steps, save_interval=1000,
        log_interval=1 if args.smoke else 50, ckpt_dir=args.ckpt_dir,
    )
    state, step = run_training(state, step_fn, batch_iter, loop_cfg)
    print(f"finished UALM training at step {step}")


if __name__ == "__main__":
    main()
