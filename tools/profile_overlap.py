#!/usr/bin/env python
"""Profile the A2SB restore step across windowing modes on the real chip.

Usage: python tools/profile_overlap.py [--hop 128] [--shift 0] [--top 20]

Builds the same flagship int8 restore as bench.py (fewer steps so the
trace stays small), captures a jax.profiler trace, and prints the per-op
aggregation — the instrument behind PERF.md's numbers.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--hop", type=int, default=256)
    p.add_argument("--shift", type=int, default=0)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--qres", action="store_true",
                   help="residual_int8: int8 residual stream at L0-L2")
    args = p.parse_args(argv)

    import bench as B

    jax = B._jax_setup()
    import jax.numpy as jnp
    import numpy as np

    from audio_intelligence_tpu import ops
    from audio_intelligence_tpu.models.a2sb.bridge import BridgeSchedule
    from audio_intelligence_tpu.models.a2sb.sampler import bridge_sample
    from audio_intelligence_tpu.models.a2sb.unet import (
        AttnUNetF,
        prequantize_unet,
        sinusoidal_temporal_embedding,
    )
    from tools.profile_trace import aggregate, capture, format_report

    dtype = jnp.bfloat16
    model = AttnUNetF(
        n_updown_levels=5,
        hidden_channels=(128, 256, 512, 768, 1024, 2048),
        emb_channels=128,
        band_embedding_dim=16,
        attention_levels=(3, 4),
        n_attn_heads=8,
        num_res_blocks=2,
        conv_impl="int8",
        use_flash=True,
        io_layout="nchw",
        residual_int8=args.qres,
    )
    sched = BridgeSchedule(beta_max=1.0)
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(B.SEGMENT_SAMPLES).astype(np.float32) * 0.1

    @jax.jit
    def fwd_chain(x):
        spec2 = ops.spectrogram(x, n_fft=2048, hop_length=512)
        msp = ops.complex_to_mag_inst_phase(spec2)
        msp = ops.drop_dc_term(msp)
        msp = ops.power_scale_spectrogram(msp, power=0.25, channels=(0,))
        return jnp.moveaxis(msp, 0, -1)[None]

    x1 = fwd_chain(jnp.asarray(wav))[:, :, : B.N_FRAMES, :]
    mask = (jnp.arange(1024)[None, :, None, None] >= 186).astype(jnp.float32)
    mask = jnp.broadcast_to(mask, x1.shape)
    x1 = (
        x1 * (1 - mask)
        + mask * 0.5 * jax.random.normal(jax.random.PRNGKey(0), x1.shape)
    ).astype(dtype)
    mask = mask.astype(dtype)

    x_init = jnp.moveaxis(x1[:, :, : B.WIN, :], -1, 1)
    te0 = sinusoidal_temporal_embedding(jnp.asarray([0.5]), 128).astype(dtype)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x_init, te0))
    params = B._random_params(jax, shapes, dtype)
    x_small = jnp.moveaxis(x1[:, :, :32, :], -1, 1).astype(dtype)
    params = jax.jit(lambda v: prequantize_unet(model, v, x_small, te0))(params)

    n_windows = (
        (B.N_FRAMES - B.WIN) // args.hop + 1 if args.hop < B.WIN
        else B.N_FRAMES // B.WIN
    )

    # params as a jit argument (closure constants blow the relay's
    # ~28-min remote-compile timeout — see bench.py)
    @jax.jit
    def restore(params, key, x1, mask):
        def vf(x_t, t):
            te = sinusoidal_temporal_embedding(
                jnp.broadcast_to(t, (x_t.shape[0],)), 128
            ).astype(dtype)
            return model.apply(params, x_t.astype(dtype), te)

        t_steps = jnp.linspace(1.0, 0.05, args.steps + 1).astype(dtype)
        out = bridge_sample(
            vf, sched, key, x1, t_steps, mask=mask,
            win_length=B.WIN, hop_length=args.hop, chunk_size=n_windows,
            vf_layout="nchw", window_shift=args.shift,
        )
        return jnp.sum(out.astype(jnp.float32))

    _ = float(restore(params, jax.random.PRNGKey(0), x1, mask))  # compile + warm
    trace_dir = capture(
        lambda: float(restore(params, jax.random.PRNGKey(1), x1, mask))
    )
    report = aggregate(trace_dir, steps=args.steps)
    print(format_report(report, top=args.top))


if __name__ == "__main__":
    main()
