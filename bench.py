"""Benchmark entry — prints ONE JSON line.

Headline metric (BASELINE.md rebuild targets): A2SB 44.1 kHz bandwidth-
extension real-time factor per chip — 50 bridge-sampling steps with the
flagship AttnUNetF (A2SB/configs/pretrain.yaml architecture) over a
23.8 s segment, MultiDiffusion windows (win = hop = 256 frames, the
``ddpm_sample`` defaults) batched 8-wide per step, bf16, the whole
trajectory one compiled ``lax.scan``. Baseline target: 5× real-time per
v5e chip (vs_baseline = RTF / 5.0).

Perf notes (round-1 profiling): per-kernel overhead dominates small
batches on this chip (~2 ms/op regardless of FLOPs); batching the
windows reaches ~50% MXU utilization (~22.6 ms/window/step).
"""

from __future__ import annotations

import json
import time

import numpy as np

SAMPLE_RATE = 44100
N_FRAMES = 2048  # → 8 windows of 256
SEGMENT_SAMPLES = N_FRAMES * 512  # 23.78 s
N_STEPS = 50
WIN = 256


def main():
    import os

    import jax

    # persistent compilation cache: the flagship restore program takes
    # ~10 min to compile on the axon relay; a pre-warmed cache (committed
    # under .jax_cache) makes reruns start in seconds
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    # rbg PRNG: hardware-accelerated random bits on TPU (threefry costs
    # real time at 25 MB of noise per sampling step)
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from audio_intelligence_tpu import ops
    from audio_intelligence_tpu.models.a2sb.bridge import BridgeSchedule
    from audio_intelligence_tpu.models.a2sb.sampler import bridge_sample
    from audio_intelligence_tpu.models.a2sb.unet import (
        AttnUNetF,
        sinusoidal_temporal_embedding,
    )

    dtype = jnp.bfloat16
    model = AttnUNetF(
        n_updown_levels=5,
        hidden_channels=(128, 256, 512, 768, 1024, 2048),
        emb_channels=128,
        band_embedding_dim=16,
        attention_levels=(3, 4),
        n_attn_heads=8,
        num_res_blocks=2,
    )
    sched = BridgeSchedule(beta_max=1.0)

    rng = np.random.default_rng(0)
    wav = rng.standard_normal(SEGMENT_SAMPLES).astype(np.float32) * 0.1

    @jax.jit
    def fwd_chain(x):
        spec2 = ops.spectrogram(x, n_fft=2048, hop_length=512)
        msp = ops.complex_to_mag_inst_phase(spec2)
        msp = ops.drop_dc_term(msp)
        msp = ops.power_scale_spectrogram(msp, power=0.25, channels=(0,))
        return jnp.moveaxis(msp, 0, -1)[None]

    x1 = fwd_chain(jnp.asarray(wav))[:, :, :N_FRAMES, :]
    cutoff = int(2048 * 4000 / SAMPLE_RATE)
    mask = (jnp.arange(1024)[None, :, None, None] >= cutoff).astype(jnp.float32)
    mask = jnp.broadcast_to(mask, x1.shape)
    x1 = (x1 * (1 - mask) + mask * 0.5 * jax.random.normal(jax.random.PRNGKey(0), x1.shape)).astype(dtype)
    mask = mask.astype(dtype)

    # params via eval_shape (no init compile), true bf16
    te0 = sinusoidal_temporal_embedding(jnp.asarray([0.5]), 128).astype(dtype)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x1[:, :, :WIN, :], te0)
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, dtype), shapes)

    def vf(x_t, t):
        te = sinusoidal_temporal_embedding(
            jnp.broadcast_to(t, (x_t.shape[0],)), 128
        ).astype(dtype)
        return model.apply(params, x_t.astype(dtype), te)

    @jax.jit
    def restore(key, x1, mask):
        t_steps = jnp.linspace(1.0, 0.05, N_STEPS + 1).astype(dtype)
        out = bridge_sample(
            vf, sched, key, x1, t_steps, mask=mask,
            win_length=WIN, hop_length=WIN, chunk_size=N_FRAMES // WIN,
        )
        # scalar checksum: forces execution; fetching the full spectrogram
        # through the dev tunnel would time the transfer, not the chip
        return out, jnp.sum(out.astype(jnp.float32))

    _, chk = restore(jax.random.PRNGKey(0), x1, mask)
    _ = float(chk)  # compile + warmup, forced sync

    t0 = time.perf_counter()
    _, chk = restore(jax.random.PRNGKey(1), x1, mask)
    _ = float(chk)
    dt = time.perf_counter() - t0

    rtf = (SEGMENT_SAMPLES / SAMPLE_RATE) / dt
    print(
        json.dumps(
            {
                "metric": "a2sb_bwe_rtf_50step_per_chip",
                "value": round(rtf, 3),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / 5.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
