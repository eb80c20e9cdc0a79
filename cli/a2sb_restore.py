#!/usr/bin/env python
"""A2SB restoration CLI — bandwidth extension / inpainting, wav in → wav out.

CLI parity with the reference's restoration entry points:
- ``A2SB/inference/A2SB_upsample_api.py`` (-f input -o output, auto rolloff
  cutoff detection, 50 steps) — here WITHOUT the reference's temp-YAML +
  subprocess hop (upsample_one_sample:64-90): one process, one jit.
- ``A2SB/ensembled_inference.py predict`` (time-partitioned expert
  ensemble via --checkpoints/--t_cutoffs).
- ``A2SB/inference/A2SB_inpaint_dataset.py`` (--inpaint_every/--inpaint_len
  gap schedules, 200 steps default).

Usage:
  python cli/a2sb_restore.py -f in.wav -o out.wav --task upsample
  python cli/a2sb_restore.py -f in.wav -o out.wav --task inpaint \
      --inpaint_start 2.0 --inpaint_len 0.5
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_intelligence_tpu.utils.platform import maybe_force_platform

maybe_force_platform()

import numpy as np


def compute_rolloff_freq(wav: np.ndarray, sr: int, roll_percent: float = 0.99) -> float:
    """99% spectral rolloff (librosa-equivalent; A2SB_upsample_api.py:56-61)."""
    import jax.numpy as jnp

    from audio_intelligence_tpu.ops.stft import stft

    spec = np.abs(np.asarray(stft(jnp.asarray(wav), n_fft=2048, hop_length=512)))
    freqs = np.linspace(0, sr / 2, spec.shape[0])
    cum = np.cumsum(spec, axis=0)
    thresh = roll_percent * cum[-1:]
    idx = np.argmax(cum >= thresh, axis=0)
    return float(np.median(freqs[idx]))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-f", "--input_audio", required=True)
    p.add_argument("-o", "--output_audio", required=True)
    p.add_argument("--task", choices=["upsample", "inpaint"], default="upsample")
    p.add_argument("--checkpoint", default=None, help="exported params (msgpack); random init if absent")
    p.add_argument("--checkpoints", nargs="*", default=None,
                   help="time-partitioned expert checkpoints (with --t_cutoffs)")
    p.add_argument("--t_cutoffs", nargs="*", type=float, default=[0.5])
    p.add_argument("--n_steps", type=int, default=50)
    p.add_argument("--cutoff_freq", type=float, default=None, help="BWE cutoff; auto-detected when omitted")
    p.add_argument("--inpaint_start", type=float, default=None)
    p.add_argument("--inpaint_len", type=float, default=0.5)
    p.add_argument("--win_length", type=int, default=256)
    p.add_argument("--hop_length", type=int, default=128)
    p.add_argument("--chunk_size", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--model_scale", choices=["flagship", "small"], default="small",
                   help="flagship = A2SB pretrain.yaml architecture")
    p.add_argument("--precision", choices=["fp32", "int8"], default="fp32",
                   help="int8 = the production fast path (quantized convs, "
                        "channels-first IO, pallas attention; ~0.5%% rel "
                        "quantization error, bench-gated). Overlapped "
                        "MultiDiffusion (hop < win) runs on the tile-layout "
                        "scan when win %% hop == 0.")
    p.add_argument("--window_shift", type=int, default=0,
                   help="with hop_length == win_length: cyclically shift the "
                        "window grid by this many frames per sampling step "
                        "(boundary-seam mitigation at 1/overlap the compute; "
                        "LSD-gated vs true overlap in tests)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from audio_intelligence_tpu import ops
    from audio_intelligence_tpu.data.audio_io import read_wav, write_wav
    from audio_intelligence_tpu.models.a2sb.bridge import BridgeSchedule
    from audio_intelligence_tpu.models.a2sb.sampler import bridge_sample, select_expert_vf
    from audio_intelligence_tpu.models.a2sb.unet import (
        AttnUNetF,
        sinusoidal_temporal_embedding,
    )

    audio, sr = read_wav(args.input_audio)
    wav = audio.mean(axis=0)  # A2SB is mono 44.1 kHz
    if sr != 44100:
        wav = np.asarray(ops.resample(jnp.asarray(wav), sr, 44100))
        sr = 44100

    # forward transform chain (A2SB/configs pretrain transforms_gt)
    @jax.jit
    def fwd(x):
        spec2 = ops.spectrogram(x, n_fft=2048, hop_length=512)
        msp = ops.complex_to_mag_inst_phase(spec2)
        msp = ops.drop_dc_term(msp)
        msp = ops.power_scale_spectrogram(msp, power=0.25, channels=(0,))
        return jnp.moveaxis(msp, 0, -1)[None]

    x1 = fwd(jnp.asarray(wav))
    b, h, w, c = x1.shape

    if args.task == "upsample":
        cutoff = args.cutoff_freq or compute_rolloff_freq(wav, sr)
        cutoff_bin = int(2048 * cutoff / sr)
        mask = (jnp.arange(h)[None, :, None, None] >= cutoff_bin).astype(jnp.float32)
        mask = jnp.broadcast_to(mask, x1.shape)
        print(f"BWE above {cutoff:.0f} Hz (bin {cutoff_bin})")
        # fill unknown band with noise*0.5 like training corruption
        key = jax.random.PRNGKey(args.seed)
        x1 = x1 * (1 - mask) + mask * jax.random.normal(key, x1.shape) * 0.5
    else:
        start = args.inpaint_start or 0.0
        f0 = int(start * sr / 512)
        f1 = int((start + args.inpaint_len) * sr / 512)
        frames = jnp.arange(w)[None, None, :, None]
        mask = ((frames >= f0) & (frames < f1)).astype(jnp.float32)
        mask = jnp.broadcast_to(mask, x1.shape)
        key = jax.random.PRNGKey(args.seed)
        x1 = x1 * (1 - mask) + mask * jax.random.normal(key, x1.shape) * 0.5
        args.n_steps = max(args.n_steps, 200) if args.n_steps == 50 else args.n_steps

    fast = args.precision == "int8"
    if fast and args.hop_length < args.win_length and args.win_length % args.hop_length:
        p.error("--precision int8 with overlap requires win_length to be a "
                "multiple of hop_length (the tile-layout scan fast path)")
    fast_kw = dict(conv_impl="int8", io_layout="nchw", use_flash=True) if fast else {}
    if args.model_scale == "flagship":
        model = AttnUNetF(**fast_kw)
    else:
        model = AttnUNetF(
            n_updown_levels=3, hidden_channels=(32, 64, 96, 128),
            attention_levels=(2,), n_attn_heads=4, rotary_dim=8,
            **fast_kw,
        )
    # init on a full window: the UNet needs W divisible by 2^levels and the
    # sampler always feeds win_length-frame windows
    x_ex = (
        jnp.zeros((1, 3, h, args.win_length))
        if fast
        else jnp.zeros((1, h, args.win_length, 3))
    )
    t_emb0 = sinusoidal_temporal_embedding(jnp.asarray([0.5]), 128)
    params = model.init(jax.random.PRNGKey(0), x_ex, t_emb0)

    sched = BridgeSchedule(beta_max=1.0)

    def cast_params(p):
        """bf16 params + load-time weight quantization on the int8 fast
        path (the qweights collection makes the sampling scan never
        re-quantize weights; fp32 elementwise would double HBM traffic)."""
        if not fast:
            return p
        from audio_intelligence_tpu.models.a2sb.unet import prequantize_unet

        p = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            p,
        )
        return prequantize_unet(
            model, p, x_ex.astype(jnp.bfloat16), t_emb0.astype(jnp.bfloat16)
        )

    def make_vf(p):
        def vf(x_t, t):
            te = sinusoidal_temporal_embedding(
                jnp.broadcast_to(t, (x_t.shape[0],)), 128
            )
            return model.apply(p, x_t, te)

        return vf

    if args.checkpoints:
        # time-partitioned expert ensemble (ensembled_inference parity)
        from audio_intelligence_tpu.train.checkpoint import load_exported_weights

        assert len(args.checkpoints) == len(args.t_cutoffs) + 1
        expert_params = [cast_params(load_exported_weights(params, c)) for c in args.checkpoints]
        vf = select_expert_vf([make_vf(p) for p in expert_params], args.t_cutoffs)
    else:
        if args.checkpoint:
            from audio_intelligence_tpu.train.checkpoint import load_exported_weights

            params = load_exported_weights(params, args.checkpoint)
        else:
            print("WARNING: no --checkpoint given; using random weights (smoke mode)")
        vf = make_vf(cast_params(params))

    @jax.jit
    def restore(key, x1, mask):
        t_steps = jnp.linspace(1.0, 0.05, args.n_steps + 1)
        return bridge_sample(
            vf, sched, key, x1, t_steps, mask=mask,
            win_length=args.win_length, hop_length=args.hop_length,
            chunk_size=args.chunk_size,
            vf_layout="nchw" if fast else "nhwc",
            window_shift=args.window_shift,
        )

    if fast:
        x1 = x1.astype(jnp.bfloat16)
        mask = mask.astype(jnp.bfloat16)
    out = restore(jax.random.PRNGKey(args.seed + 1), x1, mask)
    if fast:
        # the inverse STFT chain needs f32 (complex from bf16 is invalid)
        out = out.astype(jnp.float32)
        x1 = x1.astype(jnp.float32)

    @jax.jit
    def inv(msp_nhwc):
        msp = jnp.moveaxis(msp_nhwc[0], -1, 0)
        msp = ops.power_scale_spectrogram(msp, power=4.0, channels=(0,))
        msp = ops.add_dc_term(msp)
        msp = ops.svd_fix_mag_inst_phase(msp)
        return ops.inverse_spectrogram(
            ops.mag_inst_phase_to_complex(msp), n_fft=2048, hop_length=512,
            length=len(wav),
        )

    recon = np.asarray(inv(out))
    write_wav(args.output_audio, sr, recon)
    dirty = np.asarray(inv(x1))
    write_wav(str(Path(args.output_audio).with_suffix(".dirty.wav")), sr, dirty)
    print(f"wrote {args.output_audio}")


if __name__ == "__main__":
    main()
