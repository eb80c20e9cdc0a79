#!/usr/bin/env python
"""Convert reference PyTorch checkpoints → flax params.

Covers:
- A2SB ``AttnUNetF`` (Lightning ckpts: 'vf_model.'-prefixed state dict,
  A2SB_lightning_module.py:63-78 filtering semantics),
- ETTA Oobleck VAE (weight-norm v/g reparameterization preserved 1:1).

Layout translations:
- Conv2d OIHW → flax HWIO (transpose 2,3,1,0); Conv1d OIW → WIO (2,1,0),
- ConvTranspose1d (in,out,k) → (k,in,out),
- GroupNorm/LayerNorm weight → scale,
- the ResBlock 1×1 conditioning conv [2C, E_b+E_t, 1, 1] → the separable
  ScaleShiftEmbed kernel [(E_b+E_t), 2C] (band rows first — same concat
  order as the reference, see unet.py ScaleShiftEmbed).

Usage:
  python tools/convert_checkpoint.py --kind a2sb_unet --input ckpt.pt \
      --output params.msgpack
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _conv2d(w):  # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _conv1d(w):  # OIW -> WIO
    return np.transpose(w, (2, 1, 0))


def _tconv1d(w):  # (in,out,k) -> (k,in,out)
    return np.transpose(w, (2, 0, 1))


def convert_a2sb_unet(
    state_dict: dict,
    n_updown_levels: int = 5,
    num_res_blocks: int = 2,
    attention_levels=(3, 4),
    strip_prefix: str = "vf_model.",
) -> dict:
    """Reference ``AttnUNetF`` state dict → flax params tree matching
    audio_intelligence_tpu.models.a2sb.unet.AttnUNetF."""
    sd = {
        k[len(strip_prefix):] if k.startswith(strip_prefix) else k: np.asarray(v)
        for k, v in state_dict.items()
    }
    out: dict = {}

    def put(path: str, value):
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def conv(dst, src):
        put(f"{dst}/kernel", _conv2d(sd[f"{src}.weight"]))
        put(f"{dst}/bias", sd[f"{src}.bias"])

    def groupnorm(dst, src):
        put(f"{dst}/scale", sd[f"{src}.weight"])
        put(f"{dst}/bias", sd[f"{src}.bias"])

    def resblock(dst, src):
        groupnorm(f"{dst}/GroupNorm32_0", f"{src}.in_layers.0")
        conv(f"{dst}/in_conv", f"{src}.in_layers.2")
        w = sd[f"{src}.emb_layers.1.weight"][:, :, 0, 0]  # [2C, E]
        put(f"{dst}/emb_proj/kernel", w.T)
        put(f"{dst}/emb_proj/bias", sd[f"{src}.emb_layers.1.bias"])
        groupnorm(f"{dst}/out_norm", f"{src}.out_norm")
        conv(f"{dst}/out_conv", f"{src}.out_rest.2")

    def attn(dst, src):
        if f"{src}.gnorm.weight" in sd:
            groupnorm(f"{dst}/gnorm", f"{src}.gnorm")
        for proj in ("q_proj", "k_proj", "v_proj"):
            conv(f"{dst}/{proj}", f"{src}.{proj}")

    conv("input_projection", "input_projection")

    attn_set = set(attention_levels)
    dec_attn = {n_updown_levels - 1 - a for a in attn_set}
    for level in range(n_updown_levels):
        # encoder sequential: [Res, (Attn)] × num_res_blocks
        seq = 0
        for i in range(num_res_blocks):
            resblock(f"enc{level}_res{i}", f"enc_blocks.{level}.{seq}")
            seq += 1
            if level in attn_set:
                attn(f"enc{level}_attn{i}", f"enc_blocks.{level}.{seq}")
                seq += 1
        conv(f"down{level}", f"ds_layers.{level}.op")

        seq = 0
        for i in range(num_res_blocks):
            resblock(f"dec{level}_res{i}", f"dec_blocks.{level}.{seq}")
            seq += 1
            if level in dec_attn:
                attn(f"dec{level}_attn{i}", f"dec_blocks.{level}.{seq}")
                seq += 1
        conv(f"up{level}", f"us_layers.{level}.conv")

    resblock("mid_res0", "middle_block.0")
    attn("mid_attn", "middle_block.1")
    resblock("mid_res1", "middle_block.2")

    groupnorm("out_norm", "output_projection.0")
    conv("output_projection", "output_projection.2")
    return out


def convert_oobleck(
    state_dict: dict,
    n_blocks: int,
    decoder: bool = False,
    prefix: str = "",
) -> dict:
    """Reference OobleckEncoder/Decoder → flax params.

    torch layer indices (autoencoders.py): layers.0 first conv; blocks at
    layers.1..n; then [act, final_conv] (encoder) / [act, final_conv,
    (tanh)] (decoder). Inside blocks: encoder EncoderBlock.layers =
    [RU, RU, RU, act, down]; decoder DecoderBlock.layers =
    [act, up, RU, RU, RU]; RU.layers = [act, conv1, act, conv2].
    """
    sd = {
        k[len(prefix):] if k.startswith(prefix) else k: np.asarray(v)
        for k, v in state_dict.items()
    }
    out: dict = {}

    def put(path, value):
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def wnconv(dst, src, transpose=False):
        v = sd[f"{src}.weight_v"]
        g = sd[f"{src}.weight_g"]
        put(f"{dst}/v", _tconv1d(v) if transpose else _conv1d(v))
        put(f"{dst}/g", g.reshape(-1))
        if f"{src}.bias" in sd:
            put(f"{dst}/bias", sd[f"{src}.bias"])

    def snake(dst, src):
        put(f"{dst}/alpha", sd[f"{src}.alpha"])
        put(f"{dst}/beta", sd[f"{src}.beta"])

    def resunit(dst, src):
        snake(f"{dst}/act1", f"{src}.layers.0")
        wnconv(f"{dst}/conv1", f"{src}.layers.1")
        snake(f"{dst}/act2", f"{src}.layers.2")
        wnconv(f"{dst}/conv2", f"{src}.layers.3")

    wnconv("first_conv", "layers.0")
    for b in range(n_blocks):
        base = f"layers.{b + 1}.layers"
        dst = f"block{b}"
        if not decoder:
            for i in range(3):
                resunit(f"{dst}/res{i}", f"{base}.{i}")
            snake(f"{dst}/act", f"{base}.3")
            wnconv(f"{dst}/down", f"{base}.4")
        else:
            snake(f"{dst}/act", f"{base}.0")
            wnconv(f"{dst}/up", f"{base}.1", transpose=True)
            for i in range(3):
                resunit(f"{dst}/res{i}", f"{base}.{i + 2}")
    snake("final_act", f"layers.{n_blocks + 1}")
    wnconv("final_conv", f"layers.{n_blocks + 2}")
    return out


def convert_etta_dit(
    state_dict: dict,
    depth: int = 24,
    strip_prefix: str = "model.model.",
) -> dict:
    """Reference ``DiffusionTransformer`` (etta_transformer backend) state
    dict → flax params for models/etta/dit.DiffusionTransformer.

    Reference torch names (dit.py + etta_transformer.py):
    timestep_features.weight; to_timestep_embed.{0,2}; to_cond_embed.{0,2};
    to_global_embed.{0,2}; preprocess_conv/postprocess_conv (1×1 Conv1d,
    no bias); transformer.project_in (Conv1d k=1);
    transformer.model.blocks.{i}.{adaLN_modulation.1, self_attention.qkv_net/
    o_net, cross_attention.q_net/kv_net/o_net, norm_xattn_cross.weight,
    norm_pos_ff.weight, pos_ff.proj.conv/o_net.conv};
    transformer.project_out.{adaLN_modulation.1, linear}.
    """
    sd = {
        k[len(strip_prefix):] if k.startswith(strip_prefix) else k: np.asarray(v)
        for k, v in state_dict.items()
    }
    out: dict = {}

    def put(path, value):
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def linear(dst, src, bias=True):
        put(f"{dst}/kernel", sd[f"{src}.weight"].T)
        if bias and f"{src}.bias" in sd:
            put(f"{dst}/bias", sd[f"{src}.bias"])

    def conv1(dst, src, bias=True):
        put(f"{dst}/kernel", _conv1d(sd[f"{src}.weight"]))
        if bias and f"{src}.bias" in sd:
            put(f"{dst}/bias", sd[f"{src}.bias"])

    put("timestep_features/weight", sd["timestep_features.weight"])
    linear("to_timestep_embed_fc1", "to_timestep_embed.0")
    linear("to_timestep_embed_fc2", "to_timestep_embed.2")
    linear("to_cond_embed/fc1", "to_cond_embed.0", bias=False)
    linear("to_cond_embed/fc2", "to_cond_embed.2", bias=False)
    linear("to_global_embed/fc1", "to_global_embed.0", bias=False)
    linear("to_global_embed/fc2", "to_global_embed.2", bias=False)
    conv1("preprocess_conv", "preprocess_conv", bias=False)
    conv1("postprocess_conv", "postprocess_conv", bias=False)
    conv1("project_in", "transformer.project_in")

    for i in range(depth):
        src = f"transformer.model.blocks.{i}"
        dst = f"block{i}"
        linear(f"{dst}/adaLN_modulation", f"{src}.adaLN_modulation.1")
        linear(f"{dst}/self_attention/qkv_net", f"{src}.self_attention.qkv_net", bias=False)
        linear(f"{dst}/self_attention/o_net", f"{src}.self_attention.o_net", bias=False)
        linear(f"{dst}/cross_attention/q_net", f"{src}.cross_attention.q_net", bias=False)
        linear(f"{dst}/cross_attention/kv_net", f"{src}.cross_attention.kv_net", bias=False)
        linear(f"{dst}/cross_attention/o_net", f"{src}.cross_attention.o_net", bias=False)
        put(f"{dst}/norm_xattn_cross/LayerNorm_0/scale", sd[f"{src}.norm_xattn_cross.weight"])
        put(f"{dst}/norm_pos_ff/LayerNorm_0/scale", sd[f"{src}.norm_pos_ff.weight"])
        conv1(f"{dst}/pos_ff/proj", f"{src}.pos_ff.proj.conv", bias=False)
        conv1(f"{dst}/pos_ff/o_net", f"{src}.pos_ff.o_net.conv", bias=False)

    linear("project_out/adaLN_modulation", "transformer.project_out.adaLN_modulation.1")
    linear("project_out/linear", "transformer.project_out.linear")
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--kind",
        choices=[
            "a2sb_unet", "oobleck_encoder", "oobleck_decoder", "etta_dit",
            "t5_encoder", "ualm_backbone", "whisper_tower", "xcodec",
            "omni_tower",
        ],
        required=True,
    )
    p.add_argument("--num_heads", type=int, default=None,
                   help="attention heads (ualm_backbone default 12 = "
                   "Qwen2.5-1.5B; whisper_tower default d_model/64)")
    p.add_argument("--unified_vocab", type=int, default=165536,
                   help="ualm_backbone: unified multimodal vocab size")
    p.add_argument("--text_start", type=int, default=256,
                   help="ualm_backbone: start of the text interval "
                   "(UALMJobTemplate reserves 256 special tokens first)")
    p.add_argument("--num_stream", type=int, default=8)
    p.add_argument("--depth", type=int, default=24)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--n_blocks", type=int, default=5)
    p.add_argument(
        "--unsafe-pickle", action="store_true", dest="unsafe_pickle",
        help="allow full unpickling (arbitrary code execution risk) for "
        "legacy checkpoints that torch.load(weights_only=True) rejects",
    )
    args = p.parse_args(argv)

    import torch
    from flax import serialization

    # weights_only=True by default: converted checkpoints are plain tensor
    # state dicts; full unpickling of externally obtained files allows
    # arbitrary code execution and must be an explicit opt-in.
    try:
        ckpt = torch.load(
            args.input, map_location="cpu", weights_only=not args.unsafe_pickle
        )
    except Exception as e:
        if args.unsafe_pickle:
            raise
        raise SystemExit(
            f"safe (weights_only) load failed: {e}\n"
            "If this is a trusted legacy checkpoint that needs full "
            "unpickling, re-run with --unsafe-pickle."
        )
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}

    if args.kind == "a2sb_unet":
        params = convert_a2sb_unet(sd)
    elif args.kind == "oobleck_encoder":
        params = convert_oobleck(sd, args.n_blocks, decoder=False)
    elif args.kind == "etta_dit":
        params = convert_etta_dit(sd, depth=args.depth)
    elif args.kind == "t5_encoder":
        # HF T5EncoderModel (ETTA conditioners.py:241-326 T5Conditioner's
        # frozen encoder) → flax T5Encoder; config inferred from shapes
        from audio_intelligence_tpu.models.etta.t5 import (
            convert_hf_t5_encoder,
            infer_t5_config,
        )

        cfg = infer_t5_config(sd)
        print(f"inferred {cfg}")
        params = convert_hf_t5_encoder(sd, cfg)
    elif args.kind == "ualm_backbone":
        # HF Qwen2 → ParallelLM with the unified-vocab embed/lm_head
        # rebuild (UALM parallel.py:51-174); fresh init provides the
        # from-scratch rows/streams, then pretrained weights overwrite
        import jax
        import jax.numpy as jnp

        from audio_intelligence_tpu.models.ualm.convert import (
            convert_qwen2_to_parallel_lm,
            infer_qwen2_config,
        )
        from audio_intelligence_tpu.models.ualm.lm import ParallelLM

        cfg = infer_qwen2_config(sd, num_heads=args.num_heads or 12)
        print(f"inferred {cfg}")
        model = ParallelLM(
            cfg=cfg, vocab_size=args.unified_vocab, num_stream=args.num_stream
        )
        init = model.init(
            jax.random.PRNGKey(0), jnp.ones((1, 2, args.num_stream), jnp.int32)
        )["params"]
        params = convert_qwen2_to_parallel_lm(sd, init, args.text_start)
    elif args.kind == "whisper_tower":
        # reference AFWhisperEncoder (UALM modeling_whisper.py:589-766) →
        # flax WhisperTower; config inferred from tensor shapes
        from audio_intelligence_tpu.models.ualm.convert import (
            convert_whisper_tower,
            infer_whisper_config,
        )

        print(f"inferred {infer_whisper_config(sd, num_heads=args.num_heads)}")
        params = convert_whisper_tower(sd)
    elif args.kind == "xcodec":
        # HF XcodecModel (the reference's audio tokenizer, UALM
        # audio.py:203-232) → flax XcodecFlax
        from audio_intelligence_tpu.models.ualm.xcodec import (
            convert_hf_xcodec,
            infer_xcodec_config,
        )

        cfg = infer_xcodec_config(sd)
        print(f"inferred {cfg}")
        params = convert_hf_xcodec(sd, cfg)
    elif args.kind == "omni_tower":
        # Qwen2.5-Omni thinker audio tower (UALM audio.py:929-958) →
        # flax OmniAudioTower
        from audio_intelligence_tpu.models.ualm.omni_tower import (
            convert_omni_tower,
            infer_omni_config,
        )

        print(f"inferred {infer_omni_config(sd, num_heads=args.num_heads)}")
        params = convert_omni_tower(sd)
    else:
        params = convert_oobleck(sd, args.n_blocks, decoder=True)

    with open(args.output, "wb") as f:
        f.write(serialization.to_bytes({"params": params}))
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
