"""Checkpoint converter: torch-layout state dicts → flax param trees.

Builds synthetic torch-style state dicts with the reference's exact key
names/layouts, converts, and checks structural equality with the real
flax model init (every path and shape must match) plus numerical
equivalence of the conv/WN transforms.
"""

import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp
import torch

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.convert_checkpoint import convert_a2sb_unet, convert_oobleck
from audio_intelligence_tpu.models.a2sb.unet import AttnUNetF, sinusoidal_temporal_embedding
from audio_intelligence_tpu.models.etta.vae import OobleckEncoder, OobleckDecoder, WNConv


def _tree_paths(t, prefix=""):
    out = {}
    for k, v in t.items():
        if isinstance(v, dict):
            out.update(_tree_paths(v, prefix + k + "/"))
        else:
            out[prefix + k] = np.shape(v)
    return out


def test_a2sb_unet_conversion_structure():
    model = AttnUNetF(
        n_updown_levels=2, hidden_channels=(32, 64, 64), emb_channels=16,
        band_embedding_dim=4, attention_levels=(1,), n_attn_heads=2,
        num_res_blocks=2, rotary_dim=4,
    )
    ref = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 16, 3)),
        sinusoidal_temporal_embedding(jnp.asarray([0.5]), 16),
    )["params"]
    ref_paths = _tree_paths(ref)

    # build a torch-style state dict with reference names from ref shapes
    rng = np.random.default_rng(0)
    sd = {}

    def torch_conv(src, kernel_shape, has_bias=True):
        kh, kw, cin, cout = kernel_shape
        sd[f"{src}.weight"] = rng.standard_normal((cout, cin, kh, kw)).astype(np.float32)
        if has_bias:
            sd[f"{src}.bias"] = rng.standard_normal(cout).astype(np.float32)

    def torch_gn(src, c):
        sd[f"{src}.weight"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{src}.bias"] = rng.standard_normal(c).astype(np.float32)

    def torch_res(src, dst):
        c = ref_paths[f"{dst}/in_conv/bias"][0]
        e2 = ref_paths[f"{dst}/emb_proj/bias"][0]
        e = ref_paths[f"{dst}/emb_proj/kernel"][0]
        torch_gn(f"{src}.in_layers.0", c)
        torch_conv(f"{src}.in_layers.2", ref_paths[f"{dst}/in_conv/kernel"])
        sd[f"{src}.emb_layers.1.weight"] = rng.standard_normal((e2, e, 1, 1)).astype(np.float32)
        sd[f"{src}.emb_layers.1.bias"] = rng.standard_normal(e2).astype(np.float32)
        torch_gn(f"{src}.out_norm", c)
        torch_conv(f"{src}.out_rest.2", ref_paths[f"{dst}/out_conv/kernel"])

    def torch_attn(src, dst):
        c = ref_paths[f"{dst}/q_proj/bias"][0]
        torch_gn(f"{src}.gnorm", c)
        for p in ("q_proj", "k_proj", "v_proj"):
            torch_conv(f"{src}.{p}", ref_paths[f"{dst}/{p}/kernel"])

    torch_conv("input_projection", ref_paths["input_projection/kernel"])
    # level 0 (no attn), level 1 (attn)
    torch_res("enc_blocks.0.0", "enc0_res0")
    torch_res("enc_blocks.0.1", "enc0_res1")
    torch_conv("ds_layers.0.op", ref_paths["down0/kernel"])
    torch_res("enc_blocks.1.0", "enc1_res0")
    torch_attn("enc_blocks.1.1", "enc1_attn0")
    torch_res("enc_blocks.1.2", "enc1_res1")
    torch_attn("enc_blocks.1.3", "enc1_attn1")
    torch_conv("ds_layers.1.op", ref_paths["down1/kernel"])
    torch_res("middle_block.0", "mid_res0")
    torch_attn("middle_block.1", "mid_attn")
    torch_res("middle_block.2", "mid_res1")
    # decoder: dec level 0 has attn (n-1-1=0? attention_levels=(1,) → dec_attn={0})
    torch_res("dec_blocks.0.0", "dec0_res0")
    torch_attn("dec_blocks.0.1", "dec0_attn0")
    torch_res("dec_blocks.0.2", "dec0_res1")
    torch_attn("dec_blocks.0.3", "dec0_attn1")
    torch_conv("us_layers.0.conv", ref_paths["up0/kernel"])
    torch_res("dec_blocks.1.0", "dec1_res0")
    torch_res("dec_blocks.1.1", "dec1_res1")
    torch_conv("us_layers.1.conv", ref_paths["up1/kernel"])
    torch_gn("output_projection.0", ref_paths["out_norm/scale"][0])
    torch_conv("output_projection.2", ref_paths["output_projection/kernel"])

    params = convert_a2sb_unet(
        sd, n_updown_levels=2, num_res_blocks=2, attention_levels=(1,),
        strip_prefix="vf_model.",
    )
    got_paths = _tree_paths(params)
    assert got_paths == ref_paths

    # numerics: OIHW→HWIO for a known conv
    w = sd["input_projection.weight"]
    np.testing.assert_allclose(
        params["input_projection"]["kernel"], np.transpose(w, (2, 3, 1, 0))
    )
    # emb conv → separable kernel transpose
    np.testing.assert_allclose(
        params["enc0_res0"]["emb_proj"]["kernel"],
        sd["enc_blocks.0.0.emb_layers.1.weight"][:, :, 0, 0].T,
    )
    # the converted tree must load into the model
    x = jnp.zeros((1, 32, 16, 3))
    te = sinusoidal_temporal_embedding(jnp.asarray([0.5]), 16)
    out = AttnUNetF(
        n_updown_levels=2, hidden_channels=(32, 64, 64), emb_channels=16,
        band_embedding_dim=4, attention_levels=(1,), n_attn_heads=2,
        num_res_blocks=2, rotary_dim=4,
    ).apply({"params": jax.tree.map(jnp.asarray, params)}, x, te)
    assert np.isfinite(np.asarray(out)).all()


def test_oobleck_conversion_matches_torch_wn_conv():
    """Converted encoder params reproduce torch weight-norm conv outputs."""
    enc = OobleckEncoder(
        in_channels=2, channels=8, latent_dim=8, c_mults=(1, 2), strides=(2, 4)
    )
    ref = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 2)))["params"]
    ref_paths = _tree_paths(ref)

    rng = np.random.default_rng(0)
    sd = {}

    def torch_wn(src, dst_kernel_shape, in_is_g=False):
        kw, cin, cout = dst_kernel_shape
        v = rng.standard_normal((cout, cin, kw)).astype(np.float32)
        g = (np.abs(rng.standard_normal(cin if in_is_g else cout)) + 0.5).astype(np.float32)
        sd[f"{src}.weight_v"] = v
        sd[f"{src}.weight_g"] = g.reshape(-1, 1, 1)
        sd[f"{src}.bias"] = rng.standard_normal(cout).astype(np.float32)

    def torch_snake(src, c):
        sd[f"{src}.alpha"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{src}.beta"] = rng.standard_normal(c).astype(np.float32)

    def torch_ru(src, dst):
        torch_snake(f"{src}.layers.0", ref_paths[f"{dst}/act1/alpha"][0])
        torch_wn(f"{src}.layers.1", ref_paths[f"{dst}/conv1/v"])
        torch_snake(f"{src}.layers.2", ref_paths[f"{dst}/act2/alpha"][0])
        torch_wn(f"{src}.layers.3", ref_paths[f"{dst}/conv2/v"])

    torch_wn("layers.0", ref_paths["first_conv/v"])
    for b in range(2):
        base = f"layers.{b + 1}.layers"
        for i in range(3):
            torch_ru(f"{base}.{i}", f"block{b}/res{i}")
        torch_snake(f"{base}.3", ref_paths[f"block{b}/act/alpha"][0])
        torch_wn(f"{base}.4", ref_paths[f"block{b}/down/v"])
    torch_snake("layers.3", ref_paths["final_act/alpha"][0])
    torch_wn("layers.4", ref_paths["final_conv/v"])

    params = convert_oobleck(sd, n_blocks=2, decoder=False)
    assert _tree_paths(params) == ref_paths

    # numerics: first conv output vs torch weight_norm conv
    x = rng.standard_normal((1, 32, 2)).astype(np.float32)
    conv = torch.nn.Conv1d(2, 8, 7, padding=3)
    conv = torch.nn.utils.weight_norm(conv)
    with torch.no_grad():
        conv.weight_v.copy_(torch.from_numpy(sd["layers.0.weight_v"]))
        conv.weight_g.copy_(torch.from_numpy(sd["layers.0.weight_g"]))
        conv.bias.copy_(torch.from_numpy(sd["layers.0.bias"]))
        ref_out = conv(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
    ours = WNConv(8, 7, padding=3).apply(
        {"params": jax.tree.map(jnp.asarray, params["first_conv"])}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-4, rtol=1e-4)


def test_etta_dit_conversion_structure():
    from tools.convert_checkpoint import convert_etta_dit
    from audio_intelligence_tpu.models.etta.dit import DiffusionTransformer

    model = DiffusionTransformer(
        io_channels=4, embed_dim=32, depth=1, num_heads=2,
        cond_token_dim=8, global_cond_dim=16, xattn_heads=2, xattn_d_memory=8,
    )
    x = jnp.zeros((1, 8, 4))
    cond = jnp.zeros((1, 3, 8))
    mask = jnp.ones((1, 3), bool)
    g = jnp.zeros((1, 16))
    ref = model.init(
        jax.random.PRNGKey(0), x, jnp.asarray([0.5]), cond, mask, g
    )["params"]
    ref_paths = _tree_paths(ref)

    rng = np.random.default_rng(0)
    sd = {}

    def t_linear(src, dst, bias=True):
        i, o = ref_paths[f"{dst}/kernel"]
        sd[f"{src}.weight"] = rng.standard_normal((o, i)).astype(np.float32)
        if bias:
            sd[f"{src}.bias"] = rng.standard_normal(o).astype(np.float32)

    def t_conv1(src, dst, bias=True):
        k, i, o = ref_paths[f"{dst}/kernel"]
        sd[f"{src}.weight"] = rng.standard_normal((o, i, k)).astype(np.float32)
        if bias:
            sd[f"{src}.bias"] = rng.standard_normal(o).astype(np.float32)

    sd["timestep_features.weight"] = rng.standard_normal(
        ref_paths["timestep_features/weight"]
    ).astype(np.float32)
    t_linear("to_timestep_embed.0", "to_timestep_embed_fc1")
    t_linear("to_timestep_embed.2", "to_timestep_embed_fc2")
    t_linear("to_cond_embed.0", "to_cond_embed/fc1", bias=False)
    t_linear("to_cond_embed.2", "to_cond_embed/fc2", bias=False)
    t_linear("to_global_embed.0", "to_global_embed/fc1", bias=False)
    t_linear("to_global_embed.2", "to_global_embed/fc2", bias=False)
    t_conv1("preprocess_conv", "preprocess_conv", bias=False)
    t_conv1("postprocess_conv", "postprocess_conv", bias=False)
    t_conv1("transformer.project_in", "project_in")
    b = "transformer.model.blocks.0"
    t_linear(f"{b}.adaLN_modulation.1", "block0/adaLN_modulation")
    t_linear(f"{b}.self_attention.qkv_net", "block0/self_attention/qkv_net", bias=False)
    t_linear(f"{b}.self_attention.o_net", "block0/self_attention/o_net", bias=False)
    t_linear(f"{b}.cross_attention.q_net", "block0/cross_attention/q_net", bias=False)
    t_linear(f"{b}.cross_attention.kv_net", "block0/cross_attention/kv_net", bias=False)
    t_linear(f"{b}.cross_attention.o_net", "block0/cross_attention/o_net", bias=False)
    sd[f"{b}.norm_xattn_cross.weight"] = rng.standard_normal(
        ref_paths["block0/norm_xattn_cross/LayerNorm_0/scale"]
    ).astype(np.float32)
    sd[f"{b}.norm_pos_ff.weight"] = rng.standard_normal(
        ref_paths["block0/norm_pos_ff/LayerNorm_0/scale"]
    ).astype(np.float32)
    t_conv1(f"{b}.pos_ff.proj.conv", "block0/pos_ff/proj", bias=False)
    t_conv1(f"{b}.pos_ff.o_net.conv", "block0/pos_ff/o_net", bias=False)
    t_linear("transformer.project_out.adaLN_modulation.1", "project_out/adaLN_modulation")
    t_linear("transformer.project_out.linear", "project_out/linear")

    params = convert_etta_dit(sd, depth=1, strip_prefix="model.model.")
    assert _tree_paths(params) == ref_paths

    out = model.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        x, jnp.asarray([0.5]), cond, mask, g,
    )
    assert np.isfinite(np.asarray(out)).all()
