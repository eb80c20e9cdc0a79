"""Xcodec flax port: golden parity vs transformers.XcodecModel on a tiny
random config — encode codes match exactly, decoded waveforms match to
fp32 tolerance (the reference's audio tokenizer,
UALM/models/ualm/multimodal_io/audio.py:203-232)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy torch-reference fixtures

import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.ualm.xcodec import (
    XcodecFlax,
    XcodecTowerConfig,
    convert_hf_xcodec,
    infer_xcodec_config,
)


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import XcodecConfig, XcodecModel
    from transformers.models.dac import DacConfig
    from transformers.models.hubert import HubertConfig

    dac = DacConfig(
        encoder_hidden_size=16, downsampling_ratios=[4, 5],
        decoder_hidden_size=32, upsampling_ratios=[5, 4], hidden_size=32,
        hop_length=20, sampling_rate=16000,
    )
    hub = HubertConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16, 16], conv_stride=[5, 2, 2],
        conv_kernel=[10, 3, 3], num_feat_extract_layers=3,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=2,
        do_stable_layer_norm=False, feat_extract_norm="group",
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0, layerdrop=0.0,
    )
    cfg = XcodecConfig(
        acoustic_model_config=dac, semantic_model_config=hub,
        codebook_size=64, target_bandwidths=[9.6, 38.4],
    )
    torch.manual_seed(0)
    model = XcodecModel(cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    tcfg = infer_xcodec_config(sd)
    # conv strides aren't shape-recoverable; pin from the HF config
    tcfg = XcodecTowerConfig(
        **{**tcfg.__dict__, "hubert_conv_stride": (5, 2, 2), "hubert_heads": 2}
    )
    flax_model = XcodecFlax(tcfg)
    params = {"params": convert_hf_xcodec(sd, tcfg)}
    return torch, model, flax_model, params, tcfg


def test_config_inference(hf_pair):
    _, _, _, _, tcfg = hf_pair
    assert tcfg.ratios == (4, 5) and tcfg.hop_length == 20
    assert tcfg.num_quantizers == 8 and tcfg.codebook_size == 64
    assert tcfg.semantic_hidden == 32 and tcfg.acoustic_hidden == 32
    assert tcfg.hubert_layers == 2 and tcfg.hubert_ffn == 64


def test_encode_codes_match(hf_pair):
    torch, ref, flax_model, params, tcfg = hf_pair
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((2, 2000)) * 0.2).astype(np.float32)
    with torch.no_grad():
        ref_codes = ref.encode(
            torch.from_numpy(wav)[:, None, :], return_dict=False
        ).numpy()  # [B, n_q, T']
    codes = np.asarray(
        flax_model.apply(params, jnp.asarray(wav), method=XcodecFlax.encode)
    )  # [B, T', n_q]
    assert codes.shape == (2, 100, 8)
    np.testing.assert_array_equal(codes.transpose(0, 2, 1), ref_codes)


def test_decode_waveform_matches(hf_pair):
    torch, ref, flax_model, params, tcfg = hf_pair
    rng = np.random.default_rng(1)
    codes = rng.integers(0, tcfg.codebook_size, (2, 8, 50))  # HF layout
    with torch.no_grad():
        ref_wav = ref.decode(torch.from_numpy(codes), return_dict=False).numpy()
    wav = np.asarray(
        flax_model.apply(
            params, jnp.asarray(codes.transpose(0, 2, 1)),
            method=XcodecFlax.decode,
        )
    )
    assert wav.shape == (2, ref_wav.shape[-1])
    np.testing.assert_allclose(wav, ref_wav[:, 0], atol=2e-4, rtol=1e-3)


def test_roundtrip_through_both(hf_pair):
    """encode→decode through flax equals the HF roundtrip end-to-end."""
    torch, ref, flax_model, params, tcfg = hf_pair
    rng = np.random.default_rng(2)
    wav = (rng.standard_normal((1, 2000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(wav)[:, None, :], return_dict=False
        )[1].numpy()
    out = np.asarray(flax_model.apply(params, jnp.asarray(wav)))
    np.testing.assert_allclose(out, ref_out.reshape(out.shape), atol=3e-4, rtol=1e-3)


def test_discrete_audio_io_with_xcodec(hf_pair):
    """XcodecFlax plugs into DiscreteAudioIO as the codec backend: the
    reference wires HF Xcodec the same way (audio.py:203-232) — tokens
    carry per-stream vocab offsets + delay interleave and decode back."""
    torch, ref, flax_model, params, tcfg = hf_pair
    from audio_intelligence_tpu.models.ualm.audio_io import DiscreteAudioIO

    io = DiscreteAudioIO(
        codec=flax_model,
        codec_variables=params,
        n_streams=tcfg.num_quantizers,
        codebook_size=tcfg.codebook_size,
        sample_rate=16000,
        frame_shift=tcfg.hop_length,
    )
    rng = np.random.default_rng(3)
    wav = (rng.standard_normal((1, 2000, 1)) * 0.2).astype(np.float32)
    lengths = np.asarray([2000])
    codes = np.asarray(io.encode_batch(jnp.asarray(wav), jnp.asarray(lengths)))
    assert codes.shape == (1, 100 + tcfg.num_quantizers - 1, tcfg.num_quantizers)
    out, _out_lens, out_sr = io.decode_batch(codes, np.asarray([codes.shape[1]]))
    assert out_sr == 16000
    # equals decoding the HF-encoded codes through the HF decoder
    with torch.no_grad():
        ref_codes = ref.encode(
            torch.from_numpy(wav[..., 0])[:, None, :], return_dict=False
        )
        ref_wav = ref.decode(ref_codes, return_dict=False).numpy()
    np.testing.assert_allclose(
        np.asarray(out)[0, : ref_wav.shape[-1]],
        ref_wav.reshape(-1),
        atol=3e-4, rtol=1e-3,
    )
