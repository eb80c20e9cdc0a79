"""Flax CLAP: structure parity vs ``transformers.ClapModel`` on random
tiny configs — text features, audio features (exact-size and bicubic
resize paths), and the fusion (long-audio AFF) path. The reference
conditions ETTA on this architecture family
(ETTA/stable_audio_tools/models/conditioners.py:96-240)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy torch-reference fixtures

import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.etta.clap import (
    ClapFlax,
    configs_from_hf,
    convert_hf_clap,
)

TEXT_KW = dict(
    vocab_size=120,
    hidden_size=16,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=32,
    max_position_embeddings=64,
    pad_token_id=1,
)
AUDIO_KW = dict(
    spec_size=64,
    num_mel_bins=16,
    patch_size=4,
    patch_stride=[4, 4],
    patch_embeds_hidden_size=8,
    hidden_size=16,  # = patch_embeds_hidden_size · 2^(n_stages−1)
    depths=[2, 2],
    num_attention_heads=[2, 4],
    window_size=4,
    num_classes=10,
)


def _build(enable_fusion: bool):
    torch = pytest.importorskip("torch")
    from transformers import ClapAudioConfig, ClapConfig, ClapModel, ClapTextConfig

    cfg = ClapConfig(
        text_config=TEXT_KW,
        audio_config={**AUDIO_KW, "enable_fusion": enable_fusion},
        projection_dim=12,
    )
    torch.manual_seed(0)
    hf = ClapModel(cfg).eval()
    # randomize the zero-init relative position bias tables and batchnorm
    # stats so parity actually exercises them
    with torch.no_grad():
        for name, par in hf.named_parameters():
            if "relative_position_bias_table" in name:
                par.normal_(0, 0.02)
        for name, buf in hf.named_buffers():
            if "running_mean" in name:
                buf.normal_(0, 0.5)
            if "running_var" in name:
                buf.uniform_(0.5, 2.0)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    tcfg, acfg = configs_from_hf(cfg)
    model = ClapFlax(tcfg, acfg)
    params = {"params": convert_hf_clap(sd, tcfg, acfg)}
    return torch, hf, model, params


@pytest.fixture(scope="module")
def pair():
    return _build(enable_fusion=False)


@pytest.fixture(scope="module")
def pair_fusion():
    return _build(enable_fusion=True)


def test_text_features_parity(pair):
    torch, hf, model, params = pair
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 120, size=(3, 12))
    mask = np.ones((3, 12), np.int64)
    mask[1, 8:] = 0
    ids[1, 8:] = 1  # pad id
    want = hf.get_text_features(
        input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
    ).detach().numpy()
    got = np.asarray(
        model.apply(
            params,
            jnp.asarray(ids),
            jnp.asarray(mask),
            method=ClapFlax.get_text_features,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)


def test_text_hidden_parity(pair):
    torch, hf, model, params = pair
    rng = np.random.default_rng(1)
    ids = rng.integers(2, 120, size=(2, 9))
    mask = np.ones((2, 9), np.int64)
    want = hf.text_model(
        input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
    ).last_hidden_state.detach().numpy()
    got = np.asarray(
        model.apply(
            params,
            jnp.asarray(ids),
            jnp.asarray(mask),
            method=ClapFlax.get_text_hidden_states,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)


@pytest.mark.parametrize("t_in", [256, 200])
def test_audio_features_parity(pair, t_in):
    """t_in=256 is the exact swin input; 200 exercises the align-corners
    bicubic resize matrix."""
    torch, hf, model, params = pair
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((2, 1, t_in, 16)).astype(np.float32)
    want = hf.get_audio_features(
        input_features=torch.tensor(feats)
    ).detach().numpy()
    got = np.asarray(
        model.apply(
            params, jnp.asarray(feats), method=ClapFlax.get_audio_features
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=5e-4)


def test_audio_fusion_parity(pair_fusion):
    """enable_fusion path: 4-channel input, mixed is_longer flags — the
    torch index_select becomes a where() select here."""
    torch, hf, model, params = pair_fusion
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((2, 4, 256, 16)).astype(np.float32)
    is_longer = np.array([[True], [False]])
    want = hf.get_audio_features(
        input_features=torch.tensor(feats),
        is_longer=torch.tensor(is_longer),
    ).detach().numpy()
    got = np.asarray(
        model.apply(
            params,
            jnp.asarray(feats),
            jnp.asarray(is_longer[:, 0]),
            method=ClapFlax.get_audio_features,
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=5e-4)


def test_conditioner_hf_dir_path(pair, tmp_path):
    """clap_audio_embed_host with an HF ClapModel checkpoint dir runs the
    flax towers end-to-end through the HF feature extractor (the
    conditioner registry's production path when weights are present)."""
    torch, hf, model, params = pair
    from transformers import ClapFeatureExtractor

    d = tmp_path / "clap_ckpt"
    hf.save_pretrained(d)
    # a feature extractor matched to the tiny tower geometry
    fe = ClapFeatureExtractor(
        feature_size=16, sampling_rate=8000, hop_length=160,
        max_length_s=4, fft_window_size=400, frequency_min=0,
        frequency_max=4000, nb_frequency_bins=201,
    )
    fe.save_pretrained(d)

    from audio_intelligence_tpu.models.etta.conditioners import (
        clap_audio_embed_host,
    )

    rng = np.random.default_rng(7)
    wav = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
    got = clap_audio_embed_host(wav, 8000, clap_ckpt_path=str(d))

    enc = fe(
        list(wav), sampling_rate=8000, truncation="rand_trunc",
        return_tensors="pt",
    )
    feats = enc["input_features"]
    # the tiny tower takes T<=256 frames; the extractor's output is
    # whatever max_length_s implies — crop/interp is the tower's job, so
    # just assert the flax path matched HF on the same features
    want = hf.get_audio_features(input_features=feats).detach().numpy()
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=5e-4)
