"""Qwen2.5-Omni audio tower: golden parity vs the actual transformers
Qwen2_5OmniAudioEncoder on a tiny random config, including the windowed
(block-diagonal) attention and ragged tail chunks
(UALM ContinuousAudioIO huggingface path, audio.py:929-958)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy torch-reference fixtures

import jax.numpy as jnp

from audio_intelligence_tpu.models.ualm.omni_tower import (
    OmniAudioTower,
    OmniTowerConfig,
    convert_omni_tower,
    infer_omni_config,
)


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import (
        Qwen2_5OmniAudioEncoderConfig,
    )
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import (
        Qwen2_5OmniAudioEncoder,
    )

    cfg = Qwen2_5OmniAudioEncoderConfig(
        d_model=64, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=128, num_mel_bins=32, n_window=8,
        output_dim=48, max_source_positions=64, dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0,
        activation_function="gelu",
    )
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    enc = Qwen2_5OmniAudioEncoder(cfg).eval()
    sd = {k: v.numpy() for k, v in enc.state_dict().items()}
    tcfg = infer_omni_config(sd, num_heads=4, n_window=8)
    tower = OmniAudioTower(tcfg)
    params = {"params": convert_omni_tower(sd)}
    return torch, enc, tower, params, tcfg


def test_config_inference(hf_pair):
    *_, tcfg = hf_pair
    assert tcfg.d_model == 64 and tcfg.num_layers == 2
    assert tcfg.output_dim == 48 and tcfg.n_mels == 32


def test_forward_parity_full_chunks(hf_pair):
    torch, enc, tower, params, tcfg = hf_pair
    w = 2 * tcfg.n_window
    rng = np.random.default_rng(0)
    t_mel = 3 * w  # 3 full chunks
    mel = rng.standard_normal((1, tcfg.n_mels, t_mel)).astype(np.float32)

    with torch.no_grad():
        ref = enc(
            torch.from_numpy(mel[0]).transpose(0, 1).reshape(-1, tcfg.n_mels).T,
            feature_lens=torch.tensor([t_mel]),
            aftercnn_lens=torch.tensor([t_mel // 2]),
        ).last_hidden_state.numpy()  # [T_out, output_dim]

    out, out_lens = tower.apply(
        params, jnp.asarray(mel), jnp.asarray([t_mel])
    )
    out = np.asarray(out)
    assert int(out_lens[0]) == ref.shape[0]
    np.testing.assert_allclose(
        out[0, : ref.shape[0]], ref, atol=3e-4, rtol=2e-3
    )


def test_forward_parity_ragged_tail(hf_pair):
    """A tail chunk shorter than the window: attention must stay within
    the valid positions and the packed pooling must match HF."""
    torch, enc, tower, params, tcfg = hf_pair
    w = 2 * tcfg.n_window
    rng = np.random.default_rng(1)
    valid = 2 * w + 10  # 2 full chunks + 10-frame tail
    t_mel = 3 * w
    mel_full = rng.standard_normal((1, tcfg.n_mels, t_mel)).astype(np.float32)
    mel_valid = mel_full[:, :, :valid]

    after_cnn = (valid - 1) // 2 + 1
    with torch.no_grad():
        ref = enc(
            torch.from_numpy(mel_valid[0]),
            feature_lens=torch.tensor([valid]),
            aftercnn_lens=torch.tensor([after_cnn]),
        ).last_hidden_state.numpy()

    mel_padded = np.zeros_like(mel_full)
    mel_padded[:, :, :valid] = mel_valid
    out, out_lens = tower.apply(
        params, jnp.asarray(mel_padded), jnp.asarray([valid])
    )
    out = np.asarray(out)
    assert int(out_lens[0]) == ref.shape[0] == after_cnn // 2
    np.testing.assert_allclose(
        out[0, : ref.shape[0]], ref, atol=3e-4, rtol=2e-3
    )
