"""Flax T5 encoder vs HF torch T5EncoderModel — numerical parity.

Builds tiny *random* HF T5 encoders with the installed transformers,
converts the state dict, and asserts the flax outputs match to fp32
tolerance (VERDICT r1 item 5: the machinery that makes converted real
T5-base checkpoints trustworthy)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # heavy torch-reference fixtures

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from audio_intelligence_tpu.models.etta.t5 import (
    T5Config,
    T5Encoder,
    convert_hf_t5_encoder,
    relative_position_bucket,
)


def _tiny_hf(gated: bool, seed: int = 0):
    cfg = transformers.T5Config(
        vocab_size=128,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=2,
        num_heads=4,
        feed_forward_proj="gated-gelu" if gated else "relu",
        dropout_rate=0.0,
    )
    torch.manual_seed(seed)
    model = transformers.T5EncoderModel(cfg).eval()
    return model


@pytest.mark.parametrize("gated", [False, True])
def test_t5_encoder_matches_hf(gated):
    hf = _tiny_hf(gated)
    cfg = T5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, gated_ff=gated,
    )
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_hf_t5_encoder(sd, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 128, (2, 10)).astype(np.int32)
    mask = np.ones((2, 10), bool)
    mask[1, 6:] = False
    ids[1, 6:] = 0

    with torch.no_grad():
        ref = hf(
            input_ids=torch.asarray(ids.astype(np.int64)),
            attention_mask=torch.asarray(mask),
        ).last_hidden_state.numpy()
    ref = ref * mask[..., None]

    enc = T5Encoder(cfg)
    out = enc.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_relative_position_bucket_matches_hf():
    from transformers.models.t5.modeling_t5 import T5Attention as HFT5Attention

    rp = np.arange(-40, 40)[None, :] - np.zeros((1, 1), np.int64)
    rp = np.arange(64)[None, :] - np.arange(64)[:, None]
    ours = relative_position_bucket(rp, 32, 128)
    theirs = HFT5Attention._relative_position_bucket(
        torch.asarray(rp), bidirectional=True, num_buckets=32, max_distance=128
    ).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_t5_encoder_masked_positions_zeroed():
    cfg = T5Config(vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_layers=1, num_heads=4)
    enc = T5Encoder(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0, 0, 0]], bool)
    params = enc.init(jax.random.PRNGKey(0), ids, mask)["params"]
    out = enc.apply({"params": params}, ids, mask)
    assert np.abs(np.asarray(out)[0, 4:]).sum() == 0
    assert np.abs(np.asarray(out)[0, :4]).sum() > 0
