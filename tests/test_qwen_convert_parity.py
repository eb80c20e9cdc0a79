"""Qwen2 → ParallelLM converter: logits parity vs HF torch.

Builds a tiny *random* HF Qwen2ForCausalLM (GQA + qkv biases, both tied
and untied head variants), converts via convert_qwen2_to_parallel_lm, and
asserts the flax stream-0 logits over the text interval match HF to fp32
tolerance (VERDICT r1 item 3 — the machinery that makes a converted real
Qwen2.5-1.5B trustworthy as the UALM backbone)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # heavy torch-reference fixtures

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from audio_intelligence_tpu.models.ualm.backbone import BackboneConfig
from audio_intelligence_tpu.models.ualm.convert import (
    convert_qwen2_to_parallel_lm,
    infer_qwen2_config,
)
from audio_intelligence_tpu.models.ualm.lm import ParallelLM

VOCAB = 64  # HF text vocab
UNIFIED = 160  # unified multimodal vocab (text + audio intervals)


def _tiny_hf(tie: bool, seed: int = 0):
    cfg = transformers.Qwen2Config(
        vocab_size=VOCAB,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rope_theta=1e6,
        rms_norm_eps=1e-6,
        tie_word_embeddings=tie,
        attention_dropout=0.0,
    )
    torch.manual_seed(seed)
    return transformers.Qwen2ForCausalLM(cfg).eval()


@pytest.mark.parametrize("tie", [False, True])
@pytest.mark.parametrize("text_start", [0, 96])
def test_qwen2_logits_parity(tie, text_start):
    hf = _tiny_hf(tie)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    if tie:
        sd.pop("lm_head.weight", None)  # tied ckpts don't store the head

    cfg = infer_qwen2_config(sd, num_heads=4)
    assert cfg.num_kv_heads == 2 and cfg.qkv_bias

    model = ParallelLM(cfg=cfg, vocab_size=UNIFIED, num_stream=1)
    rng = np.random.default_rng(0)
    ids_text = rng.integers(1, VOCAB, (2, 12)).astype(np.int32)
    ids_unified = (ids_text + text_start).astype(np.int32)

    init = model.init(jax.random.PRNGKey(0), jnp.asarray(ids_unified[..., None]))
    params = convert_qwen2_to_parallel_lm(
        sd, init["params"], text_start=text_start
    )

    hidden = model.apply({"params": params}, jnp.asarray(ids_unified[..., None]))
    logits = model.apply(
        {"params": params}, hidden, method=ParallelLM.logits_full
    )
    ours = np.asarray(logits)[:, :, text_start : text_start + VOCAB]

    with torch.no_grad():
        ref = hf(torch.asarray(ids_text.astype(np.int64))).logits.numpy()

    if text_start == 0:
        # the rebuild zeroes unified row/col 0 (the pad token,
        # parallel.py:95-96) — excluded from parity when it overlaps text
        ours, ref = ours[..., 1:], ref[..., 1:]
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=2e-3)


def test_pad_row_zeroed_and_fresh_rows_kept():
    hf = _tiny_hf(False)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    cfg = infer_qwen2_config(sd, num_heads=4)
    model = ParallelLM(cfg=cfg, vocab_size=UNIFIED, num_stream=2)
    init = model.init(
        jax.random.PRNGKey(1), jnp.ones((1, 4, 2), jnp.int32)
    )["params"]
    params = convert_qwen2_to_parallel_lm(sd, init, text_start=0)
    emb = params["embed_tokens"]["embedding"]
    assert np.abs(emb[0]).sum() == 0  # pad row zeroed (parallel.py:95-96)
    np.testing.assert_allclose(
        emb[:VOCAB][1:], sd["model.embed_tokens.weight"][1:], atol=0
    )
    # audio rows keep the fresh (nonzero) init — trained from scratch
    assert np.abs(emb[VOCAB:]).sum() > 0
    np.testing.assert_allclose(params["lm_head_kernel"][:, 0], 0.0)
    # stream embeddings untouched by conversion
    np.testing.assert_allclose(
        params["stream_emb"]["embedding"],
        np.asarray(init["stream_emb"]["embedding"]),
    )
