"""Local-attention transformer stack (reference local_attention.py)."""

import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.etta.local_attention import (
    ContinuousLocalTransformer,
    TransformerDecoder1D,
    TransformerEncoder1D,
    local_attention,
)


def _dense_reference(q, k, v, window, causal=False):
    """Dense attention restricted to the banded neighborhood."""
    b, h, t, d = q.shape
    logits = np.einsum("bhqd,bhkd->bhqk", q / np.sqrt(d), k)
    qi = np.arange(t)[:, None]
    ki = np.arange(t)[None, :]
    # block-neighbor band: key block within ±1 of query block
    band = np.abs(ki // window - qi // window) <= 1
    if causal:
        band &= ki <= qi
    logits = np.where(band, logits, -1e9)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", probs, v)


def test_local_attention_matches_banded_dense():
    rng = np.random.default_rng(0)
    q, k, v = (rng.standard_normal((1, 2, 24, 8)).astype(np.float32) for _ in range(3))
    out = np.asarray(local_attention(*map(jnp.asarray, (q, k, v)), window=8))
    ref = _dense_reference(q, k, v, 8)
    np.testing.assert_allclose(out, ref, atol=2e-5)
    # causal
    out_c = np.asarray(
        local_attention(*map(jnp.asarray, (q, k, v)), window=8, causal=True)
    )
    ref_c = _dense_reference(q, k, v, 8, causal=True)
    np.testing.assert_allclose(out_c, ref_c, atol=2e-5)


def test_local_attention_ragged_tail():
    rng = np.random.default_rng(1)
    q, k, v = (rng.standard_normal((1, 1, 19, 8)).astype(np.float32) for _ in range(3))
    out = np.asarray(local_attention(*map(jnp.asarray, (q, k, v)), window=8))
    ref = _dense_reference(q, k, v, 8)
    np.testing.assert_allclose(out, ref, atol=2e-5)  # padding masked out


def test_continuous_local_transformer_modes():
    m = ContinuousLocalTransformer(
        dim=32, depth=2, dim_in=8, dim_out=8, heads=4,
        local_attn_window_size=8, cond_dim=16, cross_attn_cond_dim=24,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 8))
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 24))
    p = m.init(jax.random.PRNGKey(3), x, cond=cond, cross_attn_cond=ctx)
    y = m.apply(p, x, cond=cond, cross_attn_cond=ctx)
    assert y.shape == (2, 24, 8)
    # prepend_cond extends the sequence
    pre = jax.random.normal(jax.random.PRNGKey(4), (2, 3, 32))
    y2 = m.apply(p, x, cond=cond, cross_attn_cond=ctx, prepend_cond=pre)
    assert y2.shape == (2, 27, 8)


def test_transformer_encoder_decoder_roundtrip_shapes():
    enc = TransformerEncoder1D(
        out_channels=16, embed_dims=(16, 32), heads=(2, 2), depths=(1, 1),
        ratios=(2, 2), local_attn_window_size=8,
    )
    dec = TransformerDecoder1D(
        out_channels=4, embed_dims=(32, 16), heads=(2, 2), depths=(1, 1),
        ratios=(2, 2), local_attn_window_size=8,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 4))
    pe = enc.init(jax.random.PRNGKey(1), x)
    z = enc.apply(pe, x)
    assert z.shape == (1, 16, 16)  # 4x downsample
    pd = dec.init(jax.random.PRNGKey(2), z)
    y = dec.apply(pd, z)
    assert y.shape == (1, 64, 4)
