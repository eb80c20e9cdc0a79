"""Pallas flash attention vs naive reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.ops.pallas_attention import (
    flash_attention,
    attention_reference,
)


def test_flash_matches_reference():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, 3, 128, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 3, 256, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 3, 256, 32)), jnp.float32)
    out = flash_attention(q, k, v, block_q=64, block_k=64, interpret=True)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_with_kv_mask():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 2, 64, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 128, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 128, 16)), jnp.float32)
    mask = jnp.arange(128)[None, :] < 70  # [B, S]
    out = flash_attention(q, k, v, kv_mask=mask, block_q=64, block_k=64, interpret=True)
    ref = attention_reference(q, k, v, kv_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
    # masked keys truly ignored: perturbing them changes nothing
    k2 = k.at[:, :, 70:].add(100.0)
    out2 = flash_attention(q, k2, v, kv_mask=mask, block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_flash_bf16():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((1, 2, 128, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 2, 128, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 2, 128, 64)), jnp.bfloat16)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    ref = attention_reference(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_fullkv_matches_reference():
    """Full-K-in-VMEM kernel (the UNet spatial-attention fast path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audio_intelligence_tpu.ops.pallas_attention import (
        attention_reference,
        fullkv_attention,
    )

    q = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 512, 64), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 512, 64), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 512, 64), jnp.float32)
    out = fullkv_attention(q, k, v, block_q=256, interpret=True)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-3
    )


def test_fullkv_q8_close_to_reference():
    """int8-QK (bf16 PV) attention: ~1% relative error vs exact."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audio_intelligence_tpu.ops.pallas_attention import (
        attention_reference,
        fullkv_attention_q8,
    )

    q = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 512, 64), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 512, 64), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 512, 64), jnp.float32)
    out = fullkv_attention_q8(q, k, v, block_q=256, interpret=True)
    ref = attention_reference(q, k, v)
    rel = np.abs(np.asarray(out) - np.asarray(ref)).max() / np.abs(
        np.asarray(ref)
    ).max()
    assert rel < 0.03, rel


def test_fullkv_q8_pipelined_matches_plain():
    """The software-pipelined fullkv variant (scratch-carried scores,
    branch-free fill/drain) is bit-identical to the plain kernel at both
    ones-column (d=96) and lane-aligned (d=128) head sizes."""
    from audio_intelligence_tpu.ops.pallas_attention import fullkv_attention_q8

    for d in (96, 128):
        b, h, t = 2, 2, 512
        q = jax.random.normal(jax.random.PRNGKey(0), (b, h, t, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (b, h, t, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (b, h, t, d), jnp.bfloat16)
        o_plain = fullkv_attention_q8(
            q, k, v, block_q=128, interpret=True, pipelined=False
        )
        o_pipe = fullkv_attention_q8(
            q, k, v, block_q=128, interpret=True, pipelined=True
        )
        # identical up to 1-ulp bf16 rounding ties (pytest's XLA config
        # contracts fma differently than the standalone interpreter)
        np.testing.assert_allclose(
            np.asarray(o_plain, np.float32), np.asarray(o_pipe, np.float32),
            atol=1e-3,
        )
