"""Segment-aware causal flash attention (the UALM 16k-context enabler).

The backbone's dense path materializes [B, H, T, S] f32 scores — ~13 GB
at the reference's 16k token bucket (conf/train.yaml:35-36), a
single-chip OOM. The pallas kernel streams K/V blocks with the packed-
batch varlen masking (causal ∧ same-segment ∧ valid) applied in-kernel.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_intelligence_tpu.ops.pallas_attention import (
    flash_attention_segmented,
)


def _dense_reference(q, k, v, q_pos, kv_pos, q_seg, kv_seg):
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum("bhtd,bhsd->bhts", q * scale, k).astype(jnp.float32)
    ok = (
        (kv_pos[:, None, None, :] <= q_pos[:, None, :, None])
        & (kv_seg[:, None, None, :] == q_seg[:, None, :, None])
        & (kv_seg[:, None, None, :] >= 0)
    )
    logits = jnp.where(ok, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", probs, v)


def _packed_ids(rng, b, t, max_doc):
    """position_ids restarting per document + matching segment ids."""
    pos = np.zeros((b, t), np.int32)
    seg = np.zeros((b, t), np.int32)
    for bi in range(b):
        i, s = 0, 0
        while i < t:
            n = int(rng.integers(1, max_doc + 1))
            n = min(n, t - i)
            pos[bi, i : i + n] = np.arange(n)
            seg[bi, i : i + n] = s
            i += n
            s += 1
    return jnp.asarray(pos), jnp.asarray(seg)


def test_flash_segmented_matches_dense():
    rng = np.random.default_rng(0)
    b, h, t, d = 2, 3, 512, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    pos, seg = _packed_ids(rng, b, t, 200)

    out = flash_attention_segmented(q, k, v, pos, pos, seg, seg)
    ref = _dense_reference(q, k, v, pos, pos, seg, seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_segmented_invalid_keys_and_cache_layout():
    """Prefill-into-cache shape: S > T with the tail invalid (seg -1)."""
    rng = np.random.default_rng(1)
    b, h, t, s, d = 1, 2, 256, 512, 32
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    q_pos, q_seg = _packed_ids(rng, b, t, 100)
    kv_pos = jnp.concatenate([q_pos, jnp.zeros((b, s - t), jnp.int32)], axis=1)
    kv_seg = jnp.concatenate(
        [q_seg, jnp.full((b, s - t), -1, jnp.int32)], axis=1
    )
    out = flash_attention_segmented(q, k, v, q_pos, kv_pos, q_seg, kv_seg)
    ref = _dense_reference(q, k, v, q_pos, kv_pos, q_seg, kv_seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_segmented_grads_match_dense():
    """The custom_vjp FlashAttention-2 backward reproduces dense-path
    gradients (dq, dk, dv) for a packed causal batch — the reference
    trains through differentiable flash-attn (etta_transformer.py:333-409),
    so this is the capability that unlocks 16k-bucket training."""
    rng = np.random.default_rng(3)
    b, h, t, d = 2, 2, 512, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    pos, seg = _packed_ids(rng, b, t, 200)
    co = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention_segmented(q, k, v, pos, pos, seg, seg) * co)

    def loss_dense(q, k, v):
        return jnp.sum(_dense_reference(q, k, v, pos, pos, seg, seg) * co)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", gf, gd):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4, err_msg=f"d{name}"
        )


def test_backbone_flash_training_grads():
    """Regression for the round-3 crash: jax.grad through a flash-routed
    backbone forward (flash_min_len below seq len) must work and match
    the dense path — i.e. training at the reference's long buckets is
    reachable (UALM conf/train.yaml:35-37)."""
    from audio_intelligence_tpu.models.ualm.backbone import (
        BackboneConfig,
        QwenBackbone,
    )

    rng = np.random.default_rng(4)
    t = 64
    cfg_dense = BackboneConfig.tiny()
    cfg_flash = BackboneConfig(**{**cfg_dense.__dict__, "flash_min_len": 8})
    x = jnp.asarray(rng.standard_normal((2, t, cfg_dense.hidden_size)), jnp.float32)
    pos = np.concatenate([np.arange(40), np.arange(t - 40)])[None].repeat(2, 0)
    pos = jnp.asarray(pos, jnp.int32)
    variables = QwenBackbone(cfg_dense).init(jax.random.PRNGKey(0), x, pos)

    def loss(params, cfg):
        out = QwenBackbone(cfg).apply(params, x, pos)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    g_dense = jax.grad(loss)(variables, cfg_dense)
    g_flash = jax.grad(loss)(variables, cfg_flash)  # crashed before r4
    flat_d, _ = jax.tree_util.tree_flatten(g_dense)
    flat_f, _ = jax.tree_util.tree_flatten(g_flash)
    for a, b_ in zip(flat_d, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5)


def test_backbone_flash_path_matches_dense():
    """The backbone's flash routing (flash_min_len) reproduces the dense
    bias path — cache-free forward AND prefill-into-cache, with padding
    to block multiples exercised (t not a multiple of 256)."""
    from audio_intelligence_tpu.models.ualm.backbone import (
        BackboneConfig,
        KVCache,
        QwenBackbone,
    )

    rng = np.random.default_rng(2)
    t = 40  # pads to 256 inside the flash path
    cfg_dense = BackboneConfig.tiny()
    cfg_flash = BackboneConfig(
        **{**cfg_dense.__dict__, "flash_min_len": 8}
    )
    mb_dense = QwenBackbone(cfg_dense)
    mb_flash = QwenBackbone(cfg_flash)
    x = jnp.asarray(rng.standard_normal((2, t, cfg_dense.hidden_size)), jnp.float32)
    # packed position ids (restart mid-sequence)
    pos = np.concatenate(
        [np.arange(25), np.arange(t - 25)]
    )[None].repeat(2, axis=0)
    pos = jnp.asarray(pos, jnp.int32)
    variables = mb_dense.init(jax.random.PRNGKey(0), x, pos)

    ref = mb_dense.apply(variables, x, pos)
    out = mb_flash.apply(variables, x, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    # prefill into a cache longer than t
    cache = KVCache.init(cfg_dense, 2, t + 8, dtype=x.dtype)
    ref_h, ref_c = mb_dense.apply(variables, x, pos, cache)
    out_h, out_c = mb_flash.apply(variables, x, pos, cache)
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(ref_h), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out_c.k), np.asarray(ref_c.k), atol=1e-6)


def test_flash_segmented_windowed_matches_full():
    """``max_segment_len`` (the diagonal-band K/V walk) is output- AND
    grad-equivalent to the full scan whenever every packed segment
    really is ≤ the bound — including bounds that are not block
    multiples and the prefill S > T layout."""
    rng = np.random.default_rng(7)
    b, h, t, d = 2, 2, 768, 32
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    pos, seg = _packed_ids(rng, b, t, 200)  # all segments ≤ 200

    def run(max_seg):
        def attn(q, k, v):
            return flash_attention_segmented(
                q, k, v, pos, pos, seg, seg, block_q=128, block_k=128,
                max_segment_len=max_seg,
            )

        grads = jax.grad(
            lambda q, k, v: jnp.sum(attn(q, k, v) ** 2), argnums=(0, 1, 2)
        )(q, k, v)
        return attn(q, k, v), grads

    o_full, g_full = run(None)
    for bound in (200, 257):  # exact and non-block-multiple bound
        o_win, g_win = run(bound)
        np.testing.assert_allclose(
            np.asarray(o_win), np.asarray(o_full), atol=2e-5
        )
        for gw, gf in zip(g_win, g_full):
            np.testing.assert_allclose(
                np.asarray(gw), np.asarray(gf), atol=2e-4
            )
