"""AttnUNetF: shape, conditioning, and attention-path tests (tiny configs)."""

import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.a2sb.unet import (
    AttnUNetF,
    sinusoidal_temporal_embedding,
    band_embedding,
)
from audio_intelligence_tpu.ops.rotary import (
    axial_pixel_freqs_np,
    apply_rotary,
    rotate_half_interleaved,
)


def tiny_unet(**kw):
    defaults = dict(
        n_updown_levels=3,
        in_channels=3,
        hidden_channels=(32, 64, 64, 96),
        out_channels=3,
        emb_channels=16,
        band_embedding_dim=4,
        attention_levels=(2,),
        n_attn_heads=4,
        num_res_blocks=1,
        rotary_dim=4,
    )
    defaults.update(kw)
    return AttnUNetF(**defaults)


def test_unet_forward_shape():
    model = tiny_unet()
    x = jnp.zeros((2, 32, 16, 3))
    t_emb = sinusoidal_temporal_embedding(jnp.asarray([0.3, 0.8]), 16)
    params = model.init(jax.random.PRNGKey(0), x, t_emb)
    out = model.apply(params, x, t_emb)
    assert out.shape == (2, 32, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_conditioning_matters():
    """Different t embeddings must change the output (scale-shift path live).

    At init the ResBlock output convs are zero (matching the reference's
    ``zero_module``), making the net conditioning-independent — so perturb
    all params away from zero first.
    """
    model = tiny_unet()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 32, 16, 3)), jnp.float32)
    e1 = sinusoidal_temporal_embedding(jnp.asarray([0.1]), 16)
    e2 = sinusoidal_temporal_embedding(jnp.asarray([0.9]), 16)
    params = model.init(jax.random.PRNGKey(0), x, e1)
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    leaves = [
        l + 0.02 * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)
    ]
    params = jax.tree.unflatten(treedef, leaves)
    o1 = model.apply(params, x, e1)
    o2 = model.apply(params, x, e2)
    assert np.abs(np.asarray(o1 - o2)).max() > 1e-6

    # at clean init, zero-init convs must make the t-conditioning inert
    params0 = model.init(jax.random.PRNGKey(0), x, e1)
    np.testing.assert_allclose(
        np.asarray(model.apply(params0, x, e1)),
        np.asarray(model.apply(params0, x, e2)),
        atol=1e-7,
    )


def test_temporal_embedding_matches_reference():
    """sin/cos over linspace(0.5, 16, 64) multipliers (networks.py:455-471)."""
    t = np.asarray([0.0, 0.25, 1.0], np.float32)
    emb = np.asarray(sinusoidal_temporal_embedding(jnp.asarray(t), 128))
    mult = np.linspace(0.5, 16, 64, dtype=np.float32)
    ref = np.concatenate([np.sin(t[:, None] * mult), np.cos(t[:, None] * mult)], -1)
    np.testing.assert_allclose(emb, ref, atol=1e-6)


def test_band_embedding_matches_reference():
    n_bands, dim = 64, 16
    emb = np.asarray(band_embedding(n_bands, dim))  # [n_bands, dim]
    coords = np.arange(n_bands)
    freqs = np.arange(dim // 2) + 1
    ang = freqs[:, None] * coords[None, :] * 2 * 3.14 / (3 * n_bands)
    ref = np.concatenate([np.cos(ang), np.sin(ang)], 0).T
    np.testing.assert_allclose(emb, ref, atol=1e-5)


def test_rotary_preserves_norm_and_rotates():
    h, w, dim = 8, 4, 16
    angles = jnp.asarray(axial_pixel_freqs_np(h, w, dim, 64.0))
    assert angles.shape == (h, w, 2 * dim)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 3, h, w, 48)), jnp.float32
    )
    y = apply_rotary(x, angles)
    # rotation preserves the norm of each rotated pair and passes the rest
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y[..., :32]), axis=-1),
        np.linalg.norm(np.asarray(x[..., :32]), axis=-1),
        rtol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(y[..., 32:]), np.asarray(x[..., 32:]))


def test_rotate_half_interleaved():
    x = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    np.testing.assert_allclose(
        np.asarray(rotate_half_interleaved(x)), [-2.0, 1.0, -4.0, 3.0]
    )


def test_io_layout_nchw_matches_nhwc():
    """io_layout="nchw" (channels-first boundary convs via conv
    dimension_numbers — the padded-lane-free bench path) computes the
    SAME function as the public NHWC interface, with identical params."""
    m_cl = tiny_unet(p_dropout=0.0)
    m_cf = tiny_unet(p_dropout=0.0, io_layout="nchw")
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 32, 16, 3)), jnp.float32
    )
    t_emb = sinusoidal_temporal_embedding(jnp.asarray([0.3, 0.8]), 16)
    params = m_cl.init(jax.random.PRNGKey(0), x, t_emb)
    out_cl = m_cl.apply(params, x, t_emb)
    out_cf = m_cf.apply(params, jnp.moveaxis(x, -1, 1), t_emb)
    np.testing.assert_allclose(
        np.asarray(out_cl), np.moveaxis(np.asarray(out_cf), 1, -1),
        atol=1e-4, rtol=1e-4,
    )


def test_io_layout_nchw_int8_matches_nhwc_int8():
    """Same equivalence on the int8 path (incl. the quantize-before-
    upsample reorder, which commutes exactly with nearest-neighbour ×2)."""
    m_cl = tiny_unet(p_dropout=0.0, conv_impl="int8")
    m_cf = tiny_unet(p_dropout=0.0, conv_impl="int8", io_layout="nchw")
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 32, 16, 3)), jnp.float32
    )
    t_emb = sinusoidal_temporal_embedding(jnp.asarray([0.5]), 16)
    params = m_cl.init(jax.random.PRNGKey(0), x, t_emb)
    out_cl = m_cl.apply(params, x, t_emb)
    out_cf = m_cf.apply(params, jnp.moveaxis(x, -1, 1), t_emb)
    np.testing.assert_allclose(
        np.asarray(out_cl), np.moveaxis(np.asarray(out_cf), 1, -1),
        atol=2e-2, rtol=2e-2,
    )


def test_upsample_conv2x_matches_repeat_conv():
    """Sub-pixel phase convs == nearest-x2 repeat -> 3x3 conv, exactly
    (bf16/f32 path) and within quantization tolerance (int8)."""
    from audio_intelligence_tpu.models.a2sb.unet import QConv, UpsampleConv2x

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 6, 16)), jnp.float32)
    ref_mod = QConv(12, (3, 3), padding=1)
    up_mod = UpsampleConv2x(12)
    params = ref_mod.init(
        jax.random.PRNGKey(0), jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)
    )
    ref = ref_mod.apply(params, jnp.repeat(jnp.repeat(x, 2, 1), 2, 2))
    out = up_mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    # int8: same quantized input scale by construction; weights quantize
    # per phase, so agreement is at the quantization-noise level
    ref_mod8 = QConv(12, (3, 3), padding=1, impl="int8")
    up_mod8 = UpsampleConv2x(12, impl="int8")
    ref8 = ref_mod8.apply(params, jnp.repeat(jnp.repeat(x, 2, 1), 2, 2))
    out8 = up_mod8.apply(params, x)
    err = np.abs(np.asarray(out8) - np.asarray(ref8)).max()
    scale = np.abs(np.asarray(ref8)).max()
    assert err < 0.05 * scale, (err, scale)


def test_stats_epilogue_matches_plain_int8():
    """stats_epilogue (pallas conv + producer-fed GroupNorm statistics)
    computes the same function as the plain int8 path."""
    m_plain = tiny_unet(p_dropout=0.0, conv_impl="int8")
    m_stats = tiny_unet(p_dropout=0.0, conv_impl="int8", stats_epilogue=True)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 32, 16, 3)), jnp.float32
    )
    t_emb = sinusoidal_temporal_embedding(jnp.asarray([0.4]), 16)
    params = m_plain.init(jax.random.PRNGKey(0), x, t_emb)
    out_p = m_plain.apply(params, x, t_emb)
    out_s = m_stats.apply(params, x, t_emb)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_s), atol=5e-3, rtol=5e-3
    )
