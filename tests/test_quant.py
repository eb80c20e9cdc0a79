"""int8 quantized conv path (ops/quant.py + unet.QConv)."""

import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.ops.quant import quant_conv2d, symmetric_scales
from audio_intelligence_tpu.models.a2sb.unet import AttnUNetF, QConv, sinusoidal_temporal_embedding


def _ref_conv(x, w, b, strides=(1, 1)):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, w, strides, ((1, 1), (1, 1)), dimension_numbers=dn)
    return y + b


def test_quant_conv2d_close_to_fp32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 12, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((16,)) * 0.1, jnp.float32)
    ref = np.asarray(_ref_conv(x, w, b))
    q = np.asarray(quant_conv2d(x, w, b, (1, 1), ((1, 1), (1, 1))))
    rel = np.abs(q - ref).mean() / np.abs(ref).mean()
    assert rel < 0.02, rel  # ~0.5-1% typical for int8 symmetric


def test_quant_conv2d_strided():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 8)) * 0.3, jnp.float32)
    ref = np.asarray(_ref_conv(x, w, jnp.zeros(8), (2, 2)))
    q = np.asarray(quant_conv2d(x, w, None, (2, 2), ((1, 1), (1, 1))))
    assert q.shape == ref.shape == (1, 4, 4, 8)
    rel = np.abs(q - ref).mean() / np.abs(ref).mean()
    assert rel < 0.03, rel


def test_zero_kernel_exact():
    x = jnp.ones((1, 4, 4, 2))
    w = jnp.zeros((3, 3, 2, 4))
    q = np.asarray(quant_conv2d(x, w, None))
    assert (q == 0).all()
    # and an all-zero input
    q2 = np.asarray(quant_conv2d(jnp.zeros((1, 4, 4, 2)), jnp.ones((3, 3, 2, 4))))
    assert (q2 == 0).all()


def test_symmetric_scales_per_channel():
    w = np.zeros((3, 3, 2, 4), np.float32)
    w[..., 0] = 1.27
    w[..., 2] = -2.54
    s = np.asarray(symmetric_scales(jnp.asarray(w), axis=3))
    np.testing.assert_allclose(s, [0.01, 1.0, 0.02, 1.0], rtol=1e-5)


def test_qconv_param_tree_matches_nn_conv():
    import flax.linen as nn

    x = jnp.zeros((1, 8, 8, 4))
    qp = QConv(6, (3, 3), padding=1).init(jax.random.PRNGKey(0), x)["params"]
    cp = nn.Conv(6, (3, 3), padding=1).init(jax.random.PRNGKey(0), x)["params"]
    assert set(qp) == set(cp) == {"kernel", "bias"}
    assert qp["kernel"].shape == cp["kernel"].shape


def test_unet_int8_matches_bf16_path():
    """Same params, both impls: outputs within quantization tolerance."""
    model_kwargs = dict(
        n_updown_levels=2, hidden_channels=(8, 16, 16), emb_channels=16,
        band_embedding_dim=4, attention_levels=(1,), n_attn_heads=2,
        num_res_blocks=1, rotary_dim=2,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 16, 8, 3)), jnp.float32)
    te = sinusoidal_temporal_embedding(jnp.asarray([0.5]), 16)
    m_bf = AttnUNetF(**model_kwargs)
    m_q = AttnUNetF(**model_kwargs, conv_impl="int8")
    params = m_bf.init(jax.random.PRNGKey(0), x, te)
    out_bf = np.asarray(m_bf.apply(params, x, te))
    out_q = np.asarray(m_q.apply(params, x, te))  # identical param tree
    assert out_q.shape == out_bf.shape
    denom = np.abs(out_bf).mean() + 1e-6
    rel = np.abs(out_q - out_bf).mean() / denom
    assert rel < 0.1, rel


def test_prequantized_weights_match_dynamic_path():
    """The qweights collection (load-time weight quantization,
    prequantize_unet) must reproduce the dynamic int8 path EXACTLY —
    same scales, same int8 kernels, same outputs."""
    from audio_intelligence_tpu.models.a2sb.unet import prequantize_unet

    model_kwargs = dict(
        n_updown_levels=2, hidden_channels=(8, 16, 16), emb_channels=16,
        band_embedding_dim=4, attention_levels=(1,), n_attn_heads=2,
        num_res_blocks=1, rotary_dim=2, conv_impl="int8",
    )
    m = AttnUNetF(**model_kwargs)
    rng = np.random.default_rng(0)
    # bf16 params + inputs: the production int8 flow (with fp32 params the
    # dynamic path quantizes the bf16-CAST kernel at apply time, so the
    # load-time scales would differ by sub-quantization rounding)
    x = jnp.asarray(rng.standard_normal((1, 16, 8, 3)), jnp.bfloat16)
    te = sinusoidal_temporal_embedding(jnp.asarray([0.5]), 16).astype(jnp.bfloat16)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16),
        m.init(jax.random.PRNGKey(0), x, te),
    )

    dynamic = m.apply(params, x, te)
    variables = prequantize_unet(m, params, x, te)
    assert "qweights" in variables
    pre = m.apply(variables, x, te)
    np.testing.assert_array_equal(np.asarray(pre), np.asarray(dynamic))

    # io_layout="nchw" production config too
    m2 = AttnUNetF(**{**model_kwargs, "io_layout": "nchw"})
    x2 = jnp.moveaxis(x, -1, 1)
    v2 = prequantize_unet(m2, params, x2, te)
    pre2 = m2.apply(v2, x2, te)
    dyn2 = m2.apply(params, x2, te)
    np.testing.assert_array_equal(np.asarray(pre2), np.asarray(dyn2))


def test_unet_residual_int8_matches_bf16_path():
    """residual_int8 (int8 residual stream with tracked scale bounds at
    attention-free levels) stays within quantization tolerance of the
    bf16 path, and close to the plain int8 path — the requantization at
    each residual add must not accumulate past the int8 error budget."""
    model_kwargs = dict(
        n_updown_levels=2, hidden_channels=(8, 16, 16), emb_channels=16,
        band_embedding_dim=4, attention_levels=(1,), n_attn_heads=2,
        num_res_blocks=2, rotary_dim=2,
    )
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 16, 8, 3)), jnp.float32)
    te = sinusoidal_temporal_embedding(jnp.asarray([0.5]), 16)
    m_bf = AttnUNetF(**model_kwargs)
    m_q = AttnUNetF(**model_kwargs, conv_impl="int8")
    m_qr = AttnUNetF(**model_kwargs, conv_impl="int8", residual_int8=True)
    params = m_bf.init(jax.random.PRNGKey(0), x, te)
    out_bf = np.asarray(m_bf.apply(params, x, te))
    out_q = np.asarray(m_q.apply(params, x, te))
    out_qr = np.asarray(m_qr.apply(params, x, te))
    denom = np.abs(out_bf).mean() + 1e-6
    rel_bf = np.abs(out_qr - out_bf).mean() / denom
    rel_q = np.abs(out_qr - out_q).mean() / (np.abs(out_q).mean() + 1e-6)
    # tiny random-init fixtures (8-16 channels, 2-head attention)
    # amplify per-tensor int8 error far beyond flagship widths; the e2e
    # restore LSD gate (test_a2sb_end_to_end.py) and the flagship-shape
    # overlap gate (test_a2sb_overlap.py) arbitrate real quality. These
    # bounds only catch gross breakage.
    assert rel_bf < 0.3, rel_bf
    assert rel_q < 0.3, rel_q


def test_unet_residual_int8_prequant_and_nchw():
    """The qres chain composes with load-time weight quantization and
    channels-first IO (the bench configuration)."""
    from audio_intelligence_tpu.models.a2sb.unet import prequantize_unet

    model_kwargs = dict(
        n_updown_levels=2, hidden_channels=(8, 16, 16), emb_channels=16,
        band_embedding_dim=4, attention_levels=(1,), n_attn_heads=2,
        num_res_blocks=2, rotary_dim=2, conv_impl="int8",
        residual_int8=True, io_layout="nchw",
    )
    m = AttnUNetF(**model_kwargs)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 3, 16, 8)), jnp.bfloat16)
    te = sinusoidal_temporal_embedding(jnp.asarray([0.5]), 16).astype(jnp.bfloat16)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16),
        m.init(jax.random.PRNGKey(0), x, te),
    )
    dynamic = m.apply(params, x, te)
    v = prequantize_unet(m, params, x, te)
    pre = m.apply(v, x, te)
    np.testing.assert_array_equal(np.asarray(pre), np.asarray(dynamic))


def test_unet_q_level_edges_matches_bf16_path():
    """q_level_edges (int8 emission at the last residual add of each
    attention-free level) stays within the int8 error budget and
    composes with prequant + nchw (the bench configuration)."""
    from audio_intelligence_tpu.models.a2sb.unet import prequantize_unet

    model_kwargs = dict(
        n_updown_levels=2, hidden_channels=(8, 16, 16), emb_channels=16,
        band_embedding_dim=4, attention_levels=(1,), n_attn_heads=2,
        num_res_blocks=2, rotary_dim=2,
    )
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 16, 8, 3)), jnp.float32)
    te = sinusoidal_temporal_embedding(jnp.asarray([0.5]), 16)
    m_bf = AttnUNetF(**model_kwargs)
    m_q = AttnUNetF(**model_kwargs, conv_impl="int8")
    m_e = AttnUNetF(**model_kwargs, conv_impl="int8", q_level_edges=True)
    params = m_bf.init(jax.random.PRNGKey(0), x, te)
    out_bf = np.asarray(m_bf.apply(params, x, te))
    out_q = np.asarray(m_q.apply(params, x, te))
    out_e = np.asarray(m_e.apply(params, x, te))
    rel_bf = np.abs(out_e - out_bf).mean() / (np.abs(out_bf).mean() + 1e-6)
    rel_q = np.abs(out_e - out_q).mean() / (np.abs(out_q).mean() + 1e-6)
    assert rel_bf < 0.3, rel_bf  # tiny-fixture bound; e2e LSD arbitrates
    assert rel_q < 0.08, rel_q

    m2 = AttnUNetF(**model_kwargs, conv_impl="int8", q_level_edges=True,
                   io_layout="nchw")
    xb = jnp.moveaxis(x, -1, 1).astype(jnp.bfloat16)
    teb = te.astype(jnp.bfloat16)
    params_b = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    v2 = prequantize_unet(m2, params_b, xb, teb)
    pre = m2.apply(v2, xb, teb)
    dyn = m2.apply(params_b, xb, teb)
    np.testing.assert_array_equal(np.asarray(pre), np.asarray(dyn))


def test_tap_gemm_exactly_matches_conv():
    """algo="tap_gemm" (nine shifted GEMMs) is bit-identical to the conv
    lowering — the int32 tap sum commutes with the rescale."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 8, 6, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((8,)) * 0.1, jnp.float32)
    ref = np.asarray(quant_conv2d(x, w, b, (1, 1), ((1, 1), (1, 1))))
    tap = np.asarray(
        quant_conv2d(x, w, b, (1, 1), ((1, 1), (1, 1)), algo="tap_gemm")
    )
    np.testing.assert_array_equal(tap, ref)


def test_unet_tap_gemm_levels_match():
    """tap_gemm_levels routing is numerics-neutral at the model level."""
    model_kwargs = dict(
        n_updown_levels=2, hidden_channels=(8, 16, 16), emb_channels=16,
        band_embedding_dim=4, attention_levels=(1,), n_attn_heads=2,
        num_res_blocks=1, rotary_dim=2, conv_impl="int8",
    )
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((1, 16, 8, 3)), jnp.float32)
    te = sinusoidal_temporal_embedding(jnp.asarray([0.5]), 16)
    m0 = AttnUNetF(**model_kwargs)
    m1 = AttnUNetF(**model_kwargs, tap_gemm_levels=(0, 1))
    params = m0.init(jax.random.PRNGKey(0), x, te)
    out0 = np.asarray(m0.apply(params, x, te))
    out1 = np.asarray(m1.apply(params, x, te))
    np.testing.assert_allclose(out1, out0, atol=2e-5)
