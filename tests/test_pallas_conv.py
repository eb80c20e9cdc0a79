"""conv3x3_int8_stats vs quant_conv2d + direct statistics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_intelligence_tpu.ops.pallas_conv import conv3x3_int8_stats
from audio_intelligence_tpu.ops.quant import QTensor, quant_conv2d, quantize_int8


@pytest.mark.parametrize("with_residual", [False, True])
def test_conv3x3_int8_stats_matches(with_residual):
    rng = np.random.default_rng(0)
    b, h, w, c, co = 2, 32, 16, 128, 128
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    kernel = jnp.asarray(0.1 * rng.standard_normal((3, 3, c, co)), jnp.float32)
    bias = jnp.asarray(0.05 * rng.standard_normal((co,)), jnp.float32)
    res = (
        jnp.asarray(rng.standard_normal((b, h, w, co)), jnp.float32)
        if with_residual
        else None
    )

    s_x = jnp.max(jnp.abs(x)) / 127.0
    x_q = quantize_int8(x, s_x)

    y, sums, sums_sq = conv3x3_int8_stats(
        x_q, s_x, kernel, bias, residual=res, out_dtype=jnp.float32,
        interpret=True,
    )

    ref = quant_conv2d(
        QTensor(x_q, s_x), kernel, bias, (1, 1), ((1, 1), (1, 1)),
        out_dtype=jnp.float32,
    )
    if with_residual:
        ref = ref + res
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-3, rtol=1e-3)
    # stats of the (residual-added) output, per batch/channel
    np.testing.assert_allclose(
        np.asarray(sums), np.asarray(jnp.sum(ref, axis=(1, 2))),
        atol=1e-1, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(sums_sq), np.asarray(jnp.sum(ref * ref, axis=(1, 2))),
        atol=1e-1, rtol=1e-4,
    )


def test_conv3x3_int8_stats_multi_tile():
    """H larger than one tile: halo rows + stats accumulation across the
    sequential grid."""
    rng = np.random.default_rng(1)
    b, h, w, c, co = 1, 256, 8, 128, 128  # forces multiple H tiles
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    kernel = jnp.asarray(0.1 * rng.standard_normal((3, 3, c, co)), jnp.float32)

    s_x = jnp.max(jnp.abs(x)) / 127.0
    x_q = quantize_int8(x, s_x)
    y, sums, sums_sq = conv3x3_int8_stats(
        x_q, s_x, kernel, None, out_dtype=jnp.float32, interpret=True
    )
    ref = quant_conv2d(
        QTensor(x_q, s_x), kernel, None, (1, 1), ((1, 1), (1, 1)),
        out_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(sums), np.asarray(jnp.sum(ref, axis=(1, 2))),
        atol=1e-1, rtol=1e-4,
    )


def test_fused_gnq_conv3x3_matches_unfused_chain():
    """The whole-level fused kernel (ops/pallas_fused_conv.py, HWBC
    layout) is bit-identical to the unfused GN-apply→SiLU→quantize→conv
    →(+residual) XLA chain, including SAME-padding semantics (zeros in
    q space, NOT pre-norm) and multi-tile halo exchange."""
    from audio_intelligence_tpu.ops.pallas_fused_conv import fused_gnq_conv3x3

    rng = np.random.default_rng(0)
    h, w, b, c = 16, 8, 4, 128
    x = jnp.asarray(rng.standard_normal((h, w, b, c)) * 0.5, jnp.float32
                    ).astype(jnp.bfloat16)
    es = jnp.asarray(1 + 0.1 * rng.standard_normal((b, c)), jnp.float32)
    eb = jnp.asarray(0.1 * rng.standard_normal((b, c)), jnp.float32)
    s_x = jnp.float32(5.0 / 127.0)
    kernel = jnp.asarray(0.05 * rng.standard_normal((3, 3, c, c)), jnp.float32)
    from audio_intelligence_tpu.ops.quant import symmetric_scales

    s_w = symmetric_scales(kernel, axis=3)
    w_q = quantize_int8(kernel, s_w[None, None, None, :])
    bias = jnp.asarray(0.1 * rng.standard_normal((c,)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((h, w, b, c)) * 0.5, jnp.float32
                      ).astype(jnp.bfloat16)

    def ref():
        y = x.astype(jnp.float32) * es[None, None] + eb[None, None]
        act = y * jax.nn.sigmoid(y)
        q = jnp.clip(jnp.round(act / s_x), -127, 127)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w_q.shape, ("HWNC", "HWIO", "HWNC")
        )
        yo = jax.lax.conv_general_dilated(
            q, w_q.astype(jnp.float32), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn,
        )
        yo = yo * (s_x * s_w)[None, None, None, :] + bias[None, None, None, :]
        yo = yo + res.astype(jnp.float32)
        o = yo.astype(jnp.bfloat16)
        o32 = o.astype(jnp.float32)
        return o, jnp.sum(o32, (0, 1)), jnp.sum(o32 * o32, (0, 1))

    yr, sr, s2r = ref()
    for tiles in [None, (4, 4), (2, 8), (8, 2)]:
        yf, sf, s2f = fused_gnq_conv3x3(
            x, es, eb, s_x, w_q, s_w, bias, residual=res,
            interpret=True, tiles=tiles,
        )
        # bit-identical up to f32 rounding TIES at the quantize (XLA's CPU
        # fma contraction can differ from interpret mode by 1 ulp exactly
        # at .5 boundaries → ±1 int8 step on isolated elements)
        d = np.abs(np.asarray(yr, np.float32) - np.asarray(yf, np.float32))
        assert (d == 0).mean() > 0.999, (d > 0).mean()
        assert d.max() < 0.1, d.max()
        np.testing.assert_allclose(
            np.asarray(sr), np.asarray(sf), rtol=1e-3, atol=0.2
        )
