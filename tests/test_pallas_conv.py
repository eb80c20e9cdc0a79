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
