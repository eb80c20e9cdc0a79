"""Fused pallas GroupNorm vs reference math (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.ops.pallas_groupnorm import fused_group_norm


def _ref(x, scale, bias, g=32, ms=None, sh=None, silu=False):
    b, h, w, c = x.shape
    g = min(g, c)
    xg = x.reshape(b, h, w, g, c // g).astype(np.float64)
    m = xg.mean(axis=(1, 2, 4), keepdims=True)
    v = xg.var(axis=(1, 2, 4), keepdims=True)
    y = ((xg - m) / np.sqrt(v + 1e-5)).reshape(b, h, w, c) * scale + bias
    if ms is not None:
        y = y * (1 + ms[:, :, None, :]) + sh[:, :, None, :]
    if silu:
        y = y * (1 / (1 + np.exp(-y)))
    return y


def test_fused_gn_matches_reference():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, 16, 8, 256)) * 2 + 0.5).astype(np.float32)
    scale = (rng.standard_normal(256) * 0.1 + 1).astype(np.float32)
    bias = (rng.standard_normal(256) * 0.1).astype(np.float32)
    out = np.asarray(
        fused_group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
                         interpret=True)
    )
    np.testing.assert_allclose(out, _ref(x, scale, bias), atol=2e-5)


def test_fused_gn_mod_silu():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8, 8, 128)).astype(np.float32)
    scale = np.ones(128, np.float32)
    bias = np.zeros(128, np.float32)
    ms = (rng.standard_normal((1, 8, 128)) * 0.2).astype(np.float32)
    sh = (rng.standard_normal((1, 8, 128)) * 0.2).astype(np.float32)
    out = np.asarray(
        fused_group_norm(
            jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
            mod_scale=jnp.asarray(ms), mod_shift=jnp.asarray(sh),
            silu=True, interpret=True,
        )
    )
    ref = _ref(x, scale, bias, ms=ms, sh=sh, silu=True)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_fused_gn_bf16_within_resolution():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 32, 16, 128)).astype(np.float32)
    scale = np.ones(128, np.float32)
    bias = np.zeros(128, np.float32)
    out = np.asarray(
        fused_group_norm(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(scale), jnp.asarray(bias),
            interpret=True,
        )
    ).astype(np.float32)
    assert np.abs(out - _ref(x, scale, bias)).max() < 0.08  # bf16 rounding
