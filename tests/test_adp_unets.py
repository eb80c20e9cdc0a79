"""Legacy adp/Dance-Diffusion 1-D UNets (reference adp.py + diffusion.py:385)."""

import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.etta.adp import (
    DiffusionAttnUnet1D,
    FourierFeatures,
    UNet1d,
    UNetCFG1d,
    _fir_resample,
    scale_params,
)


def test_fir_resample_roundtrip_shapes():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 4))
    d = _fir_resample(x, "cubic", up=False)
    assert d.shape == (2, 32, 4)
    u = _fir_resample(d, "cubic", up=True)
    assert u.shape == (2, 64, 4)
    # DC gain ~1 both ways (kernels sum to 1 / 2·1)
    const = jnp.ones((1, 64, 1))
    np.testing.assert_allclose(
        np.asarray(_fir_resample(const, "linear", up=False))[0, 4:-4, 0], 1.0, atol=1e-5
    )


def test_dance_diffusion_unet_forward():
    m = DiffusionAttnUnet1D(
        io_channels=2, depth=4, n_attn_layers=2,
        channels=(8, 8, 16, 16), cond_dim=0,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 2))
    t = jnp.asarray([0.3, 0.7])
    params = m.init(jax.random.PRNGKey(1), x, t)
    y = m.apply(params, x, t)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    # halved params halve the (linear-in-last-layer) output scale direction
    y2 = m.apply(scale_params(params, 0.0), x, t)
    assert float(jnp.abs(y2).max()) == 0.0


def test_dance_diffusion_cond_resize():
    m = DiffusionAttnUnet1D(io_channels=1, depth=2, n_attn_layers=0,
                            channels=(8, 8), cond_dim=3)
    x = jnp.zeros((1, 64, 1))
    t = jnp.asarray([0.5])
    cond = jax.random.normal(jax.random.PRNGKey(0), (1, 17, 3))  # wrong T
    params = m.init(jax.random.PRNGKey(1), x, t, cond)
    y = m.apply(params, x, t, cond)
    assert y.shape == (1, 64, 1)


def test_unet1d_and_cfg():
    emb = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32))
    m = UNetCFG1d(
        in_channels=2, channels=8, multipliers=(1, 2, 2), factors=(2, 2),
        num_blocks=(1, 1), attentions=(0, 1), attention_heads=2,
        embedding_max_length=8, embedding_features=32,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 2))
    t = jnp.asarray([0.1, 0.9])
    params = m.init(jax.random.PRNGKey(2), x, t, emb)
    y = m.apply(params, x, t, emb)
    assert y.shape == x.shape
    # CFG scale blends cond/uncond: scale=1 equals plain cond pass
    y_s1 = m.apply(params, x, t, emb, embedding_scale=1.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_s1), atol=1e-6)
    y_s3 = m.apply(params, x, t, emb, embedding_scale=3.0)
    assert not np.allclose(np.asarray(y), np.asarray(y_s3), atol=1e-4)
    # embedding dropout path runs with an rng
    y_drop = m.apply(
        params, x, t, emb, embedding_mask_proba=1.0, rng=jax.random.PRNGKey(3)
    )
    # proba=1 -> everything replaced by the fixed null embedding == uncond
    y_null = m.apply(
        params, x, t,
        jnp.broadcast_to(params["params"]["fixed_embedding"][None], emb.shape),
    )
    np.testing.assert_allclose(np.asarray(y_drop), np.asarray(y_null), atol=1e-5)


def test_fourier_features_shape():
    f = FourierFeatures(16)
    p = f.init(jax.random.PRNGKey(0), jnp.zeros((4, 1)))
    out = f.apply(p, jnp.asarray([[0.1], [0.5], [0.9], [1.0]]))
    assert out.shape == (4, 16)
