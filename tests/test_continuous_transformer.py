"""Continuous transformer (alt DiT backbone) + diffusion-prior usage."""

import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.etta.continuous_transformer import (
    ContinuousTransformer,
)
from audio_intelligence_tpu.models.etta.dit import DiffusionTransformer
from audio_intelligence_tpu.models.etta.sampling import sample_discrete_euler


def test_continuous_transformer_shapes():
    model = ContinuousTransformer(
        dim=32, depth=2, heads=4, dim_in=8, dim_out=8,
        cross_attend=True, cond_token_dim=16, global_cond_dim=32,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((2, 5, 16)), jnp.float32)
    mask = jnp.ones((2, 5), bool)
    g = jnp.asarray(rng.standard_normal((2, 32)), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, ctx, mask, g)
    out = model.apply(v, x, ctx, mask, g)
    assert out.shape == x.shape
    # context actually used
    out2 = model.apply(v, x, ctx * 2, mask, g)
    assert np.abs(np.asarray(out - out2)).max() > 1e-6


def test_mono_to_stereo_prior():
    """Diffusion prior = DiT with input-concat conditioning
    (MonoToStereoDiffusionPrior, models/diffusion_prior.py:17-25):
    x = stereo latents, input_concat = mono latents."""
    dit = DiffusionTransformer(
        io_channels=4, embed_dim=32, depth=1, num_heads=2,
        cond_token_dim=8, global_cond_dim=16, xattn_heads=2, xattn_d_memory=8,
        input_concat_dim=2,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 8, 4)), jnp.float32)
    mono = jnp.asarray(rng.standard_normal((1, 8, 2)), jnp.float32)
    cond = jnp.zeros((1, 2, 8))
    mask = jnp.ones((1, 2), bool)
    g = jnp.zeros((1, 16))
    params = dit.init(
        jax.random.PRNGKey(0), x, jnp.asarray([0.5]), cond, mask, g,
        input_concat_cond=mono,
    )

    def model_fn(xt, t):
        return dit.apply(params, xt, t, cond, mask, g, input_concat_cond=mono)

    out = sample_discrete_euler(model_fn, x, steps=4)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
