"""Diffusion autoencoder: encode → conditioned diffusion decode."""

import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.etta.diffusion_autoencoder import (
    DiffusionAutoencoder,
    decode_latents,
    dae_rf_loss,
    upsample_latents,
)
from audio_intelligence_tpu.models.etta.dit import DiffusionTransformer
from audio_intelligence_tpu.models.etta.vae import OobleckEncoder


def build():
    enc = OobleckEncoder(
        in_channels=1, channels=8, latent_dim=4, c_mults=(1, 2), strides=(2, 2)
    )
    dit = DiffusionTransformer(
        io_channels=1, embed_dim=32, depth=1, num_heads=2,
        cond_token_dim=0, global_cond_dim=0, input_concat_dim=4,
    )
    return DiffusionAutoencoder(
        encoder=enc, diffusion=dit, latent_dim=4, downsampling_ratio=4, io_channels=1
    )


def test_upsample_latents():
    lat = jnp.asarray(np.arange(8, dtype=np.float32).reshape(1, 4, 2))
    up = upsample_latents(lat, 8)
    assert up.shape == (1, 8, 2)
    np.testing.assert_allclose(np.asarray(up[0, :2, 0]), [0, 0])


def test_dae_train_and_decode():
    dae = build()
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((2, 32, 1)) * 0.3, jnp.float32)
    t = jnp.asarray([0.5, 0.5])
    variables = dae.init(jax.random.PRNGKey(0), audio, t)

    loss = dae_rf_loss(variables, dae, jax.random.PRNGKey(1), audio)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: dae_rf_loss({"params": p}, dae, jax.random.PRNGKey(1), audio))(
        variables["params"]
    )
    assert float(jax.tree.reduce(lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)) > 0

    latents = dae.apply(variables, audio, method=DiffusionAutoencoder.encode)
    assert latents.shape == (2, 8, 4)
    out = decode_latents(dae, variables, latents, jax.random.PRNGKey(2), steps=4)
    assert out.shape == audio.shape and np.isfinite(np.asarray(out)).all()
