"""ETTA model factory: reference JSON schema → our modules."""

import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

import json

import jax
import jax.numpy as jnp
import numpy as np

from audio_intelligence_tpu.models.etta.factory import create_model_from_config


VAE_CONFIG = {
    "model_type": "autoencoder",
    "sample_size": 1024,
    "sample_rate": 16000,
    "model": {
        "encoder": {"type": "oobleck", "config": {
            "in_channels": 1, "channels": 8, "c_mults": [1, 2], "strides": [2, 2],
            "latent_dim": 8, "use_snake": True}},
        "decoder": {"type": "oobleck", "config": {
            "out_channels": 1, "channels": 8, "c_mults": [1, 2], "strides": [2, 2],
            "latent_dim": 4, "use_snake": True, "final_tanh": False}},
        "bottleneck": {"type": "vae"},
        "latent_dim": 4, "downsampling_ratio": 4, "io_channels": 1,
    },
    "training": {"loss_configs": {"discriminator": {
        "type": "encodec",
        "config": {"filters": 4, "n_ffts": [128], "hop_lengths": [32],
                   "win_lengths": [128]},
        "weights": {"adversarial": 0.1, "feature_matching": 5.0}}}},
}

DIT_CONFIG = {
    "model_type": "diffusion_cond",
    "model": {
        "diffusion": {
            "type": "dit",
            "diffusion_objective": "rectified_flow",
            "cross_attention_cond_ids": ["prompt"],
            "config": {
                "io_channels": 4, "embed_dim": 32, "depth": 1, "num_heads": 2,
                "cond_token_dim": 8, "global_cond_dim": 32,
                "context_xattn": {"n_heads": 2, "d_heads": 8},
            },
        },
        "pretransform": {"type": "autoencoder", "config": VAE_CONFIG["model"]},
    },
}


def test_autoencoder_factory_end_to_end():
    out = create_model_from_config(VAE_CONFIG)
    ae = out["autoencoder"]
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 64, 1)), jnp.float32)
    v = ae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    y, info = ae.apply(v, x, jax.random.PRNGKey(1))
    assert y.shape == x.shape and "kl" in info
    disc = out["discriminator"]
    dv = disc.init(jax.random.PRNGKey(2), x)
    logits, feats = disc.apply(dv, x)
    assert len(logits) == 1


def test_dit_factory_end_to_end():
    out = create_model_from_config(DIT_CONFIG)
    dit = out["diffusion"]
    assert out["diffusion_objective"] == "rectified_flow"
    x = jnp.zeros((1, 8, 4))
    cond = jnp.zeros((1, 3, 8))
    mask = jnp.ones((1, 3), bool)
    g = jnp.zeros((1, 32))
    v = dit.init(jax.random.PRNGKey(0), x, jnp.asarray([0.5]), cond, mask, g)
    y = dit.apply(v, x, jnp.asarray([0.5]), cond, mask, g)
    assert y.shape == x.shape
    assert "pretransform" in out
