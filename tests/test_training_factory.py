"""Config → training wrapper factory (reference training/factory.py)."""

import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.etta.factory import (
    create_demo_callback_from_config,
    create_model_from_config,
    create_training_wrapper_from_config,
)

AE_CFG = {
    "model_type": "autoencoder",
    "sample_rate": 16000,
    "sample_size": 2048,
    "model": {
        "io_channels": 1,
        "encoder": {"type": "oobleck", "config": {
            "channels": 4, "latent_dim": 8, "c_mults": [2, 4], "strides": [4, 4]}},
        "decoder": {"type": "oobleck", "config": {
            "channels": 4, "latent_dim": 4, "c_mults": [2, 4], "strides": [4, 4]}},
        "bottleneck": {"type": "vae"},
    },
    "training": {"loss_configs": {"discriminator": {
        "type": "dac", "config": {"periods": [2], "fft_sizes": [256]}}}},
}

DIT_CFG = {
    "model_type": "diffusion_cond",
    "sample_rate": 16000,
    "sample_size": 4096,
    "downsampling_ratio": 256,
    "model": {"diffusion": {"type": "dit", "config": {
        "io_channels": 8, "embed_dim": 32, "depth": 1, "num_heads": 2,
        "cond_token_dim": 16, "global_cond_dim": 16}}},
}


def test_vae_training_wrapper_runs_both_steps():
    mods = create_model_from_config(AE_CFG)
    w = create_training_wrapper_from_config(AE_CFG, mods, batch_size=1)
    assert w["gan_type"] == "dac"
    reals = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 2048, 1)) * 0.1,
        jnp.float32,
    )
    st, m = jax.jit(w["gen_step"])(w["state"], jax.random.PRNGKey(0), reals)
    assert np.isfinite(float(m["loss"]))
    st, md = jax.jit(w["disc_step"])(st, jax.random.PRNGKey(1), reals)
    assert np.isfinite(float(md["loss_dis"]))
    assert w["step_is_disc"](3, warmup_steps=1) and not w["step_is_disc"](2, 1)


def test_diffusion_training_wrapper_step():
    mods = create_model_from_config(DIT_CFG)
    w = create_training_wrapper_from_config(DIT_CFG, mods, batch_size=1)
    batch = {
        "latents": jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 16, 8)), jnp.float32
        ),
        "cross_attn_cond": jnp.zeros((1, 1, 16)),
        "cross_attn_mask": jnp.ones((1, 1), bool),
        "global_cond": jnp.zeros((1, 16)),
    }
    state, metrics = jax.jit(w["train_step"])(
        w["state"], jax.random.PRNGKey(0), batch
    )
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_demo_callback_from_config():
    cb = create_demo_callback_from_config(
        {"training": {"demo": {"demo_every": 7}}}, demo_fn=lambda step: {}
    )
    assert cb.demo_every == 7
