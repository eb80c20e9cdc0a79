"""k-diffusion solvers, FSQ bottleneck."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.etta.kdiffusion import (
    sigmas_polyexponential,
    v_denoiser,
    sample_k,
)
from audio_intelligence_tpu.models.etta.bottleneck import FSQBottleneck


def test_sigma_schedule():
    s = np.asarray(sigmas_polyexponential(10, 0.3, 500.0))
    np.testing.assert_allclose(s[0], 500.0, rtol=1e-5)
    np.testing.assert_allclose(s[-2], 0.3, rtol=1e-4)
    assert s[-1] == 0.0
    assert (np.diff(s) < 0).all()


def _oracle_v_model(x0):
    """v-model consistent with x = α x0 + σ ε on the VP circle."""

    def model(x, t):
        tt = t.reshape((-1,) + (1,) * (x.ndim - 1))
        alpha = jnp.cos(tt * jnp.pi / 2)
        sigma = jnp.sin(tt * jnp.pi / 2)
        eps = (x - alpha * x0) / jnp.maximum(sigma, 1e-8)
        return alpha * eps - sigma * x0

    return model


def test_v_denoiser_recovers_x0():
    """D(x, σ) of the oracle v-model must return x0 exactly."""
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, 8, 4)), jnp.float32)
    den = v_denoiser(_oracle_v_model(x0))
    # x at noise level σ: x = (x0 + σ ε)/... Karras-space x = x0 + σ·ε
    eps = jnp.asarray(rng.standard_normal((2, 8, 4)), jnp.float32)
    for sigma in (0.5, 2.0, 30.0):
        x = x0 + sigma * eps
        out = den(x, jnp.full((2,), sigma))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-3)


def test_k_samplers_recover_target():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, 8, 4)), jnp.float32)
    model = _oracle_v_model(x0)
    noise = jnp.asarray(rng.standard_normal((1, 8, 4)), jnp.float32)
    for sampler in ("k-euler", "k-heun", "dpmpp-2m"):
        out = sample_k(model, noise, steps=50, sampler_type=sampler)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(x0), atol=0.05,
            err_msg=f"sampler {sampler}",
        )


def test_fsq_roundtrip():
    fsq = FSQBottleneck(levels=(8, 5, 5, 5))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 6, 4)) * 2, jnp.float32)
    zq, info = fsq.encode(x)
    assert zq.shape == x.shape
    # quantized values are integers within the level bounds
    z = np.asarray(zq)
    np.testing.assert_allclose(z, np.round(z), atol=1e-5)
    assert (np.abs(z[..., 0]) <= 3.5).all()
    # codes decode back to the same quantized vectors
    back = fsq.decode_tokens(info["codes"])
    np.testing.assert_allclose(np.asarray(back), z, atol=1e-5)
    assert int(np.asarray(info["codes"]).max()) < 8 * 5 * 5 * 5
