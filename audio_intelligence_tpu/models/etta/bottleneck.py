"""Latent bottlenecks (ETTA/stable_audio_tools/models/bottleneck.py).

Pluggable regularizers between the Oobleck encoder and decoder. The ETTA
flagship uses the VAE bottleneck with KL weight 1e-4 (etta_vae.json);
Tanh / Wasserstein(MMD) / L2 and the quantizers (RVQ / FSQ) cover the
reference's other configs.

Layout: latents are NWC ([B, T, C]); the reference is NCW — channel
split/KL sums translate accordingly.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


def vae_sample(key, mean, scale):
    """Reparameterized sample + per-batch KL (bottleneck.py:55-63):
    stdev = softplus(scale) + 1e-4; kl = Σ_c (μ² + σ² − log σ² − 1),
    summed over channels, meaned over batch·time."""
    stdev = jax.nn.softplus(scale) + 1e-4
    var = stdev * stdev
    logvar = jnp.log(var)
    latents = mean + stdev * jax.random.normal(key, mean.shape, mean.dtype)
    kl = jnp.mean(jnp.sum(mean * mean + var - logvar - 1.0, axis=-1))
    return latents, kl


@dataclass(frozen=True)
class VAEBottleneck:
    is_discrete: bool = False

    def encode(self, x, rng):
        """x [B, T, 2C] (mean ‖ scale along channels) → (z [B, T, C], info)."""
        mean, scale = jnp.split(x, 2, axis=-1)
        z, kl = vae_sample(rng, mean, scale)
        return z, {"kl": kl}

    def encode_mean(self, x):
        """Deterministic encode (inference): return the posterior mean."""
        mean, _ = jnp.split(x, 2, axis=-1)
        return mean

    def decode(self, z):
        return z


@dataclass(frozen=True)
class TanhBottleneck:
    is_discrete: bool = False

    def encode(self, x, rng=None):
        return jnp.tanh(x), {}

    def decode(self, z):
        return z


@dataclass(frozen=True)
class L2Bottleneck:
    """Project latents to the unit sphere (bottleneck.py:133-149)."""

    is_discrete: bool = False

    def encode(self, x, rng=None):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12), {}

    def decode(self, z):
        return z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)


@dataclass(frozen=True)
class FSQBottleneck:
    """Finite Scalar Quantization (bottleneck.py:317-357): per-dim round to
    ``levels[i]`` buckets with straight-through gradients. Discrete."""

    levels: tuple = (8, 5, 5, 5)
    is_discrete: bool = True

    def _bound(self, z):
        l = jnp.asarray(self.levels, z.dtype)
        half = (l - 1.0) / 2.0
        return jnp.tanh(z) * half

    def encode(self, x, rng=None):
        """x [..., len(levels)] → (quantized, {codes})."""
        z = self._bound(x)
        zq = jnp.round(z)
        zq = z + jax.lax.stop_gradient(zq - z)
        l = jnp.asarray(self.levels)
        half = (l - 1) // 2
        digits = (jnp.round(z) + half).astype(jnp.int32)
        basis = jnp.concatenate(
            [jnp.ones((1,), jnp.int32), jnp.cumprod(l[:-1])]
        )
        codes = jnp.sum(digits * basis, axis=-1)
        return zq, {"codes": codes}

    def decode(self, z):
        return z

    def decode_tokens(self, codes):
        l = jnp.asarray(self.levels)
        basis = jnp.concatenate(
            [jnp.ones((1,), jnp.int32), jnp.cumprod(l[:-1])]
        )
        digits = (codes[..., None] // basis) % l
        half = (l - 1) // 2
        return (digits - half).astype(jnp.float32)


@dataclass(frozen=True)
class WassersteinBottleneck:
    """MMD-to-Gaussian regularizer (bottleneck.py:85-131)."""

    is_discrete: bool = False
    noise_augment_dim: int = 0

    def encode(self, x, rng):
        flat = x.reshape(-1, x.shape[-1])
        noise = jax.random.normal(rng, flat.shape, flat.dtype)

        def mean_kernel(a, b):
            d = jnp.mean((a[:, None] - b[None]) ** 2, axis=2) / a.shape[-1]
            return jnp.mean(jnp.exp(-d))

        mmd = (
            mean_kernel(flat, flat)
            + mean_kernel(noise, noise)
            - 2 * mean_kernel(flat, noise)
        )
        return x, {"mmd": mmd}

    def decode(self, z):
        return z
