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
import flax.linen as nn


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


class RVQBottleneck(nn.Module):
    """Residual VQ bottleneck (bottleneck.py:150-178).

    Wraps the shared :class:`~audio_intelligence_tpu.models.ualm.codec.
    ResidualVQ` (straight-through, nearest-neighbour per residual stage).
    Unlike the stateless bottlenecks this is a flax module — the codebooks
    are parameters — so it composes into ``AudioAutoencoder`` exactly like
    the encoder/decoder submodules. Latents are NWC [B, T, C] (the
    reference rearranges NCW around its quantizer; we are already NWC).
    """

    num_quantizers: int = 8
    codebook_size: int = 1024
    dim: int = 256
    is_discrete: bool = True
    tokens_id: str = "quantizer_indices"

    def setup(self):
        from audio_intelligence_tpu.models.ualm.codec import ResidualVQ

        self.quantizer = ResidualVQ(
            num_quantizers=self.num_quantizers,
            codebook_size=self.codebook_size,
            dim=self.dim,
        )

    def encode(self, x, rng=None):
        q, codes, losses = self.quantizer(x)
        return q, {
            "quantizer_indices": codes,
            "quantizer_loss": losses["commit_loss"],
        }

    def decode(self, z):
        return z

    def decode_tokens(self, codes):
        """codes [B, T, n_q] → latents (get_outputs_from_indices parity)."""
        return self.quantizer.lookup(codes)


class RVQVAEBottleneck(nn.Module):
    """VAE-sample then residual-VQ (bottleneck.py:179-211): the encoder
    emits 2×dim channels (mean ‖ scale); KL and quantizer losses both
    flow to the trainer."""

    num_quantizers: int = 8
    codebook_size: int = 1024
    dim: int = 256
    is_discrete: bool = True
    tokens_id: str = "quantizer_indices"

    def setup(self):
        from audio_intelligence_tpu.models.ualm.codec import ResidualVQ

        self.quantizer = ResidualVQ(
            num_quantizers=self.num_quantizers,
            codebook_size=self.codebook_size,
            dim=self.dim,
        )

    def encode(self, x, rng):
        mean, scale = jnp.split(x, 2, axis=-1)
        z, kl = vae_sample(rng, mean, scale)
        q, codes, losses = self.quantizer(z)
        return q, {
            "kl": kl,
            "quantizer_indices": codes,
            "quantizer_loss": losses["commit_loss"],
        }

    def decode(self, z):
        return z

    def decode_tokens(self, codes):
        return self.quantizer.lookup(codes)


class DACResidualVQ(nn.Module):
    """DAC-style residual VQ (descript dac.nn.quantize, used by the
    DACRVQ(VAE) bottlenecks, bottleneck.py:212-316): each stage projects
    the residual to a small ``codebook_dim``, looks up the nearest code by
    cosine distance (both sides L2-normalized), projects back up, and
    subtracts. Returns the reference's 5-tuple semantics as a dict."""

    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8

    @nn.compact
    def __call__(self, x):
        """x [B, T, D] → dict(z, codes [B, T, n_q], latents [B, T, n_q·d],
        commitment_loss, codebook_loss)."""
        residual = x
        z_sum = jnp.zeros_like(x)
        codes, latents = [], []
        commit = 0.0
        cb_loss = 0.0
        for i in range(self.n_codebooks):
            z_e = nn.Dense(self.codebook_dim, use_bias=False, name=f"in_proj{i}")(
                residual
            )
            cb = self.param(
                f"codebook{i}",
                nn.initializers.normal(1.0),
                (self.codebook_size, self.codebook_dim),
            )
            # cosine lookup: normalize both sides (dac quantize.decode_latents)
            z_n = z_e / jnp.maximum(
                jnp.linalg.norm(z_e, axis=-1, keepdims=True), 1e-12
            )
            cb_n = cb / jnp.maximum(
                jnp.linalg.norm(cb, axis=-1, keepdims=True), 1e-12
            )
            idx = jnp.argmax(jnp.einsum("btd,kd->btk", z_n, cb_n), axis=-1)
            z_q = cb[idx]  # unnormalized embedding lookup (decode_code)
            commit = commit + jnp.mean((z_e - jax.lax.stop_gradient(z_q)) ** 2)
            cb_loss = cb_loss + jnp.mean((jax.lax.stop_gradient(z_e) - z_q) ** 2)
            z_q = z_e + jax.lax.stop_gradient(z_q - z_e)  # straight-through
            up = nn.Dense(x.shape[-1], use_bias=False, name=f"out_proj{i}")(z_q)
            z_sum = z_sum + up
            residual = residual - up
            codes.append(idx)
            latents.append(z_e)
        return {
            "z": z_sum,
            "codes": jnp.stack(codes, axis=-1),
            "latents": jnp.concatenate(latents, axis=-1),
            "commitment_loss": commit,
            "codebook_loss": cb_loss,
        }

    def from_codes(self, codes):
        """codes [B, T, n_q] → z (sum of out-projected code vectors)."""
        params = self.variables["params"]
        z_sum = None
        for i in range(self.n_codebooks):
            cb = params[f"codebook{i}"]
            w = params[f"out_proj{i}"]["kernel"]
            up = cb[codes[..., i]] @ w
            z_sum = up if z_sum is None else z_sum + up
        return z_sum


class DACRVQBottleneck(nn.Module):
    """DAC residual-VQ bottleneck (bottleneck.py:212-264): losses are
    normalized by the codebook count; ``quantize_on_decode`` defers
    quantization to the decoder side; ``noise_augment_dim`` appends
    Gaussian channels before decoding."""

    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8
    quantize_on_decode: bool = False
    noise_augment_dim: int = 0
    is_discrete: bool = True
    tokens_id: str = "codes"

    def setup(self):
        self.quantizer = DACResidualVQ(
            n_codebooks=self.n_codebooks,
            codebook_size=self.codebook_size,
            codebook_dim=self.codebook_dim,
        )

    def encode(self, x, rng=None):
        info = {"pre_quantizer": x}
        if self.quantize_on_decode:
            return x, info
        out = self.quantizer(x)
        info.update(out)
        info["vq/commitment_loss"] = out["commitment_loss"] / self.n_codebooks
        info["vq/codebook_loss"] = out["codebook_loss"] / self.n_codebooks
        return out["z"], info

    def decode(self, z, rng=None):
        if self.quantize_on_decode:
            z = self.quantizer(z)["z"]
        if self.noise_augment_dim > 0:
            if rng is None:
                rng = self.make_rng("noise")
            noise = jax.random.normal(
                rng, z.shape[:-1] + (self.noise_augment_dim,), z.dtype
            )
            z = jnp.concatenate([z, noise], axis=-1)
        return z

    def decode_tokens(self, codes):
        return self.decode(self.quantizer.from_codes(codes))


class DACRVQVAEBottleneck(nn.Module):
    """VAE-sample then DAC residual-VQ (bottleneck.py:265-316)."""

    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8
    quantize_on_decode: bool = False
    is_discrete: bool = True
    tokens_id: str = "codes"

    def setup(self):
        self.quantizer = DACResidualVQ(
            n_codebooks=self.n_codebooks,
            codebook_size=self.codebook_size,
            codebook_dim=self.codebook_dim,
        )

    def encode(self, x, rng):
        mean, scale = jnp.split(x, 2, axis=-1)
        z, kl = vae_sample(rng, mean, scale)
        info = {"pre_quantizer": z, "kl": kl}
        if self.quantize_on_decode:
            return z, info
        out = self.quantizer(z)
        info.update(out)
        info["vq/commitment_loss"] = out["commitment_loss"] / self.n_codebooks
        info["vq/codebook_loss"] = out["codebook_loss"] / self.n_codebooks
        return out["z"], info

    def decode(self, z):
        if self.quantize_on_decode:
            z = self.quantizer(z)["z"]
        return z

    def decode_tokens(self, codes):
        return self.decode(self.quantizer.from_codes(codes))


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
