"""JAX-native residual-VQ neural audio codec (Xcodec-interface compatible).

The reference's discrete audio IO wraps HF Xcodec (8 RVQ streams × 1024
codes @ 50 Hz on 16 kHz audio — UALM/models/ualm/multimodal_io/
audio.py:203-232). Pretrained Xcodec weights cannot ship here, so this is
a from-scratch TPU codec exposing the same interface: waveform [B, T] →
codes [B, T/320, 8] and back.

Architecture: Oobleck-style conv encoder/decoder (reused from the ETTA
VAE blocks — strides 4·4·4·5 = ×320) around a residual vector quantizer
with straight-through gradients and commitment loss. Codebook lookups are
MXU matmuls (−2·x·Cᵀ + ‖C‖² distance trick), the residual loop is a
Python-unrolled 8 steps (static).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from audio_intelligence_tpu.models.etta.vae import OobleckEncoder, OobleckDecoder


class ResidualVQ(nn.Module):
    """n_q codebooks of size K over dim-D residuals, straight-through."""

    num_quantizers: int = 8
    codebook_size: int = 1024
    dim: int = 256

    @nn.compact
    def __call__(self, x):
        """x [B, T, D] → (quantized [B, T, D], codes [B, T, n_q], losses)."""
        codebooks = self.param(
            "codebooks",
            nn.initializers.normal(1.0),
            (self.num_quantizers, self.codebook_size, self.dim),
        )
        residual = x
        quantized = jnp.zeros_like(x)
        codes = []
        commit_loss = 0.0
        for q in range(self.num_quantizers):
            cb = codebooks[q]  # [K, D]
            # ‖r − c‖² = ‖r‖² − 2 r·c + ‖c‖²; ‖r‖² constant per argmin
            dots = jnp.einsum("btd,kd->btk", residual, cb)
            d2 = -2.0 * dots + jnp.sum(cb * cb, axis=-1)[None, None, :]
            idx = jnp.argmin(d2, axis=-1)  # [B, T]
            picked = cb[idx]  # [B, T, D]
            codes.append(idx)
            commit_loss = commit_loss + jnp.mean(
                (jax.lax.stop_gradient(picked) - residual) ** 2
            )
            quantized = quantized + picked
            residual = residual - jax.lax.stop_gradient(picked)
        # straight-through: gradients flow to x as identity
        quantized = x + jax.lax.stop_gradient(quantized - x)
        return quantized, jnp.stack(codes, axis=-1), {
            "commit_loss": commit_loss / self.num_quantizers
        }

    def lookup(self, codes):
        """codes [B, T, n_q] → summed vectors [B, T, D]."""
        codebooks = self.variables["params"]["codebooks"]
        vecs = jnp.take_along_axis(
            codebooks[None, None],  # [1, 1, n_q, K, D]
            codes[..., None, None].transpose(0, 1, 2, 3, 4),
            axis=3,
        )
        # simpler: gather per quantizer
        out = 0.0
        for q in range(self.num_quantizers):
            out = out + codebooks[q][codes[..., q]]
        return out


class RVQCodec(nn.Module):
    """16 kHz mono waveform ↔ 8-stream codes @ 50 Hz (×320 downsample)."""

    num_quantizers: int = 8
    codebook_size: int = 1024
    latent_dim: int = 256
    channels: int = 32
    c_mults: Sequence[int] = (2, 4, 8, 8)
    strides: Sequence[int] = (4, 4, 4, 5)
    sample_rate: int = 16000

    def setup(self):
        self.encoder = OobleckEncoder(
            in_channels=1,
            channels=self.channels,
            latent_dim=self.latent_dim,
            c_mults=self.c_mults,
            strides=self.strides,
        )
        self.decoder = OobleckDecoder(
            out_channels=1,
            channels=self.channels,
            latent_dim=self.latent_dim,
            c_mults=self.c_mults,
            strides=self.strides,
        )
        self.rvq = ResidualVQ(self.num_quantizers, self.codebook_size, self.latent_dim)

    @property
    def frame_rate(self) -> int:
        ratio = 1
        for s in self.strides:
            ratio *= s
        return self.sample_rate // ratio

    def encode(self, wav):
        """wav [B, T] → codes [B, T/320, n_q]."""
        z = self.encoder(wav[..., None])
        _, codes, _ = self.rvq(z)
        return codes

    def decode(self, codes):
        """codes [B, L, n_q] → wav [B, L·320]."""
        z = self.rvq.lookup(codes)
        return self.decoder(z)[..., 0]

    def __call__(self, wav):
        """Training forward: wav → (recon, codes, aux losses)."""
        z = self.encoder(wav[..., None])
        zq, codes, aux = self.rvq(z)
        recon = self.decoder(zq)[..., 0]
        return recon, codes, aux
