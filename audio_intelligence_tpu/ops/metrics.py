"""Audio quality metrics for validation/eval.

The reference's A2SB validation computes ssr_eval AudioMetrics (LSD etc.)
after a 25-step sampling pass (A2SB_lightning_module.py:455-470). These are
the JAX-native equivalents:

- log-spectral distance (LSD) — the headline restoration metric,
- SI-SDR — scale-invariant signal-to-distortion ratio,
- mel-cepstral-free spectral SNR.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from audio_intelligence_tpu.ops.stft import stft


def log_spectral_distance(
    pred: jax.Array,
    target: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 512,
    eps: float = 1e-8,
) -> jax.Array:
    """LSD in dB over [..., T] waveforms (ssr_eval convention: RMS over
    frequency of the log10 power-spectrogram difference, mean over frames)."""
    sp = jnp.abs(stft(pred, n_fft=n_fft, hop_length=hop_length)) ** 2
    st = jnp.abs(stft(target, n_fft=n_fft, hop_length=hop_length)) ** 2
    diff = jnp.log10(sp + eps) - jnp.log10(st + eps)
    return jnp.mean(jnp.sqrt(jnp.mean(diff**2, axis=-2)))


def si_sdr(pred: jax.Array, target: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Scale-invariant SDR in dB over [..., T]."""
    target = target - jnp.mean(target, axis=-1, keepdims=True)
    pred = pred - jnp.mean(pred, axis=-1, keepdims=True)
    alpha = jnp.sum(pred * target, axis=-1, keepdims=True) / (
        jnp.sum(target**2, axis=-1, keepdims=True) + eps
    )
    proj = alpha * target
    noise = pred - proj
    ratio = jnp.sum(proj**2, axis=-1) / (jnp.sum(noise**2, axis=-1) + eps)
    return jnp.mean(10.0 * jnp.log10(ratio + eps))


def spectral_snr(pred: jax.Array, target: jax.Array, n_fft: int = 2048,
                 hop_length: int = 512, eps: float = 1e-8) -> jax.Array:
    """SNR in the magnitude-spectrogram domain (dB)."""
    sp = jnp.abs(stft(pred, n_fft=n_fft, hop_length=hop_length))
    st = jnp.abs(stft(target, n_fft=n_fft, hop_length=hop_length))
    return jnp.mean(
        10.0 * jnp.log10(jnp.sum(st**2, axis=(-2, -1)) /
                         (jnp.sum((sp - st) ** 2, axis=(-2, -1)) + eps) + eps)
    )


def codebook_usage(codes, codebook_size: int):
    """Per-codebook usage histogram + fraction of codes used (reference
    ETTA training/autoencoders.py:370-375 logs these per quantizer).

    codes: integer array [..., n_q] (trailing axis = quantizer index).
    Returns (hist [n_q, codebook_size] normalized, used_fraction [n_q]).
    """
    import jax.numpy as jnp

    flat = codes.reshape(-1, codes.shape[-1])  # [N, n_q]
    one_hot = jax.nn.one_hot(flat, codebook_size, dtype=jnp.float32)
    hist = one_hot.sum(axis=0)  # [n_q, K]
    hist = hist / jnp.maximum(hist.sum(-1, keepdims=True), 1.0)
    used = (hist > 0).astype(jnp.float32).mean(-1)
    return hist, used
