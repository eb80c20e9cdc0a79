"""Mel filterbanks and mel spectrograms.

Supports both the HTK scale (torchaudio default) and the Slaney scale with
area normalization (librosa default, used by Whisper-style feature
extractors — reference: UALM/models/ualm/multimodal_io/audio.py:1013-1101).
The filterbank is a dense [n_freqs, n_mels] matrix so the mel projection is
a single MXU matmul fused behind the magnitude computation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audio_intelligence_tpu.ops.stft import stft, hann_window


def _hz_to_mel(freq, mel_scale: str):
    if mel_scale == "htk":
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    # slaney
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    if np.isscalar(freq):
        if freq >= min_log_hz:
            mels = min_log_mel + np.log(freq / min_log_hz) / logstep
        return mels
    freq = np.asarray(freq)
    mels = np.asarray(mels, dtype=np.float64)
    log_region = freq >= min_log_hz
    mels[log_region] = min_log_mel + np.log(freq[log_region] / min_log_hz) / logstep
    return mels


def _mel_to_hz(mels, mel_scale: str):
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    mels = np.asarray(mels)
    freqs = np.asarray(freqs, dtype=np.float64)
    log_region = mels >= min_log_mel
    freqs[log_region] = min_log_hz * np.exp(logstep * (mels[log_region] - min_log_mel))
    return freqs


@functools.lru_cache(maxsize=32)
def _mel_filterbank_np(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float,
    f_max: float,
    mel_scale: str,
    norm: str | None,
) -> np.ndarray:
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_min = _hz_to_mel(f_min, mel_scale)
    m_max = _hz_to_mel(f_max, mel_scale)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz(m_pts, mel_scale)

    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))  # (n_freqs, n_mels)

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb *= enorm[None, :]
    return fb.astype(np.float32)


def mel_filterbank(
    n_freqs: int,
    n_mels: int = 128,
    sample_rate: int = 44100,
    f_min: float = 0.0,
    f_max: float | None = None,
    mel_scale: str = "htk",
    norm: str | None = None,
) -> jax.Array:
    """Triangular mel filterbank, shape ``[n_freqs, n_mels]``.

    ``mel_scale='htk', norm=None`` matches torchaudio defaults;
    ``mel_scale='slaney', norm='slaney'`` matches librosa/Whisper.
    """
    f_max = f_max if f_max is not None else sample_rate / 2
    return jnp.asarray(
        _mel_filterbank_np(n_freqs, n_mels, sample_rate, f_min, f_max, mel_scale, norm)
    )


def melspectrogram(
    x: jax.Array,
    sample_rate: int = 44100,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int | None = None,
    n_mels: int = 128,
    f_min: float = 0.0,
    f_max: float | None = None,
    power: float = 2.0,
    mel_scale: str = "htk",
    norm: str | None = None,
) -> jax.Array:
    """Mel spectrogram ``[..., n_mels, time]`` (torchaudio MelSpectrogram defaults)."""
    spec = stft(x, n_fft=n_fft, hop_length=hop_length, win_length=win_length)
    mag = jnp.abs(spec) ** power  # [..., freq, time]
    fb = mel_filterbank(
        mag.shape[-2], n_mels, sample_rate, f_min, f_max, mel_scale, norm
    )
    return jnp.einsum("...ft,fm->...mt", mag, fb)


def log_mel_whisper(
    x: jax.Array,
    n_fft: int = 400,
    hop_length: int = 160,
    n_mels: int = 128,
    sample_rate: int = 16000,
) -> jax.Array:
    """Whisper-style log-mel features ``[..., n_mels, frames]``.

    Matches openai/whisper ``log_mel_spectrogram``: slaney mel, power spec
    with last frame dropped, log10 clamp to (max - 8), scale to [~-1, 1]
    (reference behavior consumed by UALM's AFWhisper tower,
    UALM/models/ualm/multimodal_io/modeling_whisper.py).
    """
    spec = stft(x, n_fft=n_fft, hop_length=hop_length)
    mag2 = jnp.abs(spec[..., :-1]) ** 2.0  # drop last frame like whisper
    fb = mel_filterbank(
        mag2.shape[-2], n_mels, sample_rate, 0.0, sample_rate / 2, "slaney", "slaney"
    )
    mel = jnp.einsum("...ft,fm->...mt", mag2, fb)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec, axis=(-2, -1), keepdims=True) - 8.0)
    return (log_spec + 4.0) / 4.0
