"""STFT / iSTFT as pure-functional XLA ops.

Semantics match ``torchaudio.transforms.Spectrogram(power=None)`` /
``InverseSpectrogram`` as used by the reference's A2SB front-end
(reference: A2SB/audio_transforms/transforms.py:83-106, 163-184):
hann window, ``center=True`` reflect padding, one-sided rfft, no
normalization.

TPU notes: framing is expressed as a strided gather which XLA lowers to an
efficient dynamic-slice loop fused with the window multiply; the FFT itself
uses XLA's native rfft. Batched inputs keep the batch dim leading so the
whole (B, frames, n_fft) tensor tiles onto the VPU/MXU cleanly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window (matches ``torch.hann_window(periodic=True)``)."""
    n = jnp.arange(win_length, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / win_length)


def _pad_center(window: jax.Array, n_fft: int) -> jax.Array:
    """Zero-pad a window symmetrically to n_fft (torch.stft semantics)."""
    win_length = window.shape[-1]
    if win_length == n_fft:
        return window
    left = (n_fft - win_length) // 2
    return jnp.pad(window, (left, n_fft - win_length - left))


def frame_signal(x: jax.Array, frame_length: int, hop_length: int) -> jax.Array:
    """Slice ``x [..., T]`` into overlapping frames ``[..., n_frames, frame_length]``.

    Static shapes only: n_frames = 1 + (T - frame_length) // hop_length.
    """
    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // hop_length
    # Gather-based framing: XLA turns this into strided slices; on TPU the
    # gather fuses with the subsequent window multiply.
    starts = jnp.arange(n_frames) * hop_length
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    return x[..., idx]


def stft(
    x: jax.Array,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int | None = None,
    window: jax.Array | None = None,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jax.Array:
    """Complex STFT of ``x [..., T]`` → ``[..., n_fft//2+1, n_frames]`` (complex64).

    Matches ``torch.stft(..., center=True, onesided=True, normalized=False,
    return_complex=True)``.
    """
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length, dtype=x.dtype)
    window = _pad_center(window, n_fft)

    if center:
        pad = n_fft // 2
        pad_cfg = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, pad_cfg, mode=pad_mode)

    frames = frame_signal(x, n_fft, hop_length)  # [..., n_frames, n_fft]
    frames = frames * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # [..., n_frames, n_fft//2+1]
    return jnp.swapaxes(spec, -1, -2)  # [..., freq, time]


def istft(
    spec: jax.Array,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int | None = None,
    window: jax.Array | None = None,
    center: bool = True,
    length: int | None = None,
    eps: float = 1e-11,
) -> jax.Array:
    """Inverse STFT of complex ``spec [..., freq, time]`` → waveform ``[..., T]``.

    Matches ``torch.istft`` (window-envelope-normalized overlap-add).
    """
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length, dtype=jnp.float32)
    window = _pad_center(window, n_fft)

    spec = jnp.swapaxes(spec, -1, -2)  # [..., n_frames, freq]
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # [..., n_frames, n_fft]
    frames = frames * window

    n_frames = frames.shape[-2]
    out_len = n_fft + hop_length * (n_frames - 1)

    # Overlap-add via a scatter-add over frame offsets. XLA lowers the
    # segment-sum formulation efficiently; we express it as a dilated
    # transposed gather: build [n_frames, out_len] one-hot free version with
    # dynamic_update-slice scan would serialize, so use the standard
    # reshape/pad trick: pad each frame to out_len at its offset via
    # lax.conv_transpose-style scatter using jnp.zeros().at[].add with
    # precomputed indices (XLA scatter-add, fully parallel).
    offsets = jnp.arange(n_frames) * hop_length
    idx = offsets[:, None] + jnp.arange(n_fft)[None, :]  # [n_frames, n_fft]
    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, n_frames, n_fft))
    out = jnp.zeros((flat.shape[0], out_len), dtype=frames.dtype)
    out = out.at[:, idx.reshape(-1)].add(flat.reshape(flat.shape[0], -1))

    # Window-square envelope for normalization.
    wsq = (window * window)[None, :]
    env = jnp.zeros((1, out_len), dtype=frames.dtype)
    env = env.at[:, idx.reshape(-1)].add(jnp.broadcast_to(wsq, (n_frames, n_fft)).reshape(1, -1))
    out = out / jnp.maximum(env, eps)

    pad = n_fft // 2 if center else 0
    if length is not None:
        # torch.istft: slice [pad : pad + length], zero-padding if short.
        end = pad + length
        if end > out_len:
            out = jnp.pad(out, ((0, 0), (0, end - out_len)))
        out = out[:, pad:end]
    else:
        out = out[:, pad : out_len - pad]
    return out.reshape(batch_shape + (out.shape[-1],))


def spectrogram(
    x: jax.Array,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int | None = None,
    power: float | None = None,
) -> jax.Array:
    """A2SB ``ComplexSpectrogram`` equivalent.

    power=None → 2-channel real view of the complex STFT, shaped
    ``[..., 2, freq, time]`` (channel 0 = real, 1 = imag), matching
    ``torch.view_as_real(spec).permute(2, 0, 1)``
    (reference: A2SB/audio_transforms/transforms.py:83-106).
    power=1/2 → magnitude / power spectrogram ``[..., freq, time]``.
    """
    spec = stft(x, n_fft=n_fft, hop_length=hop_length, win_length=win_length)
    if power is None:
        return jnp.stack([spec.real, spec.imag], axis=-3)
    mag = jnp.abs(spec)
    if power == 1.0:
        return mag
    return mag**power


def inverse_spectrogram(
    spec: jax.Array,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int | None = None,
    length: int | None = None,
) -> jax.Array:
    """A2SB ``InverseComplexSpectrogram``: 2-channel real view → waveform
    (reference: A2SB/audio_transforms/transforms.py:163-184)."""
    cplx = jax.lax.complex(spec[..., 0, :, :], spec[..., 1, :, :])
    return istft(cplx, n_fft=n_fft, hop_length=hop_length, win_length=win_length, length=length)
