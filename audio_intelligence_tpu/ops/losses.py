"""Spectral reconstruction losses (auraloss-equivalent, pure JAX).

Mirrors the vendored auraloss subset the reference trains its VAE with
(ETTA/stable_audio_tools/training/losses/auraloss.py): spectral convergence
+ log/linear STFT magnitude, multi-resolution, stereo sum-and-difference,
and the 101-tap A-weighting FIR pre-filter (perceptual_weighting). The ETTA
VAE flagship config uses 7 resolutions with perceptual weighting
(etta_vae.json loss_configs.spectral).

All losses are batched pure functions of (input, target) waveforms and are
differentiable end-to-end; the FIR prefilter is one grouped conv, each
resolution one rfft — everything fuses under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audio_intelligence_tpu.ops.stft import stft


@functools.lru_cache(maxsize=8)
def _a_weighting_fir_np(fs: int = 44100, ntaps: int = 101) -> np.ndarray:
    """101-tap linear-phase FIR fit of the IEC 1672 A-weighting curve.

    Same design pipeline as auraloss FIRFilter('aw'): analog A-weighting →
    bilinear transform → least-squares FIR fit of |H|.
    """
    import scipy.signal

    f1, f2, f3, f4 = 20.598997, 107.65265, 737.86223, 12194.217
    a1000 = 1.9997
    nums = [(2 * np.pi * f4) ** 2 * (10 ** (a1000 / 20)), 0, 0, 0, 0]
    dens = np.polymul(
        [1, 4 * np.pi * f4, (2 * np.pi * f4) ** 2],
        [1, 4 * np.pi * f1, (2 * np.pi * f1) ** 2],
    )
    dens = np.polymul(np.polymul(dens, [1, 2 * np.pi * f3]), [1, 2 * np.pi * f2])
    b, a = scipy.signal.bilinear(nums, dens, fs=fs)
    w_iir, h_iir = scipy.signal.freqz(b, a, worN=512, fs=fs)
    taps = scipy.signal.firls(ntaps, w_iir, abs(h_iir), fs=fs)
    return taps.astype(np.float32)


def a_weighting_prefilter(x: jax.Array, fs: int = 44100, ntaps: int = 101) -> jax.Array:
    """Apply the A-weighting FIR to ``x [..., T]`` ('same' padding)."""
    taps = jnp.asarray(_a_weighting_fir_np(fs, ntaps))[None, None, :]
    shape = x.shape
    xf = x.reshape((-1, 1, shape[-1]))
    out = jax.lax.conv_general_dilated(
        xf, taps, window_strides=(1,), padding=[(ntaps // 2, ntaps // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out.reshape(shape)


def _stft_mag(x: jax.Array, fft_size: int, hop_size: int, win_length: int, eps: float) -> jax.Array:
    spec = stft(x, n_fft=fft_size, hop_length=hop_size, win_length=win_length)
    return jnp.sqrt(jnp.maximum(spec.real**2 + spec.imag**2, eps))


def spectral_convergence_loss(x_mag: jax.Array, y_mag: jax.Array) -> jax.Array:
    """‖y − x‖_F / ‖y‖_F, averaged over the batch."""
    num = jnp.sqrt(jnp.sum((y_mag - x_mag) ** 2, axis=(-2, -1)))
    den = jnp.sqrt(jnp.sum(y_mag**2, axis=(-2, -1)))
    return jnp.mean(num / den)


def stft_magnitude_loss(
    x_mag: jax.Array, y_mag: jax.Array, log: bool = True,
    log_eps: float = 0.0, log_fac: float = 1.0, distance: str = "L1",
) -> jax.Array:
    if log:
        x_mag = jnp.log(log_fac * x_mag + log_eps)
        y_mag = jnp.log(log_fac * y_mag + log_eps)
    if distance == "L1":
        return jnp.mean(jnp.abs(x_mag - y_mag))
    return jnp.mean((x_mag - y_mag) ** 2)


def stft_loss(
    x: jax.Array,
    y: jax.Array,
    fft_size: int = 1024,
    hop_size: int = 256,
    win_length: int = 1024,
    w_sc: float = 1.0,
    w_log_mag: float = 1.0,
    w_lin_mag: float = 0.0,
    perceptual_weighting: bool = False,
    sample_rate: int | None = None,
    scale_invariance: bool = False,
    eps: float = 1e-8,
) -> jax.Array:
    """Single-resolution STFT loss over waveforms ``[..., T]`` (channels folded
    into batch, like auraloss STFTLoss.forward)."""
    if perceptual_weighting:
        assert sample_rate is not None
        x = a_weighting_prefilter(x, fs=sample_rate)
        y = a_weighting_prefilter(y, fs=sample_rate)

    x_mag = _stft_mag(x.reshape((-1, x.shape[-1])), fft_size, hop_size, win_length, eps)
    y_mag = _stft_mag(y.reshape((-1, y.shape[-1])), fft_size, hop_size, win_length, eps)

    if scale_invariance:
        alpha = jnp.sum(x_mag * y_mag, axis=(-2, -1)) / jnp.sum(y_mag**2, axis=(-2, -1))
        y_mag = y_mag * alpha[..., None, None]

    loss = 0.0
    if w_sc:
        loss += w_sc * spectral_convergence_loss(x_mag, y_mag)
    if w_log_mag:
        loss += w_log_mag * stft_magnitude_loss(x_mag, y_mag, log=True)
    if w_lin_mag:
        loss += w_lin_mag * stft_magnitude_loss(x_mag, y_mag, log=False)
    return loss


def multi_resolution_stft_loss(
    x: jax.Array,
    y: jax.Array,
    fft_sizes: tuple[int, ...] = (2048, 1024, 512, 256, 128, 64, 32),
    hop_sizes: tuple[int, ...] = (512, 256, 128, 64, 32, 16, 8),
    win_lengths: tuple[int, ...] = (2048, 1024, 512, 256, 128, 64, 32),
    **kwargs,
) -> jax.Array:
    """MR-STFT loss; defaults are the ETTA-VAE 7-resolution config."""
    losses = [
        stft_loss(x, y, fft_size=f, hop_size=h, win_length=w, **kwargs)
        for f, h, w in zip(fft_sizes, hop_sizes, win_lengths)
    ]
    return sum(losses) / len(losses)


def sum_and_difference_stft_loss(
    x: jax.Array,
    y: jax.Array,
    w_sum: float = 1.0,
    w_diff: float = 1.0,
    **kwargs,
) -> jax.Array:
    """Stereo mid/side MR-STFT loss over ``[..., 2, T]`` waveforms.

    Matches auraloss SumAndDifferenceSTFTLoss (x_sum = L+R, x_diff = L−R).
    """
    x_sum, x_diff = x[..., 0, :] + x[..., 1, :], x[..., 0, :] - x[..., 1, :]
    y_sum, y_diff = y[..., 0, :] + y[..., 1, :], y[..., 0, :] - y[..., 1, :]
    sum_loss = multi_resolution_stft_loss(x_sum, y_sum, **kwargs)
    diff_loss = multi_resolution_stft_loss(x_diff, y_diff, **kwargs)
    return (w_sum * sum_loss + w_diff * diff_loss) / 2.0


def masked_mse(pred: jax.Array, target: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """A2SB bridge loss: ``sum((pred−target)² · mask) / sum(mask)``.

    Matches A2SB/A2SB_lightning_module.py:386-388 exactly, including the
    broadcast quirk: the mask broadcasts over channels in the product but its
    own (unbroadcast) sum is the denominator.
    """
    sq = (pred - target) ** 2
    if mask is None:
        return jnp.mean(sq)
    return jnp.sum(sq * mask) / jnp.maximum(jnp.sum(mask), 1e-8)
