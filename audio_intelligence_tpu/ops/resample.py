"""Polyphase sinc resampling as a single strided convolution.

Matches ``torchaudio.functional.resample`` (sinc_interp_hann default):
reduce by gcd, build a windowed-sinc kernel bank [L, width], then one
``conv_general_dilated`` with lhs_dilation=L, stride=M — which XLA lowers to
an MXU-friendly batched matmul. No Python loops over output samples.

Reference use: A2SB loads with librosa resample
(A2SB/datasets/datasets.py:144-165) and UALM uses soxr
(tarball_reader.py:329-334); this op is the shared TPU-side equivalent.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _resample_kernel_np(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int,
    rolloff: float,
    beta: float | None,
    window: str,
) -> tuple[np.ndarray, int]:
    """Kernel bank [new_freq, 1, width] and kernel width, after gcd reduction."""
    base_freq = min(orig_freq, new_freq) * rolloff
    width = int(np.ceil(lowpass_filter_width * orig_freq / base_freq))
    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None] / orig_freq

    t = (-np.arange(new_freq, dtype=np.float64)[:, None] / new_freq + idx) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    if window == "hann":
        win = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    else:  # kaiser
        if beta is None:
            beta = 14.769656459379492
        win = np.i0(beta * np.sqrt(1 - (t / lowpass_filter_width) ** 2)) / np.i0(beta)

    t *= np.pi
    scale = base_freq / orig_freq
    with np.errstate(invalid="ignore", divide="ignore"):
        kernels = np.where(t == 0, 1.0, np.sin(t) / t) * win * scale
    return kernels.astype(np.float32), width


def resample(
    x: jax.Array,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
    beta: float | None = None,
    window: str = "hann",
) -> jax.Array:
    """Resample ``x [..., T]`` from orig_freq to new_freq.

    Matches torchaudio.functional.resample numerics (sinc_interp_hann).
    """
    if orig_freq == new_freq:
        return x
    gcd = math.gcd(int(orig_freq), int(new_freq))
    orig_freq, new_freq = int(orig_freq) // gcd, int(new_freq) // gcd

    kernels, width = _resample_kernel_np(
        orig_freq, new_freq, lowpass_filter_width, rolloff, beta, window
    )
    kernel = jnp.asarray(kernels)[:, None, :]  # [L=new_freq, 1, kw]

    batch_shape = x.shape[:-1]
    t = x.shape[-1]
    xf = x.reshape((-1, 1, t))
    xf = jnp.pad(xf, ((0, 0), (0, 0), (width, width + orig_freq)))
    # Grouped conv with stride orig_freq producing new_freq phases per step.
    out = jax.lax.conv_general_dilated(
        xf,
        kernel,
        window_strides=(orig_freq,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # [B, new_freq, T//orig_freq(+1)]
    out = jnp.swapaxes(out, -1, -2).reshape(xf.shape[0], -1)
    target_length = int(math.ceil(new_freq * t / orig_freq))
    out = out[:, :target_length]
    return out.reshape(batch_shape + (target_length,))
