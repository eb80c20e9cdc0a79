"""Magnitude / instantaneous-phase spectrogram codecs.

The A2SB restoration stack operates on 3-channel (mag, cosθ, sinθ)
spectrograms; these ops mirror the semantics of
A2SB/audio_transforms/transforms.py (ComplexToMagInstPhase:108,
MagInstPhaseToComplex:121, SVDFixMagInstPhase:135-160,
PowerScaleSpectrogram:187, SpectrogramDrop/AddDCTerm:214-228) as
pure-functional, batched, jit-safe JAX.

Channel layout everywhere: ``[..., C, F, T]`` with C leading like the
reference (C=2 complex-as-real, C=3 mag/cos/sin).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def complex_to_mag_inst_phase(spec2: jax.Array) -> jax.Array:
    """[..., 2, F, T] (re, im) → [..., 3, F, T] (mag, cosθ, sinθ)."""
    re = spec2[..., 0:1, :, :]
    im = spec2[..., 1:2, :, :]
    mag = jnp.sqrt(re**2 + im**2)
    phase = jnp.arctan2(im, re)
    return jnp.concatenate([mag, jnp.cos(phase), jnp.sin(phase)], axis=-3)


def mag_inst_phase_to_complex(msp: jax.Array) -> jax.Array:
    """[..., 3, F, T] (mag, cosθ, sinθ) → [..., 2, F, T] (re, im)."""
    mag = msp[..., 0:1, :, :]
    cos_t = msp[..., 1:2, :, :]
    sin_t = msp[..., 2:3, :, :]
    return jnp.concatenate([mag * cos_t, mag * sin_t], axis=-3)


def svd_fix_mag_inst_phase(msp: jax.Array) -> jax.Array:
    """Project predicted (cosθ, sinθ) back onto SO(2) per (band, frame).

    The reference builds the 2×2 rotation [[c, -s], [s, c]] per bin, takes an
    SVD, and snaps singular values to (1, det(U·Vᵀ))
    (A2SB/audio_transforms/transforms.py:135-160). For the 2×2
    rotation-structured case the polar projection has a closed form:
    normalize the (cos, sin) vector — U diag(1, det) Vᵀ of [[c,-s],[s,c]]
    is exactly [[c,-s],[s,c]]/√(c²+s²). We use the closed form: identical
    result, no batched SVD on TPU.
    """
    mag = msp[..., 0:1, :, :]
    cos_t = msp[..., 1:2, :, :]
    sin_t = msp[..., 2:3, :, :]
    norm = jnp.sqrt(cos_t**2 + sin_t**2)
    safe = jnp.maximum(norm, 1e-12)
    # Degenerate (0,0) phase → snap to angle 0 like SVD of the zero-ish
    # matrix would be arbitrary; choose cos=1, sin=0 deterministically.
    cos_f = jnp.where(norm < 1e-12, 1.0, cos_t / safe)
    sin_f = jnp.where(norm < 1e-12, 0.0, sin_t / safe)
    return jnp.concatenate([mag, cos_f, sin_f], axis=-3)


def power_scale_spectrogram(
    spec: jax.Array,
    power: float = 0.5,
    channels: tuple[int, ...] | None = None,
    eps: float = 1e-9,
) -> jax.Array:
    """|x|^power compression preserving sign, per channel.

    Matches A2SB ``PowerScaleSpectrogram`` (transforms.py:187-211): scale =
    |x|^p / (|x| + eps); forward uses p=0.25 on channel 0 (magnitude),
    inverse uses p=4.
    """
    spec_abs = jnp.abs(spec)
    scale = spec_abs**power / (spec_abs + eps)
    if channels is None:
        return spec * scale
    ch = jnp.zeros(spec.shape[-3], dtype=bool).at[jnp.asarray(channels)].set(True)
    ch = ch[:, None, None]
    return jnp.where(ch, spec * scale, spec)


def drop_dc_term(spec: jax.Array) -> jax.Array:
    """Drop the first FFT band: [..., F, T] → [..., F-1, T]."""
    return spec[..., 1:, :]


def add_dc_term(spec: jax.Array) -> jax.Array:
    """Restore a zero DC band: [..., F-1, T] → [..., F, T]."""
    dc = jnp.zeros_like(spec[..., :1, :])
    return jnp.concatenate([dc, spec], axis=-2)


def radian_to_so2(phase: jax.Array) -> jax.Array:
    """Angle [..., F, T] → stacked rotation channels [..., 2, F, T] (cos, sin).

    Mirrors A2SB/audio_utils.py:15-27 rotation-matrix phase helpers.
    """
    return jnp.stack([jnp.cos(phase), jnp.sin(phase)], axis=-3)
