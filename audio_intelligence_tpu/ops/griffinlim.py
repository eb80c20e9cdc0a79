"""Phase-initialized momentum Griffin-Lim as a ``lax.scan`` loop.

Mirrors A2SB's modified torchaudio griffinlim
(A2SB/audio_transforms/transforms.py:273-374): magnitude + optional initial
(cosθ, sinθ) phase estimate, fast-GL momentum update. The whole n_iter loop
stays on device — one compiled scan, no per-iteration host sync.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from audio_intelligence_tpu.ops.stft import stft, istft


def griffin_lim(
    specgram: jax.Array,
    init_phase_cos: jax.Array | None = None,
    init_phase_sin: jax.Array | None = None,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int | None = None,
    power: float = 1.0,
    n_iter: int = 32,
    momentum: float = 0.99,
    length: int | None = None,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Reconstruct a waveform from a magnitude spectrogram ``[..., F, T]``.

    If ``init_phase_cos/sin`` are given, phase starts from them (A2SB's
    MagInstPhaseToGriffinLim path); otherwise random (needs ``rng``) or
    zero-phase init.
    """
    if not 0 <= momentum < 1:
        raise ValueError(f"momentum must be in [0, 1), got {momentum}")
    momentum = momentum / (1 + momentum)

    mag = specgram ** (1.0 / power)

    if init_phase_cos is not None:
        angles = jax.lax.complex(init_phase_cos, init_phase_sin)
    elif rng is not None:
        re, im = jax.random.uniform(rng, (2,) + mag.shape, dtype=mag.dtype)
        angles = jax.lax.complex(re, im)
    else:
        angles = jnp.ones_like(mag, dtype=jnp.complex64)
    angles = angles.astype(jnp.complex64)

    def step(carry, _):
        angles, tprev = carry
        inverse = istft(
            mag * angles, n_fft=n_fft, hop_length=hop_length,
            win_length=win_length, length=length,
        )
        rebuilt = stft(inverse, n_fft=n_fft, hop_length=hop_length, win_length=win_length)
        new = rebuilt - tprev * momentum
        new = new / (jnp.abs(new) + 1e-16)
        return (new, rebuilt), None

    (angles, _), _ = jax.lax.scan(step, (angles, jnp.zeros_like(angles)), None, length=n_iter)

    return istft(
        mag * angles, n_fft=n_fft, hop_length=hop_length,
        win_length=win_length, length=length,
    )
