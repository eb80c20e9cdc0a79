"""Rotary position embeddings (1-D sequence and 2-D axial 'pixel' modes).

Reproduces the semantics of the ``rotary_embedding_torch`` library as used
by the reference:

- A2SB's ``RotaryAttentionPool2d`` uses ``RotaryEmbedding(dim, freqs_for=
  'pixel', max_freq=64).get_axial_freqs(h, w)`` + interleaved-pair rotation
  (A2SB/networks.py:394-452).
- ETTA's transformer uses standard 1-D language-mode rotary with a
  configurable base (etta_transformer.py rope).

Frequencies are computed on host (static shapes) and applied as fused
elementwise ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _pixel_freqs_np(dim: int, max_freq: float) -> np.ndarray:
    """rotary_embedding_torch 'pixel' frequency bank: linspace(1, max_freq/2, dim//2)·π."""
    return (np.linspace(1.0, max_freq / 2, dim // 2) * np.pi).astype(np.float32)


@functools.lru_cache(maxsize=64)
def axial_pixel_freqs_np(h: int, w: int, dim: int, max_freq: float = 64.0) -> np.ndarray:
    """Axial rotary angle map [h, w, 2*dim] for 2-D pixel rotary.

    Per axis: positions linspace(-1, 1, n), angles = pos ⊗ freqs, each freq
    repeated ×2 (interleaved pairs), axes concatenated along the last dim —
    matching ``RotaryEmbedding.get_axial_freqs``.
    """
    freqs = _pixel_freqs_np(dim, max_freq)  # [dim//2]

    def axis_angles(n):
        pos = np.linspace(-1.0, 1.0, n, dtype=np.float32)
        ang = pos[:, None] * freqs[None, :]  # [n, dim//2]
        return np.repeat(ang, 2, axis=-1)  # [n, dim]

    ah = axis_angles(h)[:, None, :]  # [h, 1, dim]
    aw = axis_angles(w)[None, :, :]  # [1, w, dim]
    ah = np.broadcast_to(ah, (h, w, dim))
    aw = np.broadcast_to(aw, (h, w, dim))
    return np.concatenate([ah, aw], axis=-1)  # [h, w, 2*dim]


def rotate_half_interleaved(x: jax.Array) -> jax.Array:
    """(x0, x1, x2, x3, …) → (−x1, x0, −x3, x2, …) — interleaved-pair rotation."""
    x2 = x.reshape(x.shape[:-1] + (-1, 2))
    a, b = x2[..., 0], x2[..., 1]
    return jnp.stack([-b, a], axis=-1).reshape(x.shape)


def apply_rotary(x: jax.Array, angles: jax.Array) -> jax.Array:
    """Rotate the first ``angles.shape[-1]`` features of ``x [..., D]``.

    ``angles`` broadcasts against x's leading dims (e.g. [h, w, rot_dim]
    against [b, heads, h, w, D]); features past rot_dim pass through —
    matching ``rotary_embedding_torch.apply_rotary_emb``.
    """
    rot_dim = angles.shape[-1]
    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    x_rot = x_rot * jnp.cos(angles) + rotate_half_interleaved(x_rot) * jnp.sin(angles)
    return jnp.concatenate([x_rot, x_pass], axis=-1)


@functools.lru_cache(maxsize=64)
def rope_angles_np(seq_len: int, dim: int, base: float = 10000.0) -> np.ndarray:
    """Standard 1-D RoPE angle table [seq_len, dim] (language mode),
    inv_freq = base^(−2i/dim), each freq repeated ×2 for interleaved pairs."""
    inv_freq = 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    ang = np.arange(seq_len, dtype=np.float32)[:, None] * inv_freq[None, :]
    return np.repeat(ang, 2, axis=-1).astype(np.float32)


def apply_rope_1d(x: jax.Array, base: float = 10000.0, rot_dim: int | None = None) -> jax.Array:
    """Apply 1-D RoPE over ``x [..., seq, D]`` with static seq length."""
    rot_dim = rot_dim or x.shape[-1]
    angles = jnp.asarray(rope_angles_np(x.shape[-2], rot_dim, base))
    return apply_rotary(x, angles)
