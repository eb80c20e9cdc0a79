"""Delay interleaving for multi-stream codec tokens.

Mirrors UALM/models/ualm/multimodal_io/audio.py:758-808: stream n is
delayed by n frames; vacated positions take each stream's per-stream pad
id (the first id of that stream's vocab interval). Pure functions usable
on numpy (host data path) or jax arrays (decode loop).
"""

from __future__ import annotations

import numpy as np


def delay_interleave(codes, stream_pad_ids) -> np.ndarray:
    """[B, T, N] → [B, T+N−1, N]; stream n occupies rows n..n+T−1."""
    b, t, n = codes.shape
    xp = np
    out = xp.tile(
        np.asarray(stream_pad_ids, dtype=np.int64).reshape(1, 1, n),
        (b, t + n - 1, 1),
    )
    for i in range(n):
        out[:, i : i + t, i] = codes[:, :, i]
    return out


def delay_deinterleave(codes) -> np.ndarray:
    """[B, T, N] → [B, T−N+1, N] (inverse of delay_interleave)."""
    b, t, n = codes.shape
    t_orig = t - n + 1
    outs = [codes[:, i : i + t_orig, i] for i in range(n)]
    return np.stack(outs, axis=-1)
