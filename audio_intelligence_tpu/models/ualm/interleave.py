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


# -- other codebook pattern providers (ETTA codebook_patterns.py:21-560) --


def parallel_pattern(codes) -> np.ndarray:
    """ParallelPatternProvider (:358): all streams emitted simultaneously."""
    return np.asarray(codes)


def parallel_unpattern(codes) -> np.ndarray:
    return np.asarray(codes)


def unrolled_pattern(codes, stream_pad_ids) -> np.ndarray:
    """UnrolledPatternProvider (:371): streams flattened time-major —
    [B, T, N] → [B, T·N, N] where step t·N+s carries stream s's frame t in
    its own column (other columns padded)."""
    codes = np.asarray(codes)
    b, t, n = codes.shape
    pads = np.asarray(stream_pad_ids, dtype=codes.dtype)
    out = np.tile(pads.reshape(1, 1, n), (b, t * n, 1))
    for s in range(n):
        out[:, s::n, s] = codes[:, :, s]
    return out


def unrolled_unpattern(codes, n_streams: int) -> np.ndarray:
    """Inverse of unrolled_pattern: [B, T·N, N] → [B, T, N]."""
    codes = np.asarray(codes)
    outs = [codes[:, s::n_streams, s] for s in range(n_streams)]
    return np.stack(outs, axis=-1)


def coarse_first_pattern(codes, stream_pad_ids, delay: int | None = None) -> np.ndarray:
    """CoarseFirstPattern (:492): stream 0 (the coarse codebook) is
    emitted for all T frames first; remaining streams follow delayed after
    the full coarse pass."""
    codes = np.asarray(codes)
    b, t, n = codes.shape
    pads = np.asarray(stream_pad_ids, dtype=codes.dtype)
    total = t + t  # coarse pass then the rest aligned after it
    out = np.tile(pads.reshape(1, 1, n), (b, total, 1))
    out[:, :t, 0] = codes[:, :, 0]
    for s in range(1, n):
        out[:, t : t + t, s] = codes[:, :, s]
    return out


def coarse_first_unpattern(codes, n_streams: int) -> np.ndarray:
    codes = np.asarray(codes)
    t = codes.shape[1] // 2
    outs = [codes[:, :t, 0]] + [codes[:, t : 2 * t, s] for s in range(1, n_streams)]
    return np.stack(outs, axis=-1)


def musiclm_pattern(codes, stream_pad_ids, group_by: int = 2) -> np.ndarray:
    """MusicLMPattern (ETTA codebook_patterns.py:529-545): full flattening
    in grouped order — for each group of ``group_by`` codebooks, all T
    frames are emitted (one coordinate per step) before the next group.
    [B, T, N] → [B, T·N, N]; step g·(T·G) + t·G + j carries stream
    (g·G + j)'s frame t in its own column, others padded."""
    codes = np.asarray(codes)
    b, t, n = codes.shape
    assert n % group_by == 0, "n_streams must divide into groups"
    pads = np.asarray(stream_pad_ids, dtype=codes.dtype)
    out = np.tile(pads.reshape(1, 1, n), (b, t * n, 1))
    for g in range(n // group_by):
        base = g * t * group_by
        for j in range(group_by):
            q = g * group_by + j
            out[:, base + j : base + t * group_by : group_by, q] = codes[:, :, q]
    return out


def musiclm_unpattern(codes, n_streams: int, group_by: int = 2) -> np.ndarray:
    """Inverse of musiclm_pattern: [B, T·N, N] → [B, T, N]."""
    codes = np.asarray(codes)
    t = codes.shape[1] // n_streams
    outs = []
    for q in range(n_streams):
        g, j = q // group_by, q % group_by
        base = g * t * group_by
        outs.append(codes[:, base + j : base + t * group_by : group_by, q])
    return np.stack(outs, axis=-1)
