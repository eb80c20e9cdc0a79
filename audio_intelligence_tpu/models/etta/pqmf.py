"""Pseudo-QMF polyphase filterbank (ETTA models/pqmf.py:13-396 parity).

M-band near-perfect-reconstruction analysis/synthesis with a Kaiser-
windowed prototype lowpass modulated by cosine banks — the classic MPEG
PQMF construction. Used by the reference as an alternative pretransform.

Analysis:  wav [B, T, 1]   → subbands [B, T/M, M]
Synthesis: subbands        → wav (near-perfect reconstruction)
Both are single strided convs → MXU matmuls.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


_DELAYS: dict = {}


def pqmf_delay(n_band: int = 4, attenuation: int = 100) -> int:
    """End-to-end analysis→synthesis group delay in samples, calibrated
    through the actual jax conv ops (padding geometry differs from the
    numpy gain-calibration mirror)."""
    key = ("jax", n_band, attenuation)
    if key not in _DELAYS:
        t_len = 4096
        tt = np.arange(t_len) / t_len
        x = np.sin(2 * np.pi * (5 + 0.4 * t_len * tt) * tt).astype(np.float32)
        rec = np.asarray(
            pqmf_synthesis(
                pqmf_analysis(jnp.asarray(x)[None, :, None], n_band, attenuation),
                n_band,
                attenuation,
            )
        )[0, :, 0]
        margin = 512
        a = x[margin : t_len - margin]
        best = (1e30, 0)
        for d in range(-margin, margin):
            lo = margin + d
            if lo < 0 or lo + len(a) > len(rec):
                continue
            err = float(np.mean((rec[lo : lo + len(a)] - a) ** 2))
            if err < best[0]:
                best = (err, d)
        _DELAYS[key] = int(best[1])
    return _DELAYS[key]


@functools.lru_cache(maxsize=8)
def _prototype(attenuation: int, n_band: int, taps_mult: int = 8):
    """Kaiser prototype lowpass via the standard cutoff optimization."""
    import scipy.optimize
    import scipy.signal

    def kaiser_filter(wc, atten, n_taps):
        beta = scipy.signal.kaiser_beta(atten)
        return scipy.signal.firwin(
            n_taps, wc / np.pi, window=("kaiser", beta), scale=False
        )

    n_taps = taps_mult * n_band * 2 + 1

    nfft = 4096

    def objective(wc):
        h = kaiser_filter(wc, attenuation, n_taps)
        # power complementarity across the band edge:
        # |P(ω)|² + |P(π/M − ω)|² ≈ 1 for ω ∈ [0, π/M]
        H = np.abs(np.fft.rfft(h, 2 * nfft))  # bins over [0, π], Δ = π/nfft
        edge = nfft // n_band  # index of π/M
        w_idx = np.arange(edge + 1)
        comp = H[w_idx] ** 2 + H[edge - w_idx] ** 2
        return float(np.max(np.abs(comp - 1.0)))

    wc = scipy.optimize.minimize_scalar(
        objective, bounds=(np.pi / (4 * n_band), np.pi / n_band), method="bounded"
    ).x
    return kaiser_filter(wc, attenuation, n_taps)


@functools.lru_cache(maxsize=8)
def pqmf_banks(n_band: int = 4, attenuation: int = 100):
    """(analysis [n_band, taps], synthesis [n_band, taps]) cosine banks.

    The synthesis bank is gain-calibrated numerically: an impulse pushed
    through analysis→synthesis must come back at unit amplitude (the
    closed-form 2·h modulation leaves a prototype-dependent gain)."""
    h = _prototype(attenuation, n_band)
    taps = len(h)
    k = np.arange(n_band)[:, None]
    n = np.arange(taps)[None, :]
    phase = (2 * k + 1) * (np.pi / (2 * n_band)) * (n - (taps - 1) / 2)
    analysis = 2 * h[None, :] * np.cos(phase + (-1) ** k * np.pi / 4)
    synthesis = 2 * h[None, :] * np.cos(phase - (-1) ** k * np.pi / 4)

    analysis = analysis.astype(np.float32)
    synthesis = synthesis.astype(np.float32)

    # numeric gain/delay calibration through the real conv pipeline: push a
    # broadband chirp through analysis→synthesis (gain 1 placeholder) and
    # least-squares the output amplitude at the best lag.
    t_len = max(16 * taps, 4096)
    tt = np.arange(t_len) / t_len
    x = np.sin(2 * np.pi * (5 + 0.4 * t_len * tt) * tt).astype(np.float32)
    sub = _apply_analysis_np(x, analysis, n_band)
    rec = _apply_synthesis_np(sub, synthesis, n_band)
    sl = slice(2 * taps, t_len - 2 * taps)
    best = (0.0, 0)
    for d in range(-2 * taps, 2 * taps):
        lo = sl.start + d
        if lo < 0 or lo + (sl.stop - sl.start) > len(rec):
            continue
        b = rec[lo : lo + (sl.stop - sl.start)]
        num = float(np.dot(b, x[sl]))
        den = float(np.dot(x[sl], x[sl]))
        if abs(num / den) > abs(best[0]):
            best = (num / den, d)
    gain = best[0] if best[0] != 0 else 1.0
    _DELAYS[(n_band, attenuation)] = int(best[1])
    return analysis, (synthesis / gain).astype(np.float32)


def _apply_analysis_np(x: np.ndarray, analysis: np.ndarray, n_band: int) -> np.ndarray:
    """numpy mirror of pqmf_analysis (strided correlation, SAME padding)."""
    taps = analysis.shape[1]
    pad = taps // 2
    xp = np.pad(x, (pad, pad))
    n_out = len(x) // n_band + (1 if len(x) % n_band else 0)
    out = np.zeros((n_out, n_band), np.float32)
    for o in range(n_out):
        start = o * n_band
        seg = xp[start : start + taps]
        if len(seg) < taps:
            seg = np.pad(seg, (0, taps - len(seg)))
        out[o] = analysis @ seg
    return out


def _apply_synthesis_np(sub: np.ndarray, synthesis: np.ndarray, n_band: int) -> np.ndarray:
    """numpy mirror of pqmf_synthesis (lhs-dilated correlation, gain n_band)."""
    taps = synthesis.shape[1]
    pad = taps // 2
    l = sub.shape[0]
    up = np.zeros((l * n_band,), np.float32)
    out = np.zeros((l * n_band,), np.float32)
    for b in range(n_band):
        up[:] = 0
        up[::n_band] = sub[:, b]
        upp = np.pad(up, (pad, pad))
        for o in range(l * n_band):
            out[o] += float(synthesis[b] @ upp[o : o + taps]) * n_band
    return out


def pqmf_analysis(x: jax.Array, n_band: int = 4, attenuation: int = 100) -> jax.Array:
    """wav [B, T, 1] → subbands [B, T/n_band, n_band]."""
    analysis, _ = pqmf_banks(n_band, attenuation)
    taps = analysis.shape[1]
    kernel = jnp.asarray(analysis.T)[:, None, :]  # [taps, 1, n_band]
    pad = taps // 2
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(n_band,), padding=[(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def pqmf_synthesis(subbands: jax.Array, n_band: int = 4, attenuation: int = 100) -> jax.Array:
    """subbands [B, L, n_band] → wav [B, L·n_band, 1]."""
    _, synthesis = pqmf_banks(n_band, attenuation)
    taps = synthesis.shape[1]
    # upsample each band by n_band (zero-stuffing) then filter and sum;
    # right-pad so the output is exactly L·n_band samples
    kernel = jnp.asarray(synthesis.T)[:, :, None] * n_band  # [taps, n_band, 1]
    pad = taps // 2
    return jax.lax.conv_general_dilated(
        subbands, kernel, window_strides=(1,),
        padding=[(pad, pad + n_band - 1)], lhs_dilation=(n_band,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
