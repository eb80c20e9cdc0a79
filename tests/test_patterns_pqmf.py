"""Codebook patterns + PQMF filterbank."""

import numpy as np
import jax.numpy as jnp

from audio_intelligence_tpu.models.ualm.interleave import (
    parallel_pattern,
    parallel_unpattern,
    unrolled_pattern,
    unrolled_unpattern,
    coarse_first_pattern,
    coarse_first_unpattern,
)
from audio_intelligence_tpu.models.etta.pqmf import pqmf_analysis, pqmf_synthesis


def test_parallel_pattern_identity():
    codes = np.arange(24).reshape(1, 6, 4)
    np.testing.assert_array_equal(parallel_unpattern(parallel_pattern(codes)), codes)


def test_unrolled_pattern_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 100, (2, 5, 3))
    pads = [900, 901, 902]
    rolled = unrolled_pattern(codes, pads)
    assert rolled.shape == (2, 15, 3)
    # step 0 carries stream 0 frame 0; step 1 carries stream 1 frame 0
    assert rolled[0, 0, 0] == codes[0, 0, 0] and rolled[0, 0, 1] == 901
    assert rolled[0, 1, 1] == codes[0, 0, 1]
    np.testing.assert_array_equal(unrolled_unpattern(rolled, 3), codes)


def test_coarse_first_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 100, (1, 4, 3))
    pads = [900, 901, 902]
    rolled = coarse_first_pattern(codes, pads)
    assert rolled.shape == (1, 8, 3)
    np.testing.assert_array_equal(rolled[0, :4, 0], codes[0, :, 0])
    assert (rolled[0, 4:, 0] == 900).all()
    np.testing.assert_array_equal(coarse_first_unpattern(rolled, 3), codes)


def test_pqmf_near_perfect_reconstruction():
    sr, n_band = 16000, 4
    t = np.arange(sr // 2) / sr
    wav = (
        0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 3000 * t)
    ).astype(np.float32)
    x = jnp.asarray(wav)[None, :, None]
    sub = pqmf_analysis(x, n_band=n_band)
    assert sub.shape[1] in (x.shape[1] // n_band, x.shape[1] // n_band + 1)
    rec = np.asarray(pqmf_synthesis(sub, n_band=n_band))[0, :, 0]
    # align (filterbank group delay) and compare interior
    best = (1e9, 0)
    a = wav[800:-800]
    for d in range(-600, 600):
        lo = 800 + d
        if lo < 0 or lo + len(a) > len(rec):
            continue
        err = float(np.mean((a - rec[lo : lo + len(a)]) ** 2))
        if err < best[0]:
            best = (err, d)
    snr = 10 * np.log10(np.mean(a**2) / max(best[0], 1e-12))
    assert snr > 40, f"PQMF reconstruction SNR too low: {snr:.1f} dB (delay {best[1]})"
