"""Pretransforms: scale adapter, PQMF, wavelet roundtrips."""

import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.etta.pretransforms import (
    AutoencoderPretransform,
    PQMFPretransform,
    WaveletPretransform,
)


def test_autoencoder_pretransform_scale():
    pre = AutoencoderPretransform(
        encode_fn=lambda x: x * 10.0, decode_fn=lambda z: z / 10.0, scale=2.0,
    )
    x = jnp.ones((1, 4, 2))
    z = pre.encode(x)
    np.testing.assert_allclose(np.asarray(z), 5.0)
    np.testing.assert_allclose(np.asarray(pre.decode(z)), 1.0)


def test_wavelet_roundtrip():
    """bior4.4 Mallat DWT (low-band-only recursion): exact reconstruction
    at several depths — the transform is BIorthogonal, so energy is NOT
    preserved (that would indicate a wrong, orthogonal filter pair)."""
    for levels in (1, 2, 3):
        pre = WaveletPretransform(levels=levels, channels=2)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 64, 2)), jnp.float32)
        z = pre.encode(x)
        assert z.shape == (2, 64 // 2**levels, 2 * 2**levels)
        np.testing.assert_allclose(
            np.asarray(pre.decode(z)), np.asarray(x), atol=1e-5
        )


def test_wavelet_filter_bank_is_cdf97():
    """The bior4.4 bank must be pywt's: dec_lo/rec_lo are the CDF 9/7
    pair ×√2 and the hi filters carry pywt's odd-shift sign pattern
    (wavelets.py get_filter_bank:15-19)."""
    from audio_intelligence_tpu.models.etta.pretransforms import (
        wavelet_filter_bank,
    )

    dec_lo, dec_hi, rec_lo, rec_hi = wavelet_filter_bank("bior4.4")
    # lowpass sums = √2 (DC gain), highpass sums = 0 (vanishing moment)
    np.testing.assert_allclose(dec_lo.sum(), np.sqrt(2.0), atol=1e-9)
    np.testing.assert_allclose(rec_lo.sum(), np.sqrt(2.0), atol=1e-9)
    np.testing.assert_allclose(dec_hi.sum(), 0.0, atol=1e-9)
    np.testing.assert_allclose(rec_hi.sum(), 0.0, atol=1e-9)
    # the published pywt bior4.4 dec_lo center taps (×√2 of JPEG2000 9/7)
    np.testing.assert_allclose(dec_lo[5], 0.852698679, atol=1e-6)
    np.testing.assert_allclose(dec_lo[4], 0.377402855, atol=1e-6)
    np.testing.assert_allclose(rec_lo[5], 0.788485616, atol=1e-6)
    # low band of a constant signal is the √2-scaled constant, d band 0
    pre = WaveletPretransform(levels=1, channels=1)
    x = jnp.ones((1, 32, 1), jnp.float32)
    z = pre.encode(x)
    np.testing.assert_allclose(np.asarray(z[..., 0]), np.sqrt(2.0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(z[..., 1]), 0.0, atol=1e-5)


def test_wavelet_mallat_not_packet():
    """Only the LOW band recurses (Mallat), so the level-1 detail band
    passes through level 2 unchanged up to the reference's (c, l2, c2)
    time-fold — a wavelet-packet transform would re-filter it."""
    pre1 = WaveletPretransform(levels=1, channels=1)
    pre2 = WaveletPretransform(levels=2, channels=1)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 64, 1)), jnp.float32)
    z1 = np.asarray(pre1.encode(x))  # [1, 32, 2] = (s1, d1)
    z2 = np.asarray(pre2.encode(x))  # [1, 16, 4] = (s2, d2, d1 folded)
    d1 = z1[..., 1]
    folded = z2[0, :, 2:]  # [16, 2] — d1 with two time steps per row
    np.testing.assert_allclose(folded.reshape(-1), d1[0], atol=1e-6)


def test_pqmf_pretransform_stereo_roundtrip():
    pre = PQMFPretransform(n_band=4)
    sr = 8000
    t = np.arange(sr) / sr
    x = np.stack(
        [0.5 * np.sin(2 * np.pi * 300 * t), 0.3 * np.sin(2 * np.pi * 1200 * t)], -1
    ).astype(np.float32)[None]
    z = pre.encode(jnp.asarray(x))
    assert z.shape[2] == 8  # 2 channels × 4 bands
    back = np.asarray(pre.decode(z))
    # near-perfect reconstruction in the interior
    err = np.abs(back[0, 800:-800] - x[0, 800:-800]).max()
    assert err < 0.02, err
