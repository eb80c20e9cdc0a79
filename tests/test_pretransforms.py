"""Pretransforms: scale adapter, PQMF, wavelet roundtrips."""

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
    pre = WaveletPretransform(levels=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 2)), jnp.float32)
    z = pre.encode(x)
    assert z.shape == (2, 16, 8)
    back = pre.decode(z)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)
    # energy preservation (orthogonal transform)
    np.testing.assert_allclose(
        float(jnp.sum(z**2)), float(jnp.sum(x**2)), rtol=1e-5
    )


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
