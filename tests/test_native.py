"""Native data-loader extension vs reference numerics."""

import numpy as np
import pytest
import jax.numpy as jnp

from audio_intelligence_tpu.data import native
from audio_intelligence_tpu.ops.resample import resample as jax_resample


def test_native_built():
    """The extension should be built in-tree for this image."""
    assert native.HAVE_NATIVE, "run: cd native && python setup.py build_ext --inplace"


def test_decode_pcm16_matches_numpy():
    rng = np.random.default_rng(0)
    pcm = rng.integers(-32768, 32767, 1000, dtype=np.int16)
    raw = pcm.tobytes()
    out = native.decode_pcm16(raw, 2)
    assert out.shape == (2, 500)
    ref = (pcm.astype(np.float32) / 32768.0).reshape(-1, 2).T
    np.testing.assert_allclose(out, ref, atol=1e-7)


@pytest.mark.parametrize("orig,new", [(44100, 16000), (16000, 44100), (48000, 44100)])
def test_native_resample_matches_jax_op(orig, new):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, 8000)) * 0.3).astype(np.float32)
    ours = native.resample(x, orig, new)
    ref = np.asarray(jax_resample(jnp.asarray(x), orig, new))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_peak_normalize():
    x = np.asarray([[0.1, -0.5, 0.25]], np.float32)
    out = native.peak_normalize(x.copy(), peak=0.95)
    np.testing.assert_allclose(np.abs(out).max(), 0.95, rtol=1e-5)
