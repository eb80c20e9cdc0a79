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


def test_wav_prefetcher_matches_reader(tmp_path):
    """Native threaded prefetch: exact sample parity with the in-process
    reader, and strict submission order."""
    import wave

    from audio_intelligence_tpu.data.tarshard import (
        TarballAudioReader,
        create_tar_shards,
        prefetch_audio,
    )

    rng = np.random.default_rng(0)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    keys = []
    for i in range(7):
        pcm = (rng.standard_normal(1000 + 100 * i) * 8000).astype(np.int16)
        p = wav_dir / f"clip{i}.wav"
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        keys.append((f"clip{i}.wav", str(p)))

    out_dir = tmp_path / "shards"
    out_dir.mkdir()
    create_tar_shards(keys, str(out_dir), shard_size=3)
    reader = TarballAudioReader(str(out_dir / "shard.sqlite"), str(out_dir))

    want_keys = [k for k, _ in keys]
    got = list(prefetch_audio(reader, want_keys, workers=3, depth=2))
    assert [k for k, _, _ in got] == want_keys  # order preserved
    for k, audio, sr in got:
        ref, ref_sr = reader.read(k)
        assert sr == ref_sr
        np.testing.assert_allclose(audio, ref, atol=1e-7)
