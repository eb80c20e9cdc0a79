"""UALM audio IO: RVQ codec, discrete/continuous IO, whisper tower."""

import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.ualm.codec import RVQCodec, ResidualVQ
from audio_intelligence_tpu.models.ualm.audio_io import DiscreteAudioIO, ContinuousAudioIO
from audio_intelligence_tpu.models.ualm.whisper_tower import (
    WhisperTower,
    WhisperTowerConfig,
    feat_extract_output_length,
)


def tiny_codec():
    return RVQCodec(
        num_quantizers=4, codebook_size=16, latent_dim=8, channels=4,
        c_mults=(2, 4), strides=(4, 5), sample_rate=16000,
    )


def test_rvq_quantize_roundtrip():
    rvq = ResidualVQ(num_quantizers=4, codebook_size=16, dim=8)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 6, 8)), jnp.float32)
    variables = rvq.init(jax.random.PRNGKey(0), x)
    zq, codes, aux = rvq.apply(variables, x)
    assert zq.shape == x.shape and codes.shape == (2, 6, 4)
    assert float(aux["commit_loss"]) >= 0
    # lookup(codes) == the quantized value (pre-straight-through)
    looked = rvq.apply(variables, codes, method=ResidualVQ.lookup)
    # residual quantization: lookup equals sum of picked codebook vectors
    assert looked.shape == x.shape
    # straight-through: gradient of sum(zq) wrt x is ones
    g = jax.grad(lambda x: float(0) + rvq.apply(variables, x)[0].sum())(x)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-5)


def test_codec_encode_decode_shapes():
    codec = tiny_codec()
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((2, 200)) * 0.1, jnp.float32)
    variables = codec.init(jax.random.PRNGKey(0), wav)
    recon, codes, aux = codec.apply(variables, wav)
    assert recon.shape == wav.shape
    assert codes.shape == (2, 10, 4)  # 200 / (4·5)
    dec = codec.apply(variables, codes, method=RVQCodec.decode)
    assert dec.shape == wav.shape
    codes2 = codec.apply(variables, wav, method=RVQCodec.encode)
    np.testing.assert_array_equal(np.asarray(codes2), np.asarray(codes))


def test_discrete_io_contract_and_interleave():
    codec = tiny_codec()
    wav0 = jnp.zeros((1, 200))
    variables = codec.init(jax.random.PRNGKey(0), wav0)
    io = DiscreteAudioIO(
        codec=codec, codec_variables=variables, n_streams=4, codebook_size=16,
        sample_rate=16000, frame_shift=20,
    )
    assert io.num_stream() == 4
    assert len(io.get_vocabulary()) == 4 * 17
    assert io.get_stream_interval() == [(0, 17), (17, 34), (34, 51), (51, 68)]

    wav = np.random.default_rng(0).standard_normal((1, 200)).astype(np.float32) * 0.1
    seq, conti, mask = io.preprocess((wav, 16000))
    frames = 200 // 20 + 3  # + n_streams - 1 (delay interleave)
    assert seq.shape == (frames, 4)
    assert (seq == 0).all()
    length, feat = conti
    assert length == frames and feat.shape == (200, 1)

    codes = io.encode_batch(jnp.asarray(feat)[None], jnp.asarray([200]))
    assert codes.shape == (1, frames, 4)
    c = np.asarray(codes)
    # every stream's tokens live inside its interval
    for s, (lo, hi) in enumerate(io.get_stream_interval()):
        assert ((c[:, :, s] >= lo) & (c[:, :, s] < hi)).all()
    # delay structure: stream 1's first slot is its pad (interval start)
    assert c[0, 0, 1] == 17 and c[0, 0, 3] == 51

    wav_out, out_len, sr = io.decode_batch(codes, np.asarray([frames]))
    assert sr == 16000
    assert np.asarray(wav_out).shape[-1] == 200

    worker = io.copy_for_worker()
    assert worker.codec is None and worker.num_stream() == 4


def test_whisper_tower_shapes_and_mask():
    cfg = WhisperTowerConfig.tiny()
    tower = WhisperTower(cfg)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, cfg.n_mels, 32)), jnp.float32)
    variables = tower.init(jax.random.PRNGKey(0), mel)
    out = tower.apply(variables, mel)
    assert out.shape == (2, feat_extract_output_length(32), cfg.d_model)
    mask = jnp.ones((2, 32), bool).at[1, 16:].set(False)
    out2 = tower.apply(variables, mel, mask)
    assert out2.shape == out.shape
    assert np.isfinite(np.asarray(out2)).all()


def test_continuous_io():
    cfg = WhisperTowerConfig.tiny()
    tower = WhisperTower(cfg)
    mel0 = jnp.zeros((1, cfg.n_mels, 32))
    variables = tower.init(jax.random.PRNGKey(0), mel0)
    io = ContinuousAudioIO(tower=tower, tower_variables=variables, cfg=cfg)
    assert io.feature_dim() == cfg.d_model

    wav = np.random.default_rng(0).standard_normal(16000).astype(np.float32) * 0.1
    seq, (length, mel), mask = io.preprocess((wav, 16000))
    assert seq.shape == (length, 1) and (mask == 0).all()
    assert length == io.find_length((wav, 16000))

    feats = io.encode_batch(jnp.asarray(mel)[None], jnp.asarray([mel.shape[0]]))
    assert feats.shape[0] == 1 and feats.shape[2] == cfg.d_model
    assert feats.shape[1] >= length


def test_discrete_audio_io_ssl_branch():
    """SSL kmeans stream concatenates before codec streams (audio.py:257-296)."""
    import jax
    import jax.numpy as jnp
    from audio_intelligence_tpu.models.ualm.audio_io import (
        DiscreteAudioIO,
        KmeansQuantizer,
        mel_ssl_features,
    )
    from audio_intelligence_tpu.models.ualm.codec import RVQCodec

    rng = np.random.default_rng(0)
    km = KmeansQuantizer(rng.standard_normal((16, 80)).astype(np.float32))
    codec = RVQCodec(
        num_quantizers=2, codebook_size=8, latent_dim=8, channels=4,
        c_mults=(2, 4), strides=(4, 5), sample_rate=16000,
    )  # frame_shift = 4*5 = 20
    wav = jnp.asarray(rng.standard_normal((2, 400)), jnp.float32)
    cvars = codec.init(jax.random.PRNGKey(0), wav)  # full init (enc+dec)
    io = DiscreteAudioIO(
        codec=codec, codec_variables=cvars, n_streams=2, codebook_size=8,
        frame_shift=20, ssl_quantizer=km, use_delay_interleave=False,
    )
    assert io.num_stream() == 3  # 1 SSL + 2 codec
    ivs = io.get_stream_interval()
    assert ivs[0] == (0, 17)  # ssl pad + 16 clusters
    assert len(io.get_vocabulary()) == ivs[-1][1]
    codes = io.encode_batch(wav[..., None], jnp.asarray([400, 200]))
    assert codes.shape == (2, 20, 3)
    # SSL ids live inside the SSL interval (or its pad at masked frames)
    ssl = np.asarray(codes[..., 0])
    assert ssl.min() >= 0 and ssl.max() < 17
    # ids match direct quantization on valid frames (+offset(0)+1)
    feats = mel_ssl_features(wav, 20)
    direct = np.asarray(km(feats))
    np.testing.assert_array_equal(ssl[0], direct[0, :20] + 1)
    # decode ignores the SSL stream but still reconstructs
    out, _, sr = io.decode_batch(codes)
    assert out.shape[-1] == 400 and sr == 16000
    # worker copy keeps the vocab layout
    w = io.copy_for_worker()
    assert w.num_stream() == 3 and w.get_stream_interval() == ivs
