"""XEUS SSL tower — structural gates (espnet2 absent in-image: the
numeric parity is gated on a real checkpoint; see PARITY.md).

Reference: UALM/models/ualm/multimodal_io/audio.py:257-296 (SSL branch
loading espnet/xeus + k-means quantization into one token stream)."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.ualm.xeus import (
    XeusConfig,
    XeusEncoder,
    xeus_ssl_feature_fn,
    _rel_shift,
)


def test_frame_shift_matches_reference_metadata():
    # the reference hardcodes ssl_frame_shift = 320 / 50 fps at 16 kHz
    # (audio.py:292-296); the conv frontend must reproduce it
    assert XeusConfig.xeus().frame_shift == 320
    assert 16000 // XeusConfig.xeus().frame_shift == 50


def test_xeus_encoder_shapes_and_finite():
    cfg = XeusConfig.tiny()
    enc = XeusEncoder(cfg)
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 3200)), jnp.float32
    )
    v = enc.init(jax.random.PRNGKey(0), wav)
    out = enc.apply(v, wav)
    assert out.shape == (2, cfg.frontend_length(3200), cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def test_rel_shift_semantics():
    # relshift turns the [T, 2T-1] relative-offset layout into [T, T]
    # absolute (i, j) scores where column j picks offset (i - j)
    t = 4
    offs = jnp.arange(t - 1, -t, -1, dtype=jnp.float32)  # value = offset
    x = jnp.broadcast_to(offs[None, None, None, :], (1, 1, t, 2 * t - 1))
    y = _rel_shift(x)[0, 0]
    i, j = np.indices((t, t))
    np.testing.assert_allclose(np.asarray(y), i - j)


def test_ssl_feature_fn_contract_and_kmeans_integration():
    """The adapter delivers exactly T//320-frame features and the k-means
    quantizer consumes them into one token stream (audio.py:416-492)."""
    from audio_intelligence_tpu.models.ualm.audio_io import KmeansQuantizer

    cfg = XeusConfig.tiny()
    enc = XeusEncoder(cfg)
    wav = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 3250)), jnp.float32
    )  # NOT a frame-shift multiple — exercises pad/crop
    v = enc.init(jax.random.PRNGKey(0), wav[:, :3200])
    fn = xeus_ssl_feature_fn(enc, v, cfg.frame_shift)
    feats = fn(wav)
    assert feats.shape[:2] == (1, 3250 // cfg.frame_shift)

    km = KmeansQuantizer(
        np.random.default_rng(2).standard_normal((7, cfg.hidden_size))
    )
    ids = km(feats)
    assert ids.shape == feats.shape[:2]
    assert int(ids.max()) < 7 and int(ids.min()) >= 0
