"""UALM inference engine: audio + text segments end-to-end (tiny stack)."""

import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.ualm.backbone import BackboneConfig
from audio_intelligence_tpu.models.ualm.codec import RVQCodec
from audio_intelligence_tpu.models.ualm.audio_io import DiscreteAudioIO
from audio_intelligence_tpu.models.ualm.text_io import ByteTextIO
from audio_intelligence_tpu.models.ualm.lm import ParallelLM
from audio_intelligence_tpu.models.ualm.preprocessor import UALMPreprocessor
from audio_intelligence_tpu.models.ualm.vocab import build_vocabulary
from audio_intelligence_tpu.models.ualm.inference import (
    InferenceConfig,
    UALMInferenceEngine,
)


def build_engine():
    codec = RVQCodec(
        num_quantizers=4, codebook_size=16, latent_dim=8, channels=4,
        c_mults=(2, 4), strides=(4, 5),
    )
    codec_vars = codec.init(jax.random.PRNGKey(0), jnp.zeros((1, 200)))
    dio = DiscreteAudioIO(
        codec=codec, codec_variables=codec_vars, n_streams=4, codebook_size=16,
        frame_shift=20,
    )
    ios = {"text": ByteTextIO(), "discrete_audio": dio}
    vocab, intervals = build_vocabulary(ios)
    pre = UALMPreprocessor(
        multimodal_io=ios, vocab=vocab, vocab_intervals=intervals,
        audio_input="discrete_audio", audio_output="discrete_audio",
        is_train=False,
    )
    cfg = BackboneConfig.tiny()
    model = ParallelLM(cfg=cfg, vocab_size=len(vocab), num_stream=4)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 4), jnp.int32))
    return UALMInferenceEngine(
        model, variables, pre,
        InferenceConfig(audio_max_steps=12, text_max_steps=8),
    )


def test_audio_generation_segment():
    eng = build_engine()
    out = eng.infer(
        "caption_to_audio", {"text1": "a drum loop"}, jax.random.PRNGKey(0)
    )
    wav, sr = out["audio"]
    assert sr == 16000
    assert wav.ndim == 1 and wav.shape[0] > 0
    assert np.isfinite(wav).all()


def test_text_generation_segment():
    eng = build_engine()
    wav = np.random.default_rng(0).standard_normal(400).astype(np.float32) * 0.1
    out = eng.infer(
        "audio_to_caption",
        {"text1": "describe", "audio1": (wav, 16000), "text2": "unused"},
        jax.random.PRNGKey(0),
    )
    assert isinstance(out["text"], str)
