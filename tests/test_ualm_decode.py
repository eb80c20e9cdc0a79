"""UALM decode loop: restricted decoding, eos handling, CFG branch."""

import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.ualm.backbone import BackboneConfig
from audio_intelligence_tpu.models.ualm.lm import ParallelLM
from audio_intelligence_tpu.models.ualm.decode import (
    restricted_logit_mask,
    topk_temperature_sample,
    generate_segment,
)


VOCAB = 64
EOS = 2
STREAMS = 3
INTERVALS = [(30, 40), (40, 50), (50, 60)]


def make_model():
    cfg = BackboneConfig.tiny()
    model = ParallelLM(cfg=cfg, vocab_size=VOCAB, num_stream=STREAMS)
    ids = jnp.zeros((1, 4, STREAMS), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids)
    return model, variables


def test_restricted_mask():
    m = restricted_logit_mask(VOCAB, INTERVALS, eos_ids=(EOS,))
    assert m.shape == (STREAMS, VOCAB)
    assert m[0, EOS] == 0.0
    assert m[1, EOS] < -1e8
    assert (m[0, 30:40] == 0).all() and (m[0, 40:] < -1e8).all()


def test_topk_sampling_respects_k():
    logits = jnp.asarray([[10.0, 9.0, 0.0, -5.0]])
    for i in range(20):
        tok = topk_temperature_sample(
            jax.random.PRNGKey(i), logits, top_k=2, temperature=1.0
        )
        assert int(tok[0]) in (0, 1)


def test_generate_segment_restricted_and_finite():
    model, variables = make_model()
    prompt = jnp.zeros((2, 5, STREAMS), jnp.int32).at[:, :, 0].set(6)
    mask = jnp.asarray(restricted_logit_mask(VOCAB, INTERVALS, eos_ids=(EOS,)))
    tokens, done = generate_segment(
        model, variables, prompt, max_steps=6, logit_mask=mask, eos_id=EOS,
        key=jax.random.PRNGKey(0), cfg_scale=1.0,
    )
    assert tokens.shape == (2, 6, STREAMS)
    toks = np.asarray(tokens)
    # every emitted token in its stream's allowed set (or eos after done)
    for s, (lo, hi) in enumerate(INTERVALS):
        stream_toks = toks[:, :, s]
        allowed = ((stream_toks >= lo) & (stream_toks < hi)) | (stream_toks == EOS)
        assert allowed.all(), (s, stream_toks)


def test_generate_segment_eos_freeze():
    model, variables = make_model()
    prompt = jnp.zeros((1, 3, STREAMS), jnp.int32)
    # only eos allowed on stream 0 → every frame is eos and done immediately
    only_eos = [(EOS, EOS + 1)] + INTERVALS[1:]
    mask = jnp.asarray(restricted_logit_mask(VOCAB, only_eos, eos_ids=(EOS,)))
    tokens, done = generate_segment(
        model, variables, prompt, max_steps=4, logit_mask=mask, eos_id=EOS,
        key=jax.random.PRNGKey(0),
    )
    toks = np.asarray(tokens)
    assert (toks[:, :, 0] == EOS).all()
    assert np.asarray(done).all()
    # after done, all streams frozen to eos
    assert (toks[:, 1:] == EOS).all()


def test_generate_segment_cfg_branch_runs():
    model, variables = make_model()
    prompt = jnp.zeros((1, 4, STREAMS), jnp.int32).at[:, :, 0].set(6)
    mask = jnp.asarray(restricted_logit_mask(VOCAB, INTERVALS, eos_ids=(EOS,)))
    tokens, _ = generate_segment(
        model, variables, prompt, max_steps=3, logit_mask=mask, eos_id=EOS,
        key=jax.random.PRNGKey(0), cfg_scale=3.0,
    )
    assert np.isfinite(np.asarray(tokens)).all()
    # CFG must change the distribution vs cfg=1 for a conditioned prompt
    tokens1, _ = generate_segment(
        model, variables, prompt, max_steps=3, logit_mask=mask, eos_id=EOS,
        key=jax.random.PRNGKey(0), cfg_scale=1.0,
    )
    assert tokens.shape == tokens1.shape


def test_top_p_sampling():
    from audio_intelligence_tpu.models.ualm.decode import top_p_sample
    import jax.numpy as jnp

    # distribution: p = [0.5, 0.3, 0.15, 0.05]; top_p=0.7 keeps first two
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    seen = set()
    for i in range(50):
        tok = int(top_p_sample(jax.random.PRNGKey(i), logits, top_p=0.7)[0])
        seen.add(tok)
    assert seen <= {0, 1}
    # top_p=1.0 can sample anything
    seen = set()
    for i in range(200):
        seen.add(int(top_p_sample(jax.random.PRNGKey(i), logits, top_p=1.0)[0]))
    assert len(seen) >= 3


def test_narrow_decode_matches_full_restricted():
    """stream_intervals narrow decode == full-vocab decode + interval mask
    in the deterministic (argmax) regime."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from audio_intelligence_tpu.models.ualm.backbone import BackboneConfig
    from audio_intelligence_tpu.models.ualm.decode import (
        generate_segment,
        restricted_logit_mask,
    )
    from audio_intelligence_tpu.models.ualm.lm import ParallelLM

    vocab, n_stream = 96, 3
    cfg = BackboneConfig(
        num_layers=2, hidden_size=32, num_heads=2, num_kv_heads=1,
        intermediate_size=64,
    )
    model = ParallelLM(cfg=cfg, vocab_size=vocab, num_stream=n_stream)
    prompt = jnp.asarray(
        np.random.default_rng(0).integers(0, vocab, (1, 6, n_stream)), jnp.int32
    )
    variables = model.init(jax.random.PRNGKey(0), prompt)

    intervals = [(10, 40), (40, 70), (70, 96)]
    # eos OUTSIDE stream 0's interval: the narrow path must append its
    # lm_head column (the reference lets stream 0 emit segment specials)
    mask = jnp.asarray(
        restricted_logit_mask(vocab, intervals, eos_ids=(5,))
    )
    kw = dict(
        max_steps=5, eos_id=5, key=jax.random.PRNGKey(1), cfg_scale=3.0,
        top_k=1, temperature=1e-6,
    )
    tok_full, done_full = generate_segment(
        model, variables, prompt, logit_mask=mask, **kw
    )
    tok_narrow, done_narrow = generate_segment(
        model, variables, prompt, logit_mask=mask,
        stream_intervals=intervals, **kw
    )
    np.testing.assert_array_equal(np.asarray(tok_full), np.asarray(tok_narrow))
    np.testing.assert_array_equal(np.asarray(done_full), np.asarray(done_narrow))
