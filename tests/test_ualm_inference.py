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


def test_padded_batched_decode_matches_per_sample():
    """Left-padded batched generate_segment (prompt_lengths) must equal
    per-sample decodes in the deterministic regime — the correctness
    basis of the sharded batch-inference driver (models/ualm/eval.py;
    reference shards whole samples per worker, scripts/inference.py)."""
    from audio_intelligence_tpu.models.ualm.decode import (
        generate_segment,
        restricted_logit_mask,
    )

    cfg = BackboneConfig.tiny()
    vocab_size = 64
    model = ParallelLM(cfg=cfg, vocab_size=vocab_size, num_stream=2)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 2), jnp.int32)
    )
    intervals = [(10, 26), (26, 42)]
    eos = 5
    mask = jnp.asarray(restricted_logit_mask(vocab_size, intervals, (eos,)))

    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(10, 26, (n, 2)).astype(np.int64) for n in (3, 7, 5, 4)
    ]
    max_steps = 6
    key = jax.random.PRNGKey(1)

    singles = []
    for p in prompts:
        toks, _ = generate_segment(
            model, variables, jnp.asarray(p[None], jnp.int32), max_steps,
            mask, eos, key, cfg_scale=1.0, top_k=1, temperature=1.0,
            stream_intervals=intervals,
        )
        singles.append(np.asarray(toks[0]))

    # batched, left-padded to a common bucket (greedy → key-independent)
    t_pad = 8
    ids = np.zeros((len(prompts), t_pad, 2), np.int64)
    for i, p in enumerate(prompts):
        ids[i, t_pad - p.shape[0]:] = p
    lengths = jnp.asarray([p.shape[0] for p in prompts], jnp.int32)
    toks_b, _ = generate_segment(
        model, variables, jnp.asarray(ids, jnp.int32), max_steps,
        mask, eos, key, cfg_scale=1.0, top_k=1, temperature=1.0,
        stream_intervals=intervals, prompt_lengths=lengths,
    )
    for i, ref in enumerate(singles):
        np.testing.assert_array_equal(np.asarray(toks_b[i]), ref)


def test_sharded_batch_inference_on_mesh():
    """The mesh-sharded dataset driver: 5 variable-length prompts over
    the 8-device CPU mesh, aggregated results.json (scripts/inference.py
    worker-shard parity)."""
    from jax.sharding import Mesh

    from audio_intelligence_tpu.models.ualm.decode import restricted_logit_mask
    from audio_intelligence_tpu.models.ualm.eval import (
        shard_for_process,
        sharded_batch_inference,
        write_results_shard,
    )

    cfg = BackboneConfig.tiny()
    vocab_size = 64
    model = ParallelLM(cfg=cfg, vocab_size=vocab_size, num_stream=2)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 2), jnp.int32)
    )
    intervals = [(10, 26), (26, 42)]
    eos = 5
    mask = jnp.asarray(restricted_logit_mask(vocab_size, intervals, (eos,)))
    rng = np.random.default_rng(1)
    prompts = [
        rng.integers(10, 26, (int(n), 2)).astype(np.int64)
        for n in rng.integers(2, 9, 5)
    ]
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    out = sharded_batch_inference(
        model, variables, shard_for_process(prompts, 0, 1), max_steps=4,
        logit_mask=mask, eos_id=eos, key=jax.random.PRNGKey(2), mesh=mesh,
        per_device=1, top_k=1, temperature=1.0, stream_intervals=intervals,
    )
    assert len(out) == len(prompts)
    for toks, n_valid in out:
        assert toks.shape == (4, 2)
        assert 0 <= n_valid <= 4

    import tempfile, json, pathlib
    with tempfile.TemporaryDirectory() as d:
        recs = [{"id": i, "n": int(n)} for i, (_, n) in enumerate(out)]
        write_results_shard(d, recs, process_index=0)
        merged = json.loads((pathlib.Path(d) / "results.json").read_text())
        assert len(merged) == len(prompts)


def test_ualm_infer_cli_sharded(tmp_path):
    """The CLI's --sharded path: jsonl in → per-shard results + merged
    results.json out, over the 8-device CPU mesh."""
    import json as _json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from cli.ualm_infer import main as infer_main

    test_jsonl = tmp_path / "test.jsonl"
    rows = [
        {"task": "caption_to_audio", "text1": f"a short sound {i}"}
        for i in range(3)
    ]
    test_jsonl.write_text("\n".join(_json.dumps(r) for r in rows))
    out_dir = tmp_path / "out"
    infer_main([
        "--test_jsonl", str(test_jsonl), "--output_dir", str(out_dir),
        "--max_steps", "6", "--sharded",
    ])
    merged = _json.loads((out_dir / "results.json").read_text())
    assert len(merged) == 3
    assert (out_dir / "results_shard_0.json").exists()
