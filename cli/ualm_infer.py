#!/usr/bin/env python
"""UALM batch inference CLI (``UALM/scripts/inference.py`` parity).

Reads a JSONL test set ({"task", "text1"|"audio1", ...} rows), runs
understanding (text out) or generation (audio out) per sample, writes
wavs + results.json.

``--sharded`` runs the dataset-scale driver (models/ualm/eval.py): the
test set splits ``samples[process_index::process_count]`` across hosts
(the reference's mp.spawn worker sharding, scripts/inference.py:156-304)
and, within a host, batches of left-padded prompts decode with the batch
dimension sharded over the device mesh's ``data`` axis; per-process
result shards aggregate into ``results.json``.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_intelligence_tpu.utils.platform import maybe_force_platform

maybe_force_platform()

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--test_jsonl", required=True)
    p.add_argument("--output_dir", default="ualm_outputs")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--max_steps", type=int, default=1024)
    p.add_argument("--top_k", type=int, default=20)
    p.add_argument("--temperature", type=float, default=0.8)
    p.add_argument("--cfg", type=float, default=3.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sharded", action="store_true",
                   help="data-sharded batch inference over all devices "
                        "(+ host sharding under multi-process JAX)")
    p.add_argument("--per_device", type=int, default=1)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from audio_intelligence_tpu.data.audio_io import write_wav
    from audio_intelligence_tpu.models.ualm.audio_io import DiscreteAudioIO
    from audio_intelligence_tpu.models.ualm.backbone import BackboneConfig
    from audio_intelligence_tpu.models.ualm.codec import RVQCodec
    from audio_intelligence_tpu.models.ualm.decode import (
        generate_segment,
        restricted_logit_mask,
    )
    from audio_intelligence_tpu.models.ualm.interleave import delay_deinterleave
    from audio_intelligence_tpu.models.ualm.lm import ParallelLM
    from audio_intelligence_tpu.models.ualm.preprocessor import UALMPreprocessor
    from audio_intelligence_tpu.models.ualm.vocab import build_vocabulary

    # small smoke-scale stack (flagship scale via configs once ckpts exist)
    codec = RVQCodec(
        num_quantizers=4, codebook_size=64, latent_dim=32, channels=8,
        c_mults=(2, 4), strides=(4, 5),
    )
    codec_vars = codec.init(jax.random.PRNGKey(0), jnp.zeros((1, 200)))

    class TextIO:
        modality, is_discrete = "text", True

        def num_stream(self):
            return 1

        def get_vocabulary(self):
            return [f"t{i}" for i in range(256)]

        def get_stream_interval(self):
            return [(0, 256)]

        def find_length(self, d):
            return len(self._ids(d))

        def _ids(self, text):
            return [hash(w) % 255 + 1 for w in str(text).split()][:64]

        def preprocess(self, d):
            seq = np.asarray(self._ids(d), np.int64)[:, None]
            return seq, None, np.ones_like(seq, np.float32)

    dio = DiscreteAudioIO(
        codec=codec, codec_variables=codec_vars, n_streams=4, codebook_size=64,
        frame_shift=20,
    )
    ios = {"text": TextIO(), "discrete_audio": dio}
    vocab, intervals = build_vocabulary(ios)
    pre = UALMPreprocessor(
        multimodal_io=ios, vocab=vocab, vocab_intervals=intervals,
        audio_input="discrete_audio", audio_output="discrete_audio",
        is_train=False,
    )

    cfg = BackboneConfig(
        hidden_size=128, num_layers=4, num_heads=4, num_kv_heads=2,
        intermediate_size=256,
    )
    model = ParallelLM(cfg=cfg, vocab_size=len(vocab), num_stream=4)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 4), jnp.int32))
    if args.checkpoint:
        from audio_intelligence_tpu.train.checkpoint import load_exported_weights

        variables = load_exported_weights(variables, args.checkpoint)
    else:
        print("WARNING: random weights (smoke mode)")

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    eos = vocab.index("<|eos|>")
    audio_mask = jnp.asarray(
        restricted_logit_mask(len(vocab), intervals["discrete_audio"], eos_ids=(eos,))
    )

    samples = [json.loads(line) for line in open(args.test_jsonl)]
    key = jax.random.PRNGKey(args.seed)

    def write_audio(i, task, toks, n_valid):
        codes = toks[None, :n_valid]
        if codes.shape[1] > dio.n_streams:
            wav, _, sr = dio.decode_batch(jnp.asarray(codes))
            wav_path = str(out_dir / f"gen_{i:04d}.wav")
            write_wav(wav_path, sr, np.asarray(wav)[0])
            print(f"[{i}] wrote {wav_path}")
            return {"id": i, "task": task, "audio": wav_path}
        return {"id": i, "task": task, "audio": None}

    if args.sharded:
        from jax.sharding import Mesh

        from audio_intelligence_tpu.models.ualm.eval import (
            shard_for_process,
            sharded_batch_inference,
            write_results_shard,
        )

        mine = shard_for_process(list(enumerate(samples)))
        prompts, metas = [], []
        for i, sample in mine:
            task = sample.get("task", "caption_to_audio")
            seq, _ = pre.build_inference_prompt(task, sample)
            prompts.append(np.asarray(seq))
            metas.append((i, task))
        devs = np.asarray(jax.devices())
        mesh = Mesh(devs.reshape(devs.size), ("data",))
        outs = sharded_batch_inference(
            model, variables, prompts, args.max_steps, audio_mask, eos,
            key, mesh=mesh, per_device=args.per_device,
            cfg_scale=args.cfg, top_k=args.top_k,
            temperature=args.temperature,
            stream_intervals=intervals["discrete_audio"],
        )
        # n_valid comes through unchanged: eval.py already returns
        # max_steps for never-done rows, and a genuine n_valid == 0
        # (EOS at the first step) must stay 0 rather than decode the
        # whole garbage token buffer.
        results = [
            write_audio(i, task, toks, n_valid)
            for (i, task), (toks, n_valid) in zip(metas, outs)
        ]
        shard = write_results_shard(out_dir, results)
        print(f"wrote {shard} (+ merged results.json on process 0)")
        return

    results = []
    for i, sample in enumerate(samples):
        task = sample.get("task", "caption_to_audio")
        seq, _ = pre.build_inference_prompt(task, sample)
        prompt = jnp.asarray(seq[None, :, :], jnp.int32)

        key, sub = jax.random.split(key)
        tokens, done = generate_segment(
            model, variables, prompt, args.max_steps, audio_mask, eos,
            sub, cfg_scale=args.cfg, top_k=args.top_k,
            temperature=args.temperature,
            # narrow restricted decode: sample within each stream's codebook
            # interval (+eos on stream 0) instead of the full unified vocab
            stream_intervals=intervals["discrete_audio"],
        )
        toks = np.asarray(tokens[0])
        n_valid = int(np.argmax(np.asarray(done[0]))) or toks.shape[0]
        results.append(write_audio(i, task, toks, n_valid))

    (out_dir / "results.json").write_text(json.dumps(results, indent=1))
    print(f"wrote {out_dir}/results.json")


if __name__ == "__main__":
    main()
