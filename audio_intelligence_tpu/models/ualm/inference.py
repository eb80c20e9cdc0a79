"""UALM inference orchestration (parallel.py inference:387-533 parity).

The per-sample loop above ``generate_segment``: build the prompt from user
turns, predict/emit the assistant segment under its modality's restricted-
decoding mask, detokenize through the owning IO (audio → codec decode,
text → tokenizer decode). Flagship config: audio ≤1024 steps top-k 20
temp 0.8 CFG 3; text greedy (conf/inference.yaml).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.ualm.decode import (
    generate_segment,
    restricted_logit_mask,
)
from audio_intelligence_tpu.models.ualm.lm import ParallelLM
from audio_intelligence_tpu.models.ualm.preprocessor import UALMPreprocessor


@dataclass
class InferenceConfig:
    audio_max_steps: int = 1024
    audio_top_k: int = 20
    audio_temperature: float = 0.8
    audio_cfg: float = 3.0
    text_max_steps: int = 256
    text_greedy: bool = True


@dataclass
class UALMInferenceEngine:
    model: ParallelLM
    variables: dict
    preprocessor: UALMPreprocessor
    config: InferenceConfig = field(default_factory=InferenceConfig)

    def __post_init__(self):
        vocab = self.preprocessor.vocab
        self.eos_id = vocab.index("<|eos|>")
        self.eot_id = vocab.index("<|eot|>")
        n_vocab = len(vocab)
        self.masks: Dict[str, jnp.ndarray] = {}
        for io_name, io in self.preprocessor.multimodal_io.items():
            if not io.is_discrete:
                continue
            # global intervals = unified-vocab base + per-stream local spans
            g0 = self.preprocessor.vocab_intervals[io_name][0][0]
            local0 = io.get_stream_interval()[0][0]
            intervals = [
                (g0 + (s - local0), g0 + (e - local0))
                for s, e in io.get_stream_interval()
            ]
            # pad remaining streams with the first interval (stream 0 rules)
            while len(intervals) < self.preprocessor.num_stream:
                intervals.append(intervals[0])
            self.masks[io_name] = jnp.asarray(
                restricted_logit_mask(
                    n_vocab, intervals, eos_ids=(self.eos_id, self.eot_id)
                )
            )

    def infer(self, task: str, sample: dict, key: jax.Array):
        """One sample → dict with 'audio' (wav, sr) or 'text'."""
        pre = self.preprocessor
        prompt, _conti = pre.build_inference_prompt(task, sample)
        prompt = jnp.asarray(prompt[None], jnp.int32)

        out_io_name = pre.audio_output
        messages = pre._apply_chat_template(task, sample, allow_missing=True)
        for role, io_name, _ in messages:
            if role == "assistant":
                out_io_name = io_name
                break
        io = pre.multimodal_io[out_io_name]

        if io.modality == "audio":
            cfg = self.config
            tokens, done = generate_segment(
                self.model, self.variables, prompt,
                cfg.audio_max_steps, self.masks[out_io_name], self.eos_id,
                key, cfg_scale=cfg.audio_cfg, top_k=cfg.audio_top_k,
                temperature=cfg.audio_temperature,
            )
            toks = np.asarray(tokens[0])
            done_np = np.asarray(done[0])
            n_valid = int(np.argmax(done_np)) if done_np.any() else toks.shape[0]
            n_valid = max(n_valid, io.num_stream())
            # strip the unified-vocab offset → IO-local ids
            base = pre.vocab_intervals[out_io_name][0][0]
            local = np.clip(toks[:n_valid] - base, 0, None)
            wav, lengths, sr = io.decode_batch(local[None])
            return {"audio": (np.asarray(wav)[0], sr), "tokens": toks[:n_valid]}

        # text output: greedy stream-0 decode
        cfg = self.config
        tokens, done = generate_segment(
            self.model, self.variables, prompt,
            cfg.text_max_steps, self.masks[out_io_name], self.eos_id,
            key, cfg_scale=1.0,
            top_k=1 if cfg.text_greedy else 20,
            temperature=1.0,
        )
        toks = np.asarray(tokens[0])
        done_np = np.asarray(done[0])
        n_valid = int(np.argmax(done_np)) if done_np.any() else toks.shape[0]
        base = pre.vocab_intervals[out_io_name][0][0]
        local = toks[:n_valid] - base
        text = io.decode_batch(local[None])[0]
        return {"text": text, "tokens": toks[:n_valid]}
