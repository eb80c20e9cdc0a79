"""Text IO implementations (UALM/models/ualm/multimodal_io/text.py parity).

- HFTextIO: HF tokenizer-backed (gated — zero-egress images may not have
  downloaded vocabularies; pass a local path).
- ByteTextIO: dependency-free UTF-8 byte vocabulary (256 symbols), fully
  deterministic — the offline default so every pipeline runs without
  downloads.

Both expose the AbsIO contract with text living in stream 0.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from audio_intelligence_tpu.models.ualm.abs_io import AbsIO


class ByteTextIO(AbsIO):
    modality = "text"
    is_discrete = True

    def num_stream(self) -> int:
        return 1

    def get_vocabulary(self) -> List[str]:
        return [f"<byte_{i}>" for i in range(256)]

    def get_stream_interval(self):
        return [(0, 256)]

    def _ids(self, text: str) -> np.ndarray:
        return np.frombuffer(str(text).encode("utf-8"), np.uint8).astype(np.int64)

    def find_length(self, data) -> int:
        return len(str(data).encode("utf-8"))

    def preprocess(self, data):
        seq = self._ids(data)[:, None]
        return seq, None, np.ones_like(seq, np.float32)

    def decode_batch(self, codes, lengths=None):
        out = []
        codes = np.asarray(codes)
        for i in range(codes.shape[0]):
            ids = codes[i, :, 0] if codes.ndim == 3 else codes[i]
            if lengths is not None:
                ids = ids[: int(lengths[i])]
            ids = ids[(ids >= 0) & (ids < 256)].astype(np.uint8)
            out.append(ids.tobytes().decode("utf-8", errors="replace"))
        return out


class HFTextIO(AbsIO):
    """HF tokenizer wrapper (text.py HuggingFaceTextIO:19-170). Requires a
    locally cached tokenizer; raises a clear error otherwise."""

    modality = "text"
    is_discrete = True

    def __init__(self, model_hf_tag: str):
        try:
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(model_hf_tag)
        except Exception as e:  # no network / not cached
            raise RuntimeError(
                f"tokenizer {model_hf_tag!r} unavailable offline; use "
                f"ByteTextIO or provide a local path"
            ) from e
        self.model_hf_tag = model_hf_tag

    def num_stream(self) -> int:
        return 1

    def get_vocabulary(self) -> List[str]:
        vocab = self.tokenizer.get_vocab()
        out = [None] * len(vocab)
        for tok, idx in vocab.items():
            if idx < len(out):
                out[idx] = f"<text_{idx}_{tok}>"
        return [t or f"<text_{i}>" for i, t in enumerate(out)]

    def get_stream_interval(self):
        return [(0, len(self.tokenizer.get_vocab()))]

    def find_length(self, data) -> int:
        return len(self.tokenizer.encode(str(data), add_special_tokens=False))

    def preprocess(self, data):
        ids = np.asarray(
            self.tokenizer.encode(str(data), add_special_tokens=False), np.int64
        )[:, None]
        return ids, None, np.ones_like(ids, np.float32)

    def decode_batch(self, codes, lengths=None):
        out = []
        codes = np.asarray(codes)
        for i in range(codes.shape[0]):
            ids = codes[i, :, 0] if codes.ndim == 3 else codes[i]
            if lengths is not None:
                ids = ids[: int(lengths[i])]
            out.append(self.tokenizer.decode([int(t) for t in ids if t >= 0]))
        return out

    def copy_for_worker(self):
        return HFTextIO(self.model_hf_tag)
