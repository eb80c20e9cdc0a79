"""The multimodal IO contract (UALM/models/ualm/multimodal_io/abs_io.py:21-205).

Every modality plugs into the LM through this interface. Host-side methods
(preprocess, find_length) run in data workers on numpy; device-side methods
(encode_batch, decode_batch) are jittable.
"""

from __future__ import annotations

import abc
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np


class AbsIO(abc.ABC):
    """Contract: modality, is_discrete, preprocess, encode_batch,
    decode_batch, find_length, copy_for_worker, feature_dim, num_stream,
    get_vocabulary, get_stream_interval, get_stream_weight."""

    modality: str = "audio"
    is_discrete: bool = True

    @abc.abstractmethod
    def preprocess(self, data) -> Tuple[np.ndarray, Optional[tuple], np.ndarray]:
        """raw sample → (seq [T, S], conti_feat (length, feat) | None,
        loss_mask [T, S])."""

    @abc.abstractmethod
    def find_length(self, data) -> int:
        """Token length without full preprocessing (for batch planning)."""

    def copy_for_worker(self) -> "AbsIO":
        """Lightweight copy for dataloader workers (no heavy weights)."""
        return self

    # discrete-only
    def num_stream(self) -> int:
        raise NotImplementedError

    def get_vocabulary(self) -> List[str]:
        raise NotImplementedError

    def get_stream_interval(self) -> List[Tuple[int, int]]:
        raise NotImplementedError

    def get_stream_weight(self) -> List[float]:
        return [1.0 / self.num_stream()] * self.num_stream()

    # continuous-only
    def feature_dim(self) -> int:
        raise NotImplementedError

    # device-side
    def encode_batch(self, feats, lengths):
        raise NotImplementedError

    def decode_batch(self, codes, lengths=None):
        raise NotImplementedError
