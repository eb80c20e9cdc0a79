"""Golden token-sequence parity vs the ACTUAL reference UALMPreprocessor.

Round-2 VERDICT missing #3: the chat-template → multi-stream token
contract (UALM/models/ualm/ualm_job.py:311-418, _apply_chat_template
:492-538) is the interchange format for any converted checkpoint. The
reference module imports cleanly once ``librosa`` is stubbed; both
preprocessors are driven with the SAME fake multimodal-IO objects so
the comparison isolates exactly the preprocessor logic: special tokens,
vocab-interval biasing, stream padding, loss-mask regions, eot/eos
placement, CFG dropout, and bucket/pack collation.
"""

import importlib.machinery
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # torch-reference fixtures

torch = pytest.importorskip("torch")

from audio_intelligence_tpu.models.ualm.preprocessor import (
    UALMPreprocessor as OurPreprocessor,
)

NUM_SPECIAL = 256


def _load_reference_preprocessor_cls():
    import transformers  # noqa: F401 — before the librosa stub (its
    # import_utils probes librosa.__spec__ at import time)

    if "librosa" not in sys.modules:
        lib = types.ModuleType("librosa")
        lib.__spec__ = importlib.machinery.ModuleSpec("librosa", None)
        sys.modules["librosa"] = lib

    saved = {
        n: sys.modules.get(n)
        for n in ("models", "utils", "dataloader")
        if n in sys.modules
    }
    sys.path.insert(0, "/root/reference/UALM")
    try:
        from models.ualm.ualm_job import UALMPreprocessor as RefPreprocessor
    finally:
        sys.path.remove("/root/reference/UALM")
        # "models"/"utils"/"dataloader" are too generic to leave registered
        for n in ("models", "utils", "dataloader"):
            if n in saved:
                sys.modules[n] = saved[n]
            else:
                for k in [k for k in sys.modules if k == n or k.startswith(n + ".")]:
                    del sys.modules[k]
        # the librosa stand-in breaks later availability probes
        # (find_spec) once this module's tests are done — drop it too
        if not getattr(sys.modules.get("librosa"), "__file__", None):
            sys.modules.pop("librosa", None)
    return RefPreprocessor


class FakeTextIO:
    """Deterministic discrete text IO shared by both preprocessors:
    ids = bytes mod vocab, single stream, loss over every token."""

    is_discrete = True
    modality = "text"
    vocab_size = 16

    def num_stream(self):
        return 1

    def get_vocabulary(self):
        return [f"<txt{i}>" for i in range(self.vocab_size)]

    def get_stream_interval(self):
        return [(0, self.vocab_size)]

    def preprocess(self, data):
        ids = np.asarray(
            [ord(c) % self.vocab_size for c in data], np.int64
        )[:, None]
        return ids, None, np.ones_like(ids, np.float32)

    def find_length(self, data):
        return len(data)

    def copy_for_worker(self):
        return self


class FakeDiscreteAudioIO:
    """4-stream codec-style IO; per-stream vocab intervals of 8."""

    is_discrete = True
    modality = "audio"
    n_stream = 4
    per_stream = 8

    def num_stream(self):
        return self.n_stream

    def get_vocabulary(self):
        return [
            f"<aud{s}_{i}>"
            for s in range(self.n_stream)
            for i in range(self.per_stream)
        ]

    def get_stream_interval(self):
        return [
            (s * self.per_stream, (s + 1) * self.per_stream)
            for s in range(self.n_stream)
        ]

    def preprocess(self, data):
        t = int(data)
        rng = np.random.default_rng(t)
        ids = rng.integers(0, self.per_stream, (t, self.n_stream)).astype(np.int64)
        ids += np.arange(self.n_stream)[None, :] * self.per_stream
        return ids, None, np.ones_like(ids, np.float32)

    def find_length(self, data):
        return int(data)

    def copy_for_worker(self):
        return self


class FakeContinuousAudioIO:
    """Continuous tower IO: pad-token rows + a dense feature payload."""

    is_discrete = False
    modality = "audio"

    def __init__(self, pad_id):
        self.pad_id = pad_id

    def num_stream(self):
        return 1

    def preprocess(self, data):
        t = int(data)
        rows = np.full((t, 1), self.pad_id, np.int64)
        feat = (np.arange(t * 3, dtype=np.float32).reshape(t, 3) / 7.0)
        return rows, (t, feat), np.zeros((t, 1), np.float32)

    def find_length(self, data):
        return int(data)

    def copy_for_worker(self):
        return self


def _build_world():
    """(multimodal_io, vocab, vocab_intervals) exactly as
    UALMJobTemplate._build_vocabulary (ualm_job.py:71-110) lays them out."""
    vocab = [
        "<|pad|>", "<|bos|>", "<|eos|>", "<|eot|>", "<|system|>",
        "<|user|>", "<|assistant|>", "<|text|>", "<|audio|>", "<|speech|>",
        "<|image|>", "<|video|>", "<|toolcall|>",
    ]
    while len(vocab) < NUM_SPECIAL:
        vocab.append(f"<|unused_{len(vocab)}|>")
    intervals = {"special_token": [(0, NUM_SPECIAL)]}

    text_io = FakeTextIO()
    disc_io = FakeDiscreteAudioIO()
    cont_io = FakeContinuousAudioIO(pad_id=0)
    ios = {
        "text": text_io,
        "discrete_audio": disc_io,
        "continuous_audio": cont_io,
    }
    start = NUM_SPECIAL
    for name, io in ios.items():
        if io.is_discrete:
            vocab.extend(io.get_vocabulary())
            intervals[name] = [
                (start + a, start + b) for a, b in io.get_stream_interval()
            ]
            start = len(vocab)
    return ios, vocab, intervals


def _make_pair(audio_cfg=0.0, batchfy="bucket", is_train=True):
    RefPre = _load_reference_preprocessor_cls()
    ios, vocab, intervals = _build_world()
    ref = RefPre(
        is_train=is_train, multimodal_io=ios, vocab=vocab,
        vocab_intervals=intervals, audio_input="continuous_audio",
        audio_output="discrete_audio", loss_region="assistant",
        batchfy_method=batchfy, audio_cfg=audio_cfg,
    )
    ours = OurPreprocessor(
        multimodal_io=ios, vocab=vocab, vocab_intervals=intervals,
        audio_input="continuous_audio", audio_output="discrete_audio",
        loss_region="assistant", batchfy_method=batchfy,
        audio_cfg=audio_cfg, is_train=is_train,
    )
    return ref, ours


SAMPLES = {
    # raw reference format: "audio" + "text" rows; ours takes the
    # entry-keyed dict the reference's _reformat_data_dict produces
    "text_only": (
        {"text": [(0, "text", "hello"), (0, "text", "general kenobi")]},
        {"text1": "hello", "text2": "general kenobi"},
    ),
    "caption_to_audio": (
        {"audio": 6, "text": [(0, "text", "rain on tin roof")]},
        {"text1": "rain on tin roof", "audio1": 6},
    ),
    "audio_to_caption": (
        {"audio": 5, "text": [(0, "text", "describe"), (0, "text", "a dog barks")]},
        {"text1": "describe", "audio1": 5, "text2": "a dog barks"},
    ),
    "audio_to_conversation": (
        {"audio": 4, "text": [(0, "text", "what is this"), (0, "text", "a horn")]},
        {"audio1": 4, "text1": "what is this", "text2": "a horn"},
    ),
    "audio_only": (
        {"audio": 7, "text": [(0, "text", "")]},
        {"text1": "", "audio1": 7},
    ),
    "transcription_to_speech": (
        {"audio": 3, "text": [(0, "text", "say this")]},
        {"text1": "say this", "audio1": 3},
    ),
    "speech_to_transcription": (
        {"audio": 8, "text": [(0, "text", "transcribe"), (0, "text", "said that")]},
        {"text1": "transcribe", "audio1": 8, "text2": "said that"},
    ),
}


@pytest.mark.parametrize("task", sorted(SAMPLES))
def test_per_task_token_sequence_parity(task):
    ref, ours = _make_pair()
    raw, keyed = SAMPLES[task]
    key = (task, "fixture", 0)
    r = ref.preprocessing(key, dict(raw))
    o = ours.preprocessing(key, dict(keyed), rng=np.random.default_rng(0))

    np.testing.assert_array_equal(o["sequence"], r["sequence"])
    np.testing.assert_array_equal(o["loss_mask"], r["loss_mask"])
    assert len(o["conti_feats"]) == len(r["conti_feats"])
    for (io_o, st_o, ln_o, f_o), (io_r, st_r, ln_r, f_r) in zip(
        o["conti_feats"], r["conti_feats"]
    ):
        assert (io_o, st_o, ln_o) == (io_r, st_r, ln_r)
        np.testing.assert_array_equal(f_o, f_r)


def test_dialogue_passthrough_parity():
    ref, ours = _make_pair()
    dlg = [
        ("system", "text", "you are helpful"),
        ("user", "continuous_audio", 4),
        ("user", "text", "what now"),
        ("assistant", "text", "all good"),
        ("assistant", "discrete_audio", 3),
    ]
    key = ("audio_to_conversation", "fixture", 1)
    r = ref.preprocessing(key, {"dialogue": list(dlg)})
    o = ours.preprocessing(key, {"dialogue": list(dlg)}, rng=np.random.default_rng(0))
    np.testing.assert_array_equal(o["sequence"], r["sequence"])
    np.testing.assert_array_equal(o["loss_mask"], r["loss_mask"])


def test_find_length_parity():
    ref, ours = _make_pair()
    for task, (raw, keyed) in SAMPLES.items():
        key = (task, "fixture", 0)
        assert ours.find_length(key, dict(keyed)) == ref.find_length(key, dict(raw))


@pytest.mark.parametrize("batchfy", ["bucket", "pack"])
def test_collate_parity(batchfy):
    ref, ours = _make_pair(batchfy=batchfy)
    tasks = ["caption_to_audio", "audio_to_caption", "text_only"]
    raw_lst = [((t, "fx", i), dict(SAMPLES[t][0])) for i, t in enumerate(tasks)]
    keyed_lst = [((t, "fx", i), dict(SAMPLES[t][1])) for i, t in enumerate(tasks)]
    r = ref.collate_fn(raw_lst)
    o = ours.collate_fn(keyed_lst, rng=np.random.default_rng(0))

    np.testing.assert_array_equal(np.asarray(o["seqs"]), r["seqs"].numpy())
    np.testing.assert_array_equal(
        np.asarray(o["loss_masks"]), r["loss_masks"].numpy()
    )
    if batchfy == "pack":
        np.testing.assert_array_equal(
            np.asarray(o["position_ids"]), r["position_ids"].numpy()
        )
    for k in ("continuous_audio_indices", "continuous_audio_lengths"):
        np.testing.assert_array_equal(
            np.asarray(o[k]), r[k].numpy()
        )
    np.testing.assert_allclose(
        np.asarray(o["continuous_audio_feats"]),
        r["continuous_audio_feats"].numpy(),
    )


def test_cfg_dropout_parity_single_audio_segment():
    """With exactly one assistant-audio segment the kept index is forced,
    so the reference's global-random choice is deterministic — compare
    the full CFG-zeroed outputs (audio_cfg=1.0 forces the branch)."""
    ref, ours = _make_pair(audio_cfg=1.0)
    task = "caption_to_audio"
    raw, keyed = SAMPLES[task]
    key = (task, "fx", 0)
    import random as _random

    _random.seed(0)
    r = ref.preprocessing(key, dict(raw))
    o = ours.preprocessing(key, dict(keyed), rng=np.random.default_rng(0))
    np.testing.assert_array_equal(o["sequence"], r["sequence"])
    np.testing.assert_array_equal(o["loss_mask"], r["loss_mask"])
    # CFG keeps only audio-output conti feats (here: none survive)
    assert o["conti_feats"] == r["conti_feats"] == []
