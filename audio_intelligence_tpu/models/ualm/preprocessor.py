"""UALM preprocessor: raw samples → multi-stream token sequences.

Host-side numpy re-implementation of ``UALMPreprocessor``
(UALM/models/ualm/ualm_job.py:159-568) with identical semantics:

- chat template per task (task_conf_ualm.py UALM_TASK_CONFIGS),
- <|bos|> + per-message <|role|><|modality|> specials + IO tokens +
  <|eot|>/<|eos|> (eot only when consecutive messages share a role),
- multi-stream padding to num_stream; special tokens live in stream 0
  with pad elsewhere,
- loss masks only on assistant messages (or everywhere with
  loss_region='all'); special-token masks carry the role's weight in
  stream 0,
- audio-CFG dropout: with prob p keep one random assistant audio segment
  and zero everything else (ualm_job.py:540-568),
- bucket (pad) or pack (concat + position_ids) collation.

Randomness is an explicit ``numpy.random.Generator`` instead of the
reference's global ``random``/``torch`` state.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Tuple

import numpy as np

from audio_intelligence_tpu.models.ualm.vocab import NUM_SPECIAL_TOKENS, SPECIAL_TOKENS

UALM_TASK_CONFIGS = {
    "text_only": [("user", "text1"), ("assistant", "text2")],
    "caption_to_audio": [("user", "text1"), ("assistant", "audio1")],
    "audio_to_caption": [("user", "text1"), ("user", "audio1"), ("assistant", "text2")],
    "audio_to_conversation": [("user", "audio1"), ("user", "text1"), ("assistant", "text2")],
    "audio_only": [("user", "text1"), ("assistant", "audio1")],
    "transcription_to_speech": [("user", "text1"), ("assistant", "audio1")],
    "speech_to_transcription": [("user", "text1"), ("user", "audio1"), ("assistant", "text2")],
}

SPEECH_TASKS = ("transcription_to_speech", "speech_to_transcription")
AUDIO_TASKS = ("caption_to_audio", "audio_to_caption", "audio_to_conversation", "audio_only")


def pad_list(arrays: List[np.ndarray], pad_value=0):
    """Pad a list of [T, ...] arrays to a [B, maxT, ...] batch + lengths."""
    lengths = np.asarray([a.shape[0] for a in arrays])
    max_len = int(lengths.max())
    out = np.full((len(arrays), max_len) + arrays[0].shape[1:], pad_value, arrays[0].dtype)
    for i, a in enumerate(arrays):
        out[i, : a.shape[0]] = a
    return out, lengths


@dataclass
class UALMPreprocessor:
    multimodal_io: Dict[str, object]
    vocab: List[str]
    vocab_intervals: Dict[str, List[Tuple[int, int]]]
    audio_input: str = "continuous_audio"
    audio_output: str = "discrete_audio"
    loss_region: str = "assistant"
    batchfy_method: str = "bucket"
    audio_cfg: float = 0.0
    is_train: bool = True

    def __post_init__(self):
        self.pad_id = self.vocab.index("<|pad|>")
        streams = [
            io.num_stream() for io in self.multimodal_io.values() if io.is_discrete
        ]
        if not streams:
            raise ValueError("need at least one discrete multimodal IO")
        self.num_stream = max(streams)

    # -- building blocks (ualm_job.py:459-568) --

    def special_token(self, token: str) -> np.ndarray:
        token_id = SPECIAL_TOKENS.index(token) if token in SPECIAL_TOKENS else self.vocab.index(token)
        row = np.full((1, self.num_stream), self.pad_id, np.int64)
        row[0, 0] = token_id
        return row

    def special_mask(self, value: float) -> np.ndarray:
        row = np.zeros((1, self.num_stream), np.float32)
        row[0, 0] = value
        return row

    def _apply_chat_template(self, task, data_dict, allow_missing: bool = False):
        """task → [(role, io_name, data)]. Dialogue passthrough when the
        sample already carries messages (ualm_job.py:492-538).
        ``allow_missing`` tolerates absent assistant content (inference
        prompts are built before the assistant turn exists)."""
        if "dialogue" in data_dict:
            # reference interchange format (ualm_job.py:494-510): the
            # sample IS the message list [(role, io, data), ...]
            if len(data_dict) != 1:
                raise ValueError("dialogue samples must have no other entries")
            if not self.is_train:
                assert all(m[0] != "assistant" for m in data_dict["dialogue"]), (
                    "inference dialogues must not contain assistant messages"
                )
            return data_dict["dialogue"]
        if "messages" in data_dict:
            return [
                (m["role"], m["io"], m["content"]) for m in data_dict["messages"]
            ]
        if task not in UALM_TASK_CONFIGS:
            raise ValueError(f"unknown task {task}")
        messages = []
        for role, entry in UALM_TASK_CONFIGS[task]:
            if entry.startswith("text"):
                io_name = "text"
            elif entry.startswith("audio"):
                io_name = (
                    self.audio_output
                    if role == "assistant"
                    else self.audio_input
                )
            else:
                raise ValueError(f"unknown entry {entry}")
            if allow_missing and entry not in data_dict:
                if role != "assistant":
                    raise KeyError(f"missing non-assistant entry {entry}")
                messages.append((role, io_name, None))
                continue
            messages.append((role, io_name, data_dict[entry]))
        return messages

    def _modality_token(self, task, io) -> str:
        if io.modality == "audio":
            if task in AUDIO_TASKS:
                return "<|audio|>"
            if task in SPEECH_TASKS:
                return "<|speech|>"
            return "<|audio|>"
        return f"<|{io.modality}|>"

    def find_length(self, key, data_dict) -> int:
        task = key[0]
        messages = self._apply_chat_template(task, data_dict)
        length = 1
        for _, this_io, this_data in messages:
            length += 3
            length += self.multimodal_io[this_io].find_length(this_data)
        return length

    # -- single-sample preprocessing (ualm_job.py:311-418) --

    def preprocessing(self, key, data_dict, rng: np.random.Generator | None = None):
        rng = rng or np.random.default_rng()
        task = key[0]
        messages = self._apply_chat_template(task, data_dict)

        seq = [self.special_token("<|bos|>")]
        loss_masks = [self.special_mask(0.0)]
        conti_feats = []
        accum_length = 1

        apply_eots = [
            m1[0] == m2[0] for m1, m2 in zip(messages[:-1], messages[1:])
        ] + [False]

        for apply_eot, (role, this_io, this_data) in zip(apply_eots, messages):
            io = self.multimodal_io[this_io]
            apply_loss = float(role == "assistant" or self.loss_region == "all")
            smask = self.special_mask(apply_loss)

            seq.append(self.special_token(f"<|{role}|>"))
            loss_masks.append(smask)
            seq.append(self.special_token(self._modality_token(task, io)))
            loss_masks.append(smask)
            accum_length += 2

            this_seq, conti_feat, loss_mask = io.preprocess(this_data)
            assert this_seq.shape == loss_mask.shape

            if io.is_discrete:
                bias = self.vocab_intervals[this_io][0][0]
                this_seq = np.where(this_seq == self.pad_id, self.pad_id, this_seq + bias)
            if this_seq.shape[1] < self.num_stream:
                pad = self.num_stream - this_seq.shape[1]
                this_seq = np.pad(this_seq, ((0, 0), (0, pad)))
            seq.append(this_seq)

            if conti_feat is not None:
                length, feat = conti_feat
                conti_feats.append((this_io, accum_length, length, feat))

            if loss_mask.shape[1] < self.num_stream:
                pad = self.num_stream - loss_mask.shape[1]
                loss_mask = np.pad(loss_mask, ((0, 0), (0, pad)))
            loss_masks.append(loss_mask * apply_loss)
            accum_length += this_seq.shape[0]

            seq.append(self.special_token("<|eot|>" if apply_eot else "<|eos|>"))
            loss_masks.append(smask)
            accum_length += 1

        if self.is_train and rng.random() < self.audio_cfg:
            seq, loss_masks, conti_feats = self._apply_cfg(
                seq, loss_masks, conti_feats, messages, rng
            )

        return {
            "sequence": np.concatenate(seq, axis=0),
            "loss_mask": np.concatenate(loss_masks, axis=0),
            "conti_feats": conti_feats,
        }

    def build_inference_prompt(self, task: str, data_dict: dict):
        """Prompt for generation: bos + user/system segments + the
        assistant role/modality header, WITHOUT assistant content
        (mirrors the reference prefill: seqs + <|assistant|>,
        parallel.py:428-447).

        Returns (prompt [T, S], conti_feats).
        """
        messages = self._apply_chat_template(task, data_dict, allow_missing=True)
        # find the first assistant message — it defines the output modality
        out_io = None
        for role, io_name, _ in messages:
            if role == "assistant":
                out_io = io_name
                break
        seq = [self.special_token("<|bos|>")]
        conti_feats = []
        accum_length = 1
        prompt_msgs = [m for m in messages if m[0] != "assistant"]
        apply_eots = [
            m1[0] == m2[0] for m1, m2 in zip(prompt_msgs[:-1], prompt_msgs[1:])
        ] + [False]
        for apply_eot, (role, this_io, this_data) in zip(apply_eots, prompt_msgs):
            io = self.multimodal_io[this_io]
            seq.append(self.special_token(f"<|{role}|>"))
            seq.append(self.special_token(self._modality_token(task, io)))
            accum_length += 2
            this_seq, conti_feat, _ = io.preprocess(this_data)
            if io.is_discrete:
                bias = self.vocab_intervals[this_io][0][0]
                this_seq = np.where(
                    this_seq == self.pad_id, self.pad_id, this_seq + bias
                )
            if this_seq.shape[1] < self.num_stream:
                this_seq = np.pad(
                    this_seq, ((0, 0), (0, self.num_stream - this_seq.shape[1]))
                )
            seq.append(this_seq)
            if conti_feat is not None:
                length, feat = conti_feat
                conti_feats.append((this_io, accum_length, length, feat))
            accum_length += this_seq.shape[0]
            seq.append(self.special_token("<|eot|>" if apply_eot else "<|eos|>"))
            accum_length += 1

        seq.append(self.special_token("<|assistant|>"))
        if out_io is not None:
            io = self.multimodal_io[out_io]
            seq.append(self.special_token(self._modality_token(task, io)))
        return np.concatenate(seq, axis=0), conti_feats

    def _apply_cfg(self, seq, loss_masks, conti_feats, messages, rng):
        """Audio-CFG dropout (ualm_job.py:540-568): keep one random
        assistant-audio segment, zero every other segment and the BOS."""
        audio_idx = [
            i
            for i, (role, io_name, _) in enumerate(messages)
            if role == "assistant" and io_name == self.audio_output
        ]
        if not audio_idx:
            return seq, loss_masks, conti_feats
        keep = audio_idx[rng.integers(len(audio_idx))]
        for i in range(len(messages)):
            if i == keep:
                continue
            for j in range(4):
                k = i * 4 + j + 1
                seq[k] = seq[k] * 0
                loss_masks[k] = loss_masks[k] * 0
        seq[0] = seq[0] * 0
        loss_masks[0] = loss_masks[0] * 0
        conti_feats = [f for f in conti_feats if f[0] == self.audio_output]
        return seq, loss_masks, conti_feats

    # -- batch collation (ualm_job.py:219-309) --

    def collate_fn(self, data_lst, rng: np.random.Generator | None = None):
        rng = rng or np.random.default_rng()
        out = {"keys": []}
        processed = []
        for key, data_dict in data_lst:
            try:
                processed.append(self.preprocessing(key, data_dict, rng))
                out["keys"].append(key)
            except Exception as e:  # bad-sample drop (ualm_job.py:237-250)
                print(f"Error <{e}> processing sample <{key}>")
        if not processed:
            raise ValueError("no valid samples after preprocessing")

        seqs = [d["sequence"] for d in processed]
        masks = [d["loss_mask"] for d in processed]
        seq_starts = np.cumsum([0] + [len(s) for s in seqs])

        if self.batchfy_method == "bucket":
            out["seqs"], _ = pad_list(seqs)
            out["loss_masks"], _ = pad_list(masks)
        elif self.batchfy_method == "pack":
            out["seqs"] = np.concatenate(seqs, axis=0)[None]
            out["loss_masks"] = np.concatenate(masks, axis=0)[None]
            out["position_ids"] = np.concatenate(
                [np.arange(len(s)) for s in seqs]
            )[None]
        else:
            raise NotImplementedError(self.batchfy_method)

        conti = {}
        for b_idx, (d, start0) in enumerate(zip(processed, seq_starts[:-1])):
            for this_io, start, length, feat in d["conti_feats"]:
                bi, st = (0, start + start0) if self.batchfy_method == "pack" else (b_idx, start)
                conti.setdefault(this_io, ([], []))
                conti[this_io][0].append((bi, st, length))
                conti[this_io][1].append(feat)
        for this_io, (indices, feats) in conti.items():
            out[f"{this_io}_indices"] = np.asarray(indices, np.int64)
            out[f"{this_io}_feats"], out[f"{this_io}_lengths"] = pad_list(feats)
        return out
