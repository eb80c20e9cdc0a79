"""Autoregressive multi-stream decoding with KV cache, CFG, and
restricted decoding.

TPU-native re-design of the reference inference stack
(UALM/models/ualm/lm/parallel.py:387-644):

- ``prepare_inference``-style restricted-decoding masks: during audio
  generation stream s may only emit tokens from its own vocab interval;
  stream 0 may additionally emit <|eos|>/<|eot|> (:535-568),
- CFG via a duplicated zeroed-context branch: the unconditional row's KV
  cache is prefillled from zeroed embeddings (:610-644), logits combined
  as uncond + cfg·(cond − uncond) (:489-492),
- per-step top-k + temperature sampling per stream (:599-608),
- the whole ≤max_steps loop is one ``lax.scan`` (the reference re-enters
  Python + HF DynamicCache every token).

Flagship inference config: audio ≤1024 steps, top-k 20, temperature 0.8,
CFG 3 (UALM recipes conf/inference.yaml).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audio_intelligence_tpu.models.ualm.backbone import KVCache
from audio_intelligence_tpu.models.ualm.lm import ParallelLM


def restricted_logit_mask(
    vocab_size: int,
    stream_intervals: Sequence[Tuple[int, int]],
    eos_ids: Sequence[int] = (),
) -> np.ndarray:
    """[S, V] additive mask: stream s restricted to its interval
    (+ eos ids on stream 0)."""
    s = len(stream_intervals)
    mask = np.full((s, vocab_size), -1e9, np.float32)
    for i, (start, end) in enumerate(stream_intervals):
        mask[i, start:end] = 0.0
    for eid in eos_ids:
        mask[0, eid] = 0.0
    return mask


def topk_temperature_sample(key, logits, top_k: int = 20, temperature: float = 0.8):
    """logits [..., V] → token ids; top-k filter then categorical."""
    v = logits.shape[-1]
    k = min(top_k, v)
    kth = jnp.sort(logits, axis=-1)[..., -k][..., None]
    filtered = jnp.where(logits >= kth, logits, -1e9)
    return jax.random.categorical(key, filtered / jnp.maximum(temperature, 1e-6))


def top_p_sample(key, logits, top_p: float = 0.9, temperature: float = 1.0):
    """Nucleus sampling (ETTA models/utils.py top-p parity): keep the
    smallest prefix of the sorted distribution whose mass ≥ top_p."""
    logits = logits / jnp.maximum(temperature, 1e-6)
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while the mass BEFORE them is < top_p (always ≥ 1 token)
    keep_sorted = (cum - probs) < top_p
    # threshold = smallest kept logit
    thresh = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    filtered = jnp.where(logits >= thresh, logits, -1e9)
    return jax.random.categorical(key, filtered)


def generate_segment(
    model: ParallelLM,
    variables,
    prompt_ids: jax.Array,  # [B, T, S] (ending with <|assistant|><|modality|>)
    max_steps: int,
    logit_mask: jax.Array,  # [S, V] restricted-decoding additive mask
    eos_id: int,
    key: jax.Array,
    cfg_scale: float = 1.0,
    top_k: int = 20,
    temperature: float = 0.8,
    max_cache_len: int | None = None,
    stream_intervals: Sequence[Tuple[int, int]] | None = None,
    prompt_lengths: jax.Array | None = None,
):
    """Generate up to max_steps multi-stream frames after the prompt.

    Returns (tokens [B, max_steps, S], done_mask [B, max_steps] — True on
    frames at/after the stream-0 eos).

    ``stream_intervals`` [(start, end)] × S (static): the narrow-decode
    fast path for restricted decoding — instead of projecting the full
    152k-vocab lm_head (the reference computes all-vocab logits then
    masks, parallel.py:535-608; that matrix read is ~470 MB/token here),
    slice each stream's codebook columns, run top-k/sampling locally, and
    offset the sampled index back. Exact when the restriction IS the
    interval (the inference.yaml audio-generation case); ``logit_mask``
    still applies within the interval (sliced per stream).

    ``prompt_lengths`` [B] (optional): per-row valid prompt length for
    LEFT-padded batches — the sharded batch-inference driver
    (models/ualm/eval.py) packs differently-sized test samples into one
    device batch. Pad slots carry cache segment −1 / query segment 0, so
    real tokens never attend to padding (the reference instead shards
    whole samples across mp.spawn workers, scripts/inference.py:156-304);
    with equal lengths this is bit-identical to the unpadded path.
    """
    b, t, s = prompt_ids.shape
    cfg = cfg_scale != 1.0
    max_cache_len = max_cache_len or (t + max_steps + 1)
    # CFG runs the cond and uncond branches as ONE batch of 2B: decode at
    # small batch is weight-streaming-bound (the 1.5B backbone reads its
    # full parameters from HBM every token), so batching the branches
    # halves the per-token weight traffic vs two sequential forwards
    # (reference :489-492 also runs them separately; this is exact math,
    # just batched).
    nb = 2 * b if cfg else b

    padded = prompt_lengths is not None
    if padded:
        pad_len = t - prompt_lengths.astype(jnp.int32)  # [B]
        pad2 = jnp.concatenate([pad_len, pad_len], 0) if cfg else pad_len
        slots = jnp.arange(max_cache_len)[None, :]
        # cache layout: slots < pad are padding (segment −1, never
        # visible); real tokens restart positions at 0 from slot pad
        cache_pos = jnp.where(
            slots < pad2[:, None], slots, slots - pad2[:, None]
        )
        cache_seg = jnp.where(slots < pad2[:, None], -1, 0).astype(jnp.int32)
    else:
        cache_pos = cache_seg = None

    def prefill(ids):
        embeds = model.apply(variables, ids, method=ParallelLM.embed)
        if cfg:
            # second half = unconditional branch: the prompt context is
            # zeroed, generated tokens stay visible in both branches
            embeds = jnp.concatenate([embeds, jnp.zeros_like(embeds)], axis=0)
        cache = KVCache.init(
            model.cfg, nb, max_cache_len, dtype=embeds.dtype
        )
        if padded:
            idx = jnp.arange(t)[None, :]
            pos = jnp.where(idx < pad2[:, None], idx, idx - pad2[:, None])
            q_seg = jnp.where(idx < pad2[:, None], -1, 0).astype(jnp.int32)
            q_seg = jnp.broadcast_to(q_seg, (nb, t))
        else:
            pos = jnp.broadcast_to(jnp.arange(t), (nb, t))
            q_seg = None
        hidden, cache = model.apply(
            variables,
            embeds,
            pos,
            cache,
            method=lambda m, e, p, c: m.backbone(
                e, p, c, cache_positions=cache_pos, cache_segments=cache_seg,
                q_segments=q_seg,
            ),
        )
        stream_hidden = model.apply(
            variables, hidden[:, -1:], method=ParallelLM.hidden_streams
        )
        return stream_hidden, cache

    sh0, cache0 = prefill(prompt_ids)

    if stream_intervals is not None:
        assert len(stream_intervals) == s
        # column table per stream: its interval, plus eos appended for
        # stream 0 when it lives outside (parallel.py:535-568 — stream 0
        # may additionally emit the segment-end specials)
        cols = [list(range(st, en)) for st, en in stream_intervals]
        if not (stream_intervals[0][0] <= eos_id < stream_intervals[0][1]):
            cols[0] = cols[0] + [eos_id]
        max_w = max(len(c) for c in cols)
        col_tbl = np.zeros((s, max_w), np.int32)
        col_valid = np.zeros((s, max_w), bool)
        for i, c in enumerate(cols):
            col_tbl[i, : len(c)] = c
            col_valid[i, : len(c)] = True
        col_tbl = jnp.asarray(col_tbl)
        w_full = variables["params"]["lm_head_kernel"]  # [H, V]
        # [S, H, max_w] column gather done ONCE outside the scan
        w_sel = jnp.transpose(
            jnp.take(w_full.T, col_tbl.reshape(-1), axis=0).reshape(
                s, max_w, -1
            ),
            (0, 2, 1),
        )
        mask_sel = jnp.take_along_axis(logit_mask, col_tbl, axis=1)
        mask_sel = jnp.where(jnp.asarray(col_valid), mask_sel, -1e9)

    def logits_of(stream_hidden):
        """[N, 1, S, H] → [N, S, V|max_w] logits (narrow when intervals)."""
        if stream_intervals is not None:
            return jnp.einsum("bsh,shv->bsv", stream_hidden[:, 0], w_sel)
        w = variables["params"]["lm_head_kernel"]
        return jnp.einsum("bsh,hv->bsv", stream_hidden[:, 0], w)

    def combined_logits(sh):
        logits = logits_of(sh)
        if not cfg:
            return logits
        lc, lu = logits[:b], logits[b:]
        return lu + cfg_scale * (lc - lu)

    def step_fn(carry, step_key):
        sh, cache, done = carry
        if stream_intervals is not None:
            logits = combined_logits(sh) + mask_sel[None]
            local = topk_temperature_sample(step_key, logits, top_k, temperature)
            tokens = col_tbl[jnp.arange(s)[None, :], local]  # [B, S]
        else:
            logits = combined_logits(sh) + logit_mask[None]
            tokens = topk_temperature_sample(step_key, logits, top_k, temperature)
        # [B, S]; freeze to eos after done
        tokens = jnp.where(done[:, None], eos_id, tokens)
        new_done = done | (tokens[:, 0] == eos_id)

        ids = tokens[:, None, :]  # [B, 1, S]
        if cfg:
            ids = jnp.concatenate([ids, ids], axis=0)  # both branches see it
        if padded:
            pos = (cache.index - pad2)[:, None]
            q_seg = jnp.zeros((nb, 1), jnp.int32)
        else:
            pos = jnp.broadcast_to(cache.index[None, None], (nb, 1))
            q_seg = None

        embeds = model.apply(variables, ids, method=ParallelLM.embed)
        hidden, cache = model.apply(
            variables,
            embeds,
            pos,
            cache,
            method=lambda m, e, p, c: m.backbone(
                e, p, c, cache_positions=cache_pos, cache_segments=cache_seg,
                q_segments=q_seg,
            ),
        )
        sh = model.apply(variables, hidden, method=ParallelLM.hidden_streams)
        return (sh, cache, new_done), (tokens, new_done)

    done0 = jnp.zeros((b,), bool)
    keys = jax.random.split(key, max_steps)
    _, (tokens, done) = jax.lax.scan(step_fn, (sh0, cache0, done0), keys)
    return jnp.moveaxis(tokens, 0, 1), jnp.moveaxis(done, 0, 1)


def greedy_text_decode(
    model: ParallelLM,
    variables,
    prompt_ids: jax.Array,
    max_steps: int,
    eos_id: int,
    text_mask: jax.Array,
):
    """Greedy stream-0 text decoding (flagship text config: greedy)."""
    return generate_segment(
        model,
        variables,
        prompt_ids,
        max_steps,
        text_mask,
        eos_id,
        jax.random.PRNGKey(0),
        cfg_scale=1.0,
        top_k=1,
        temperature=1.0,
    )
