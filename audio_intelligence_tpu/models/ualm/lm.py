"""Parallel multi-stream LM over the backbone.

TPU-native re-design of ``ParallelHFModel``
(UALM/models/ualm/lm/parallel.py:31-384):

- unified-vocab embedding; multi-stream input_ids [B, T, S] embedded per
  stream and **summed** (:260),
- continuous-IO features projected by per-IO linear adaptors and
  scattered over their (batch, start, length) spans (:264-283),
- per-stream output representations h + stream_emb (stream 0 unshifted,
  :204-209),
- loss: stream 0 full-vocab CE (pad=0 ignored); streams 1+ **interval
  softmax** over each discrete IO's vocab slice (:286-384). The
  reference's boolean ``masked_scatter`` becomes a dense
  where-masked formulation — identical value, static shapes, shards
  cleanly under GSPMD.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from audio_intelligence_tpu.models.ualm.backbone import (
    BackboneConfig,
    QwenBackbone,
    KVCache,
)


class ParallelLM(nn.Module):
    """Multi-stream multimodal LM.

    vocab_size: unified vocabulary size; num_stream: parallel streams;
    conti_dims: {io_name: feature_dim} for continuous adaptors.
    """

    cfg: BackboneConfig
    vocab_size: int
    num_stream: int = 8
    conti_dims: Dict[str, int] | None = None

    def setup(self):
        # raw params (not submodules) so they are created at init even
        # though __call__ doesn't touch them (flax only materializes
        # submodule params on the traced path)
        self.embed_tokens = nn.Embed(self.vocab_size, self.cfg.hidden_size)
        self.backbone = QwenBackbone(self.cfg)
        self.stream_emb = nn.Embed(self.num_stream, self.cfg.hidden_size)
        self.lm_head_kernel = self.param(
            "lm_head_kernel",
            nn.initializers.lecun_normal(),
            (self.cfg.hidden_size, self.vocab_size),
        )
        if self.conti_dims:
            self.adaptor_kernels = {
                name: (
                    self.param(
                        f"adaptor_{name}_kernel",
                        nn.initializers.lecun_normal(),
                        (dim, self.cfg.hidden_size),
                    ),
                    self.param(
                        f"adaptor_{name}_bias",
                        nn.initializers.zeros,
                        (self.cfg.hidden_size,),
                    ),
                )
                for name, dim in self.conti_dims.items()
            }

    def embed(self, input_ids, conti: Dict[str, tuple] | None = None):
        """input_ids [B, T, S] (+ optional continuous spans) → [B, T, H].

        conti: {io_name: (indices [N,3], feats [N, L, D], lengths [N])} —
        adaptor-projected features overwrite the embeddings on their spans
        (parallel.py:264-283), expressed as a scatter via segment masks.
        """
        embeds = self.embed_tokens(input_ids).sum(axis=2)
        if conti:
            for name, (indices, feats, lengths) in conti.items():
                w, bias = self.adaptor_kernels[name]
                proj = feats @ w + bias  # [N, L, H]
                t = embeds.shape[1]
                for n in range(indices.shape[0]):
                    bidx, start, length = indices[n, 0], indices[n, 1], indices[n, 2]
                    # mask-based overwrite spanning [start, start+length)
                    pos = jnp.arange(t)
                    span = (pos >= start) & (pos < start + length)
                    gathered = proj[n][jnp.clip(pos - start, 0, proj.shape[1] - 1)]
                    embeds = embeds.at[bidx].set(
                        jnp.where(span[:, None], gathered, embeds[bidx])
                    )
        return embeds

    def hidden_streams(self, hidden):
        """[B, T, H] → [B, T, S, H]: add stream embeddings (stream 0 raw)."""
        se = self.stream_emb(jnp.arange(self.num_stream))
        se = se.at[0].set(0.0)
        return hidden[:, :, None, :] + se[None, None, :, :]

    def __call__(self, input_ids, position_ids=None, conti=None):
        """→ per-stream hidden states [B, T, S, H] (logits on demand)."""
        embeds = self.embed(input_ids, conti)
        hidden = self.backbone(embeds, position_ids)
        return self.hidden_streams(hidden)

    def decode_step(
        self, input_ids, position_ids, cache: KVCache, cache_positions=None,
        cache_segments=None, conti=None,
    ):
        """One cached forward: returns ([B, T, S, H], new_cache)."""
        embeds = self.embed(input_ids, conti)
        hidden, new_cache = self.backbone(
            embeds, position_ids, cache, cache_positions, cache_segments
        )
        return self.hidden_streams(hidden), new_cache

    def logits_full(self, stream_hidden):
        """Full-vocab logits for stream 0: [B, T, V]."""
        return stream_hidden[:, :, 0, :] @ self.lm_head_kernel

    def logits_interval(self, stream_hidden, start: int, end: int):
        """Logits for streams 1+ against vocab slice [start, end)."""
        w = self.lm_head_kernel[:, start:end]
        return jnp.einsum("btsh,hv->btsv", stream_hidden[:, :, 1:, :], w)


def _positionwise_ce(model, variables, h, targets, loss_intervals, compute_acc):
    """Per-position CE [B, Tc, S] (+ correctness [B, Tc, S]) for a block of
    shifted hidden states h [B, Tc, S, H] / targets [B, Tc, S]."""
    # stream 0: full vocab CE, pad id 0 ignored
    logits0 = model.apply(variables, h, method=ParallelLM.logits_full)
    logits0 = logits0.astype(jnp.float32)
    tgt0 = targets[:, :, 0]
    lse = jax.nn.logsumexp(logits0, axis=-1)
    picked = jnp.take_along_axis(logits0, tgt0[..., None], axis=-1)[..., 0]
    ce0 = jnp.where(tgt0 == 0, 0.0, lse - picked)
    acc0 = jnp.argmax(logits0, -1) == tgt0 if compute_acc else None

    # streams 1+: interval softmax per discrete-IO slice. Accumulate with
    # where-sums (intervals are disjoint) — no scatters, which the TPU
    # compiler handles far faster than .at[].set chains.
    resid_t = targets[:, :, 1:]
    ce_resid = jnp.zeros(resid_t.shape, jnp.float32)
    acc_resid = jnp.zeros(resid_t.shape, bool) if compute_acc else None
    for start, end in loss_intervals:
        in_int = (resid_t >= start) & (resid_t < end)
        logits_i = model.apply(
            variables, h, start, end, method=ParallelLM.logits_interval
        ).astype(jnp.float32)
        tgt_rel = jnp.clip(resid_t - start, 0, end - start - 1)
        lse_i = jax.nn.logsumexp(logits_i, axis=-1)
        picked_i = jnp.take_along_axis(logits_i, tgt_rel[..., None], axis=-1)[..., 0]
        ce_resid = ce_resid + jnp.where(in_int, lse_i - picked_i, 0.0)
        if compute_acc:
            acc_resid = acc_resid | (in_int & (jnp.argmax(logits_i, -1) == tgt_rel))

    ce = jnp.concatenate([ce0[..., None], ce_resid], axis=2)
    acc = (
        jnp.concatenate([acc0[..., None], acc_resid], axis=2)
        if compute_acc
        else None
    )
    return ce, acc


def multistream_loss(
    model: ParallelLM,
    variables,
    input_ids: jax.Array,
    loss_mask: jax.Array,
    loss_intervals: Sequence[Tuple[int, int]],
    position_ids=None,
    conti=None,
    compute_acc: bool = False,
    time_chunk: int | None = None,
):
    """The UALM loss (parallel.py:286-384), dense-masked formulation.

    Returns (loss, stats). Normalization matches the reference:
    Σ(loss·mask) / Σ(mask[..., 0] ≠ 0).

    ``time_chunk``: stream the CE over time blocks with a remat'd
    ``lax.scan`` — the stream-0 full-vocab f32 logits are [B, T, 152k]
    ≈ 10 GB at the reference's 16k bucket, which no single chip holds.
    Chunking bounds logit memory at O(time_chunk · V) in both directions
    (the reference instead splits loss_intervals ≤ 13192,
    parallel.py:151-173 — same idea on the vocab axis; the time axis
    chunks evenly for packed batches and keeps each block's matmul MXU-
    shaped). Identical value to the unchunked path (test-gated).
    """
    stream_hidden = model.apply(variables, input_ids, position_ids, conti)
    h = stream_hidden[:, :-1]
    targets = input_ids[:, 1:]
    mask = loss_mask[:, 1:]

    if time_chunk and h.shape[1] > time_chunk:
        b, tlen = h.shape[0], h.shape[1]
        pad = (-tlen) % time_chunk
        if pad:
            h = jnp.pad(h, ((0, 0), (0, pad), (0, 0), (0, 0)))
            targets = jnp.pad(targets, ((0, 0), (0, pad), (0, 0)))
            mask = jnp.pad(mask, ((0, 0), (0, pad), (0, 0)))
        n = (tlen + pad) // time_chunk
        s = targets.shape[-1]

        def split(x):
            return jnp.moveaxis(
                x.reshape((b, n, time_chunk) + x.shape[2:]), 1, 0
            )

        @jax.checkpoint
        def body(carry, xs):
            hc, tc, mc = xs
            ce, acc = _positionwise_ce(
                model, variables, hc, tc, loss_intervals, compute_acc
            )
            ce = ce * mc
            valid = (mc != 0.0).astype(jnp.float32)
            loss_sums, valid_sums, acc_sums = carry
            loss_sums = loss_sums + jnp.sum(ce, axis=(0, 1))
            valid_sums = valid_sums + jnp.sum(valid, axis=(0, 1))
            if compute_acc:
                acc_sums = acc_sums + jnp.sum(acc * valid, axis=(0, 1))
            return (loss_sums, valid_sums, acc_sums), None

        init = (
            jnp.zeros((s,), jnp.float32),
            jnp.zeros((s,), jnp.float32),
            jnp.zeros((s,), jnp.float32),
        )
        (loss_sums, valid_sums, acc_sums), _ = jax.lax.scan(
            body, init, (split(h), split(targets), split(mask))
        )
        count0 = valid_sums[0]
        total = jnp.sum(loss_sums) / jnp.maximum(count0, 1.0)
        stats = {"loss": total}
        per_stream = loss_sums / jnp.maximum(valid_sums, 1.0)
        for k in range(s):
            stats[f"ce_q{k}"] = per_stream[k]
        if compute_acc:
            stats["acc"] = jnp.sum(acc_sums) / jnp.maximum(jnp.sum(valid_sums), 1.0)
        return total, stats

    ce, acc = _positionwise_ce(
        model, variables, h, targets, loss_intervals, compute_acc
    )
    loss = ce * mask
    count0 = jnp.sum((mask[:, :, 0] != 0.0).astype(jnp.float32))
    total = jnp.sum(loss) / jnp.maximum(count0, 1.0)
    stats = {"loss": total}
    # per-stream (per-codebook) CE, the reference LM trainer's
    # ce_per_codebook diagnostics (ETTA training/lm.py:84-117): mean CE over
    # that stream's valid positions
    valid = (mask != 0.0).astype(jnp.float32)
    per_stream = jnp.sum(loss, axis=(0, 1)) / jnp.maximum(
        jnp.sum(valid, axis=(0, 1)), 1.0
    )
    for k in range(per_stream.shape[0]):
        stats[f"ce_q{k}"] = per_stream[k]
    if compute_acc:
        count = (mask != 0.0).astype(jnp.float32)
        stats["acc"] = jnp.sum(acc * count) / jnp.maximum(jnp.sum(count), 1.0)
    return total, stats
