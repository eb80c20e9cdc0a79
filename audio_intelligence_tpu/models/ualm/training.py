"""UALM training: optimizer, schedule, and the sharded train step.

Replaces the DeepSpeed stack (UALM/trainer/deepspeed_trainer.py:33-385 +
conf/deepspeed.json): AdamW (lr 1e-4, β (0.9, 0.95), wd 3e-7) with
warmup-cosine (2000 warmup / 500k total), grad-clip 1.0, bf16 compute,
prefix-based parameter freezing, ZeRO-style sharding via the GSPMD
``fsdp`` axis instead of optimizer-state partitioning code.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax

from audio_intelligence_tpu.models.ualm.lm import ParallelLM, multistream_loss
from audio_intelligence_tpu.train.common import nan_safe_update


class UALMTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def warmup_cosine_lr(
    base_lr: float = 1e-4,
    warmup_steps: int = 2000,
    total_steps: int = 500000,
    min_ratio: float = 0.0,
) -> optax.Schedule:
    """WarmupCosineLR (conf/deepspeed.json scheduler)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=base_lr,
        warmup_steps=warmup_steps,
        decay_steps=total_steps,
        end_value=base_lr * min_ratio,
    )


def freeze_by_prefix(tx: optax.GradientTransformation, params, freeze_prefixes: Sequence[str]):
    """Zero updates for parameters whose path starts with a frozen prefix
    (deepspeed_trainer.py:77-82 param freezing)."""
    if not freeze_prefixes:
        return tx

    def label(path, _):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        return (
            "frozen"
            if any(name.startswith(p) or f"/{p}" in name for p in freeze_prefixes)
            else "train"
        )

    labels = jax.tree_util.tree_map_with_path(label, params)
    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, labels
    )


def make_ualm_optimizer(
    params=None,
    lr: float = 1e-4,
    betas=(0.9, 0.95),
    weight_decay: float = 3e-7,
    warmup_steps: int = 2000,
    total_steps: int = 500000,
    grad_clip: float = 1.0,
    freeze_prefixes: Sequence[str] = (),
):
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(
            warmup_cosine_lr(lr, warmup_steps, total_steps),
            b1=betas[0],
            b2=betas[1],
            weight_decay=weight_decay,
        ),
    )
    if freeze_prefixes and params is not None:
        tx = freeze_by_prefix(tx, params, freeze_prefixes)
    return nan_safe_update(tx)


def make_ualm_train_step(
    model: ParallelLM,
    tx,
    loss_intervals,
    time_chunk: int | None = None,
):
    """One jitted step over a collated batch (seqs, loss_masks[, position_ids]).

    ``time_chunk``: stream the CE over time blocks (see multistream_loss) —
    required at the reference's 16000-token bucket, where the full-vocab
    logits alone exceed one chip's HBM."""

    def step(state: UALMTrainState, batch):
        def loss_fn(params):
            variables = {"params": params}
            loss, stats = multistream_loss(
                model,
                variables,
                batch["seqs"],
                batch["loss_masks"],
                loss_intervals,
                position_ids=batch.get("position_ids"),
                time_chunk=time_chunk,
            )
            return loss, stats

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(stats)
        metrics["grad_norm"] = optax.global_norm(grads)
        return UALMTrainState(params, opt_state, state.step + 1), metrics

    return step
