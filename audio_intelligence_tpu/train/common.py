"""Shared training primitives.

- EMA with warmup-power schedule (ema-pytorch semantics used by ETTA:
  β .9999, power 3/4 — training/diffusion.py:266-274).
- InverseLR schedule (ETTA training/utils.py:31-68).
- logit-normal timestep sampling (training/diffusion.py:407-411).
- NaN-guarded optimizer updates (the ETTA EarlyStoppingCallback:25-64 /
  A2SB NaN-skip analogue for fully-compiled steps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def ema_decay_schedule(
    step: jax.Array, beta: float = 0.9999, power: float = 0.75, gamma: float = 1.0
) -> jax.Array:
    """ema-pytorch decay: clamp(1 − (1 + step/gamma)^(−power), 0, beta)."""
    value = 1.0 - (1.0 + step / gamma) ** (-power)
    return jnp.clip(value, 0.0, beta)


def ema_update(ema_params, params, step, beta: float = 0.9999, power: float = 0.75):
    """EMA with the warmup-power decay schedule; fully jittable."""
    decay = ema_decay_schedule(step.astype(jnp.float32), beta, power)
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)


def inverse_lr(
    base_lr: float,
    inv_gamma: float = 1e6,
    power: float = 0.5,
    warmup: float = 0.99,
) -> optax.Schedule:
    """InverseLR: lr · (1 + step/inv_gamma)^(−power), with an exponential
    warmup factor (1 − warmup^(step+1)) (ETTA training/utils.py:31-68)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = 1.0 - warmup ** (step + 1.0) if warmup > 0 else 1.0
        return base_lr * warm * (1.0 + step / inv_gamma) ** (-power)

    return schedule


def logit_normal_sample(key, shape, mean: float = 0.0, std: float = 1.0):
    """t = sigmoid(𝒩(mean, std)) — the RF timestep sampler
    (training/diffusion.py:407-411)."""
    return jax.nn.sigmoid(mean + std * jax.random.normal(key, shape))


def accumulate_gradients(loss_fn, params, microbatches, has_aux: bool = False):
    """Gradient accumulation over a leading microbatch axis via lax.scan.

    Replaces the reference's Lightning ``accumulate_grad_batches`` /
    DeepSpeed ``gradient_accumulation_steps``: ``microbatches`` is a pytree
    whose leaves have shape [n_micro, ...]; returns (mean_loss, mean_grads
    [, aux of the last microbatch]). Memory stays at one microbatch's
    activations.
    """
    grad_fn = jax.value_and_grad(loss_fn, has_aux=has_aux)

    def step(carry, micro):
        acc_loss, acc_grads = carry
        if has_aux:
            (loss, aux), grads = grad_fn(params, micro)
        else:
            loss, grads = grad_fn(params, micro)
            aux = None
        acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
        return (acc_loss + loss, acc_grads), aux

    n = jax.tree.leaves(microbatches)[0].shape[0]
    zero_grads = jax.tree.map(jnp.zeros_like, params)
    (total_loss, total_grads), auxes = jax.lax.scan(
        step, (jnp.zeros((), jnp.float32), zero_grads), microbatches
    )
    mean_loss = total_loss / n
    mean_grads = jax.tree.map(lambda g: g / n, total_grads)
    if has_aux:
        return mean_loss, mean_grads, auxes
    return mean_loss, mean_grads


def remat(apply_fn, policy: str = "nothing"):
    """Activation rematerialization for a model apply fn.

    Replaces the reference's activation checkpointing
    (UALM ualm_job.py:153-154 gradient_checkpointing_enable, ETTA
    checkpoint() helpers). policies: 'nothing' (recompute everything),
    'dots' (save matmul outputs), 'none' (no remat).
    """
    if policy == "none":
        return apply_fn
    policies = {
        "nothing": jax.checkpoint_policies.nothing_saveable,
        "dots": jax.checkpoint_policies.checkpoint_dots,
    }
    return jax.checkpoint(apply_fn, policy=policies[policy])


def nan_safe_update(tx: optax.GradientTransformation):
    """Wrap an optax transform so non-finite global grads skip the step
    (update zeroed, optimizer state preserved)."""

    def init(params):
        return tx.init(params)

    def update(grads, state, params=None):
        updates, new_state = tx.update(grads, state, params)
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(gnorm)
        updates = jax.tree.map(lambda u: jnp.where(ok, u, 0.0), updates)
        new_state = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_state, state
        )
        return updates, new_state

    return optax.GradientTransformation(init, update)
