"""A2SB bridge training: loss, optimizer, and the jitted train step.

Functional re-design of ``STFTBridgeModel.training_step``
(A2SB/A2SB_lightning_module.py:374-402) and ``configure_optimizers``
(:239-242): t ~ U[t_min, t_max] (T-partitioned fine-tuning uses sub-ranges,
README t-split recipe), x_t ~ q(x_t|x₀,x₁), v-target masked MSE, RAdam with
decoupled weight decay, grad-clip 0.5, NaN-batch skip (update zeroed when
the loss is non-finite, instead of the reference's Python-side `return None`).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from audio_intelligence_tpu.models.a2sb.bridge import BridgeSchedule
from audio_intelligence_tpu.models.a2sb.unet import sinusoidal_temporal_embedding
from audio_intelligence_tpu.ops.losses import masked_mse


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(
    learning_rate: float = 8e-5,
    weight_decay: float = 1e-8,
    grad_clip: float = 0.5,
) -> optax.GradientTransformation:
    """RAdam + decoupled weight decay + global-norm clipping
    (flagship lr 8e-5, clip 0.5: A2SB/configs/pretrain.yaml:30,80)."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.scale_by_radam(),
        optax.add_decayed_weights(weight_decay),
        optax.scale(-learning_rate),
    )


def bridge_loss(
    params,
    apply_fn,
    schedule: BridgeSchedule,
    key: jax.Array,
    batch: dict,
    t_min: float = 0.0,
    t_max: float = 1.0,
    n_timestep_channels: int = 128,
    use_ot_ode: bool = False,
) -> jax.Array:
    """Masked bridge v-loss for one batch.

    batch: {'x_0_clean', 'x_0_corrupted', 'loss_mask'} in NHWC.
    """
    x_0 = batch["x_0_clean"]
    x_1 = batch["x_0_corrupted"]
    mask = batch.get("loss_mask")

    k_t, k_q, k_drop = jax.random.split(key, 3)
    t = jax.random.uniform(k_t, (x_0.shape[0],), minval=t_min, maxval=t_max)
    x_t = schedule.q_sample(k_q, t, x_0, x_1, ot_ode=use_ot_ode)
    t_emb = sinusoidal_temporal_embedding(t, n_timestep_channels)

    vf_out = apply_fn(
        {"params": params}, x_t, t_emb, deterministic=False, rngs={"dropout": k_drop}
    )
    target = jax.lax.stop_gradient(schedule.v_target(t, x_t, x_0))
    return masked_mse(vf_out, target, mask)


def make_train_step(
    apply_fn,
    schedule: BridgeSchedule,
    tx: optax.GradientTransformation,
    t_min: float = 0.0,
    t_max: float = 1.0,
    use_ot_ode: bool = False,
    n_timestep_channels: int = 128,
):
    """Build the single jitted train step (donatable state)."""

    def train_step(state: TrainState, key: jax.Array, batch: dict):
        loss, grads = jax.value_and_grad(bridge_loss)(
            state.params,
            apply_fn,
            schedule,
            key,
            batch,
            t_min=t_min,
            t_max=t_max,
            n_timestep_channels=n_timestep_channels,
            use_ot_ode=use_ot_ode,
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        # NaN-batch skip (A2SB_lightning_module.py:392-394): zero the update
        # and keep optimizer state when the loss is non-finite.
        ok = jnp.isfinite(loss)
        updates = jax.tree.map(lambda u: jnp.where(ok, u, 0.0), updates)
        new_opt_state = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_opt_state, state.opt_state
        )
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return TrainState(new_params, new_opt_state, state.step + 1), metrics

    return train_step


def make_validation_fn(
    apply_fn,
    schedule: BridgeSchedule,
    val_batch: dict,
    n_steps: int = 25,
    t_start: float = 1.0,
    t_end: float = 0.05,
    n_fft: int = 2048,
    hop_length: int = 512,
    n_timestep_channels: int = 128,
):
    """Sampling validation — ``validation_step`` semantics
    (A2SB/A2SB_lightning_module.py:433-476): run the 25-step bridge
    sampler on a fixed validation batch, vocode prediction and ground
    truth through the inverse transform chain (power ^4 → +DC →
    mag/cos/sin → complex → iSTFT), and report LSD + SI-SDR (the
    ssr_eval AudioMetrics equivalents, ops/metrics.py). The whole pass is
    one jitted function of the params; returns ``valid_fn(state) → dict``
    for ``train.loop.run_training``'s ``valid_fn`` hook.

    ``val_batch``: {"x_0_clean", "x_0_corrupted", "loss_mask"} as produced
    by the A2SB dataset ([B, H, W, 3] spectrograms, mask [B, H, W, 1]
    with 1 = region to restore).
    """
    from audio_intelligence_tpu import ops
    from audio_intelligence_tpu.models.a2sb.sampler import bridge_sample
    from audio_intelligence_tpu.ops.metrics import log_spectral_distance, si_sdr

    clean = jnp.asarray(val_batch["x_0_clean"])
    corrupted = jnp.asarray(val_batch["x_0_corrupted"])
    mask = jnp.broadcast_to(jnp.asarray(val_batch["loss_mask"]), clean.shape)

    def vocode(msp_hwc):
        # [H, W, 3] power-scaled mag/cos/sin without DC → wav [T]
        m = jnp.moveaxis(msp_hwc, -1, 0)
        m = ops.power_scale_spectrogram(m, power=4.0, channels=(0,))
        m = ops.add_dc_term(m)
        spec = ops.mag_inst_phase_to_complex(m)
        return ops.istft(spec, n_fft=n_fft, hop_length=hop_length)

    @jax.jit
    def run(params, key):
        def vf(x_t, t):
            te = sinusoidal_temporal_embedding(
                jnp.broadcast_to(t, (x_t.shape[0],)), n_timestep_channels
            ).astype(x_t.dtype)
            return apply_fn({"params": params}, x_t, te)

        t_steps = jnp.linspace(t_start, t_end, n_steps + 1).astype(clean.dtype)
        pred = bridge_sample(vf, schedule, key, corrupted, t_steps, mask=mask)
        wav_pred = jax.vmap(vocode)(pred.astype(jnp.float32))
        wav_ref = jax.vmap(vocode)(clean.astype(jnp.float32))
        return {
            "lsd": log_spectral_distance(
                wav_pred, wav_ref, n_fft=n_fft, hop_length=hop_length
            ),
            "si_sdr": si_sdr(wav_pred, wav_ref),
            "mse": jnp.mean((pred - clean) ** 2),
        }

    def valid_fn(state: TrainState):
        key = jax.random.fold_in(jax.random.PRNGKey(17), state.step)
        return {k: float(v) for k, v in run(state.params, key).items()}

    return valid_fn
