"""ETTA training loops: RF diffusion and the GAN-VAE two-optimizer loop.

Functional re-design of ETTA/stable_audio_tools/training/diffusion.py
(DiffusionCondTrainingWrapper:244-710) and training/autoencoders.py
(AutoencoderTrainingWrapper:29-388):

- Diffusion: t ~ logit-normal, RF target v = noise − x₀, CFG-dropout 0.1
  (zeroing the cross-attn cond per-sample), masked MSE, EMA (β .9999 power
  ¾), AdamW + InverseLR (lr 1e-4, inv_gamma 1e6, power .5, warmup .99 —
  etta_dit.json training block).
- VAE: generator step (MR-STFT sum/diff perceptual + adversarial 0.1 +
  feature-matching 5.0 + KL 1e-4) and discriminator step (hinge), strictly
  alternating after a warmup — expressed as two separately-jitted steps
  driven by step parity on host, exactly the reference's schedule without
  Python branching inside jit.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from audio_intelligence_tpu.train.common import (
    ema_update,
    inverse_lr,
    logit_normal_sample,
    nan_safe_update,
)
from audio_intelligence_tpu.models.etta.discriminators import (
    dac_gan_losses,
    encodec_gan_losses,
)
from audio_intelligence_tpu.ops.losses import sum_and_difference_stft_loss, multi_resolution_stft_loss


class DiffusionTrainState(NamedTuple):
    params: Any
    ema_params: Any
    opt_state: Any
    step: jax.Array


def make_diffusion_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 1e-3,
    betas=(0.9, 0.999),
    inv_gamma: float = 1e6,
    power: float = 0.5,
    warmup: float = 0.99,
):
    return nan_safe_update(
        optax.adamw(
            inverse_lr(lr, inv_gamma, power, warmup),
            b1=betas[0],
            b2=betas[1],
            weight_decay=weight_decay,
        )
    )


def sample_timesteps(
    key: jax.Array,
    batch: int,
    sampler: str = "logit_normal",
    mean: float = 0.0,
    std: float = 1.0,
) -> jax.Array:
    """t ∈ (0, 1): "uniform" (the reference draws Sobol quasi-random —
    plain uniform here; the estimator is unbiased either way) or
    "logit_normal" = sigmoid(N(mean, std)) (training/diffusion.py:407-411).
    """
    if sampler == "uniform":
        return jax.random.uniform(key, (batch,))
    if sampler == "logit_normal":
        return logit_normal_sample(key, (batch,), mean, std)
    raise ValueError(f"unknown timestep_sampler {sampler}")


def diffusion_targets(objective: str, latents, noise, t):
    """(x_t, target) per diffusion objective (training/diffusion.py:414-434):

    rectified_flow: α=1−t, σ=t,               target = ε − x₀
    v:              α=cos(t·π/2), σ=sin(t·π/2), target = ε·α − x₀·σ
    """
    tt = t.reshape((-1,) + (1,) * (latents.ndim - 1))
    if objective == "rectified_flow":
        alphas, sigmas = 1.0 - tt, tt
    elif objective == "v":
        alphas = jnp.cos(tt * jnp.pi / 2)
        sigmas = jnp.sin(tt * jnp.pi / 2)
    else:
        raise ValueError(f"unknown diffusion objective {objective}")
    x_t = alphas * latents + sigmas * noise
    target = noise * alphas - latents * sigmas
    return x_t, target


def diffusion_loss(
    params,
    dit_apply: Callable,
    key: jax.Array,
    latents: jax.Array,
    cross_attn_cond: jax.Array,
    cross_attn_mask: jax.Array,
    global_cond: jax.Array,
    cfg_dropout_prob: float = 0.1,
    timestep_sampler: str = "logit_normal",
    timestep_mean: float = 0.0,
    timestep_std: float = 1.0,
    objective: str = "rectified_flow",
    input_concat_cond: jax.Array | None = None,
):
    """Diffusion training loss (training/diffusion.py:336-510) for both
    the rectified-flow and v objectives.

    CFG dropout zeroes the whole cross-attn cond for a Bernoulli(p) subset
    of the batch (dit.py:295-305 semantics, keyed explicitly).
    """
    b = latents.shape[0]
    k_t, k_noise, k_drop, k_model = jax.random.split(key, 4)
    t = sample_timesteps(k_t, b, timestep_sampler, timestep_mean, timestep_std)
    noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
    x_t, target = diffusion_targets(objective, latents, noise, t)

    if cfg_dropout_prob > 0 and cross_attn_cond is not None:
        drop = jax.random.bernoulli(k_drop, cfg_dropout_prob, (b, 1, 1))
        cross_attn_cond = jnp.where(drop, 0.0, cross_attn_cond)

    kwargs = {}
    if input_concat_cond is not None:
        kwargs["input_concat_cond"] = input_concat_cond
    pred = dit_apply(
        {"params": params},
        x_t,
        t,
        cross_attn_cond,
        cross_attn_mask,
        global_cond,
        deterministic=False,
        rngs={"dropout": k_model},
        **kwargs,
    )
    return jnp.mean((pred - target) ** 2)


# backwards-compatible alias (rectified-flow defaults)
rf_loss = diffusion_loss


def per_sigma_loss_buckets(
    t: jax.Array, per_sample_loss: jax.Array, n_buckets: int = 10
) -> jax.Array:
    """Mean loss per timestep bucket (ETTA log_loss_info,
    training/diffusion.py:466-494 — the reference all_gathers across ranks;
    under GSPMD the mean is already global). Returns [n_buckets]."""
    idx = jnp.clip((t * n_buckets).astype(jnp.int32), 0, n_buckets - 1)
    sums = jnp.zeros(n_buckets).at[idx].add(per_sample_loss)
    counts = jnp.zeros(n_buckets).at[idx].add(1.0)
    return sums / jnp.maximum(counts, 1.0)


def make_diffusion_train_step(
    dit_apply: Callable,
    tx,
    cfg_dropout_prob: float = 0.1,
    objective: str = "rectified_flow",
    timestep_sampler: str = "logit_normal",
):
    def step(state: DiffusionTrainState, key, batch):
        loss, grads = jax.value_and_grad(diffusion_loss)(
            state.params,
            dit_apply,
            key,
            batch["latents"],
            batch["cross_attn_cond"],
            batch["cross_attn_mask"],
            batch["global_cond"],
            cfg_dropout_prob=cfg_dropout_prob,
            objective=objective,
            timestep_sampler=timestep_sampler,
            # diffusion_prior source latents ride input-concat
            input_concat_cond=batch.get("input_concat_cond"),
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema_params, params, state.step)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return DiffusionTrainState(params, ema, opt_state, state.step + 1), metrics

    return step


def make_inpaint_train_step(
    dit_apply: Callable,
    tx,
    mask_type: str = "random_mask",
    objective: str = "rectified_flow",
    timestep_sampler: str = "uniform",
    cfg_dropout_prob: float = 0.1,
    input_concat_order=("inpaint_masked_input", "inpaint_mask"),
    mask_kwargs: dict | None = None,
):
    """Inpainting diffusion training (DiffusionCondInpaintTrainingWrapper,
    training/diffusion.py:899-1481): draw a keep-mask (1 = visible) per
    batch element, condition the model on input-concat channels
    [masked_input ‖ mask] (order per ``input_concat_order``, matching the
    reference's config-driven input_concat_ids), and regress the usual
    objective targets over the FULL sequence. The DiT must be built with
    input_concat_dim = io_channels + 1.
    """
    from audio_intelligence_tpu.models.etta.inpaint_masks import (
        random_mask,
        speechflow_mask,
    )

    mk = mask_kwargs or {}

    def draw_mask(key, b, t):
        if mask_type == "random_mask":
            return random_mask(key, b, t, **mk)
        if mask_type == "speechflow_mask":
            return speechflow_mask(key, b, t, **mk)
        raise ValueError(f"unknown mask_type {mask_type}")

    def step(state: DiffusionTrainState, key, batch):
        latents = batch["latents"]
        b, t_len = latents.shape[0], latents.shape[1]
        k_mask, k_loss = jax.random.split(key)
        mask = draw_mask(k_mask, b, t_len)[..., None]  # [B, T, 1]
        masked_input = latents * mask
        parts = {"inpaint_masked_input": masked_input, "inpaint_mask": mask}
        concat = jnp.concatenate([parts[k] for k in input_concat_order], axis=-1)

        loss, grads = jax.value_and_grad(diffusion_loss)(
            state.params,
            dit_apply,
            k_loss,
            latents,
            batch.get("cross_attn_cond"),
            batch.get("cross_attn_mask"),
            batch.get("global_cond"),
            cfg_dropout_prob=cfg_dropout_prob,
            objective=objective,
            timestep_sampler=timestep_sampler,
            input_concat_cond=concat,
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema_params, params, state.step)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return DiffusionTrainState(params, ema, opt_state, state.step + 1), metrics

    return step


class VAETrainState(NamedTuple):
    gen_params: Any
    disc_params: Any
    ema_params: Any
    gen_opt: Any
    disc_opt: Any
    step: jax.Array


def make_vae_optimizers(
    gen_lr: float = 1.5e-4,
    disc_lr: float = 3e-4,
    betas=(0.8, 0.99),
    weight_decay: float = 1e-3,
    inv_gamma: float = 2e5,
    power: float = 0.5,
    warmup: float = 0.999,
    grad_clip: float = 500.0,
):
    """AdamW pairs with InverseLR + clip (etta_vae.json optimizer_configs)."""

    def make(lr):
        return nan_safe_update(
            optax.chain(
                optax.clip_by_global_norm(grad_clip),
                optax.adamw(
                    inverse_lr(lr, inv_gamma, power, warmup),
                    b1=betas[0],
                    b2=betas[1],
                    weight_decay=weight_decay,
                ),
            )
        )

    return make(gen_lr), make(disc_lr)


def recon_loss_decay_factor(step, decay_steps, mode: str = "linear"):
    """Reconstruction-loss decay schedule (autoencoders.py:156-211):
    ``linear`` ramps 1 → 0 over ``decay_steps``; ``exponential`` is
    exp(−4.6·step/decay_steps) (−4.6 ≈ ln 0.01: 1% at the horizon).
    ``step`` may be traced (the factor is computed inside the jitted
    gen step from ``state.step``)."""
    s = jnp.asarray(step, jnp.float32)
    if mode == "linear":
        return jnp.maximum(1.0 - s / decay_steps, 0.0)
    if mode == "exponential":
        return jnp.exp(-4.6 / decay_steps * s)
    raise ValueError(f"unknown recon_loss_decay_mode {mode!r}")


def make_vae_train_steps(
    ae_apply: Callable,
    disc_apply: Callable,
    gen_tx,
    disc_tx,
    sample_rate: int = 44100,
    loss_weights: dict | None = None,
    stereo: bool = True,
    gan_type: str = "hinge",
    encode_apply: Callable | None = None,
    decode_apply: Callable | None = None,
    teacher_encode: Callable | None = None,
    teacher_decode: Callable | None = None,
    encoder_freeze: bool = False,
    encoder_freeze_on_warmup: bool = False,
    warmup_steps: int = 0,
    latent_mask_ratio: float = 0.0,
    recon_loss_decays_to_zero_after: int | None = None,
    recon_loss_decay_mode: str = "linear",
):
    """Build (gen_step, disc_step) jitted functions.

    ae_apply({'params': p}, x, rng) → (recon, info{kl});
    disc_apply({'params': p}, x) → (logits list, features list) for
    gan_type="hinge" (EnCodec/Oobleck critics), or a feature-map list
    (last entry = logits) for gan_type="dac" (DACDiscriminator +
    least-squares DACGANLoss, reference discriminators.py:508-556).
    Flagship weights: mrstft 1.0, adversarial 0.1, feature_matching 5.0,
    kl 1e-4 (etta_vae.json loss_configs).

    Reference training modes (autoencoders.py):

    - **Encoder freeze** (``encoder_freeze``, decoder-only finetuning,
      autoencoders.py:64-69; ``encoder_freeze_on_warmup`` freezes once
      ``step ≥ warmup_steps``, :255-258): the encode runs under
      stop_gradient — the JAX equivalent of the reference's
      requires_grad=False + torch.no_grad() encode.
    - **Latent masking** (``latent_mask_ratio``, :271-274): each latent
      element is independently zeroed with this probability before the
      decode (noise-resistance training).
    - **Teacher distillation** (``teacher_encode/teacher_decode``
      closures over the frozen teacher's params, :117-126, :286-295):
      replaces the plain recon loss with the reference's four
      0.25·w_mrstft-weighted terms — (reals, decoded),
      (decoded, teacher_decoded), (reals, teacher·decode(own latents)),
      (reals, own·decode(teacher latents)). As in the reference, every
      teacher-block decode happens under no-grad (:286-295): the last
      two terms contribute loss value (logged) but no gradient.
    - **Recon-loss decay** (``recon_loss_decays_to_zero_after`` +
      ``recon_loss_decay_mode``, :156-211): the direct (reals, decoded)
      spectral loss weight decays to zero on the given schedule
      (adversarial/feature-matching/KL are unaffected).

    The freeze/mask/distill modes require the split ``encode_apply``
    ({'params': p}, x, rng) → (latents, info) and ``decode_apply``
    ({'params': p}, z) → recon; without them the composite ``ae_apply``
    fast path is used unchanged.
    """
    w = {"mrstft": 1.0, "adversarial": 0.1, "feature_matching": 5.0, "kl": 1e-4}
    if loss_weights:
        w.update(loss_weights)
    needs_split = (
        encoder_freeze
        or encoder_freeze_on_warmup
        or latent_mask_ratio > 0.0
        or teacher_encode is not None
    )
    if needs_split and (encode_apply is None or decode_apply is None):
        raise ValueError(
            "encoder_freeze / latent_mask_ratio / teacher distillation "
            "need encode_apply + decode_apply"
        )

    def spectral(x, y):
        # stereo: A-weighted sum&difference + per-channel MR-STFT
        # (autoencoders.py:130-146)
        if stereo:
            sd = sum_and_difference_stft_loss(
                jnp.moveaxis(x, -1, 1),
                jnp.moveaxis(y, -1, 1),
                perceptual_weighting=True,
                sample_rate=sample_rate,
            )
            lr_loss = multi_resolution_stft_loss(
                jnp.moveaxis(x, -1, 1).reshape(-1, x.shape[1]),
                jnp.moveaxis(y, -1, 1).reshape(-1, y.shape[1]),
                perceptual_weighting=True,
                sample_rate=sample_rate,
            )
            return sd + lr_loss
        return multi_resolution_stft_loss(
            x[..., 0], y[..., 0], perceptual_weighting=True, sample_rate=sample_rate
        )

    def critic_losses(disc_params, reals, recon):
        if gan_type == "dac":
            fr = disc_apply({"params": disc_params}, reals)
            ff = disc_apply({"params": disc_params}, recon)
            return dac_gan_losses(fr, ff)
        lt, ft = disc_apply({"params": disc_params}, reals)
        lf, ff = disc_apply({"params": disc_params}, recon)
        return encodec_gan_losses(lt, ft, lf, ff)

    def forward(gen_params, key, reals, step):
        """The generator forward — (decoded, info, latents or None).

        Uses the split encode/decode path only when a mode needs it,
        applying freeze → mask → decode in the reference's order
        (autoencoders.py:255-276)."""
        if not needs_split:
            recon, info = ae_apply({"params": gen_params}, reals, key)
            return recon, info, None
        k_enc, k_mask, _ = jax.random.split(key, 3)
        lat, info = encode_apply({"params": gen_params}, reals, k_enc)
        # freeze = the reference's torch.no_grad() encode
        # (autoencoders.py:255-258): the WHOLE encode output — latents AND
        # the bottleneck info (the KL would otherwise still pull encoder
        # gradients) — is cut from the graph
        if encoder_freeze:
            lat, info = jax.lax.stop_gradient((lat, info))
        elif encoder_freeze_on_warmup:
            frozen = step >= warmup_steps
            lat, info = jax.tree.map(
                lambda v: jnp.where(frozen, jax.lax.stop_gradient(v), v),
                (lat, info),
            )
        if latent_mask_ratio > 0.0:
            drop = (
                jax.random.uniform(k_mask, lat.shape) < latent_mask_ratio
            )
            lat = jnp.where(drop, jnp.zeros_like(lat), lat)
        recon = decode_apply({"params": gen_params}, lat)
        return recon, info, lat

    def gen_loss_fn(gen_params, disc_params, key, reals, step):
        recon, info, lat = forward(gen_params, key, reals, step)
        _, adv, fm = critic_losses(disc_params, reals, recon)
        recon_w = w["mrstft"]
        if recon_loss_decays_to_zero_after is not None:
            recon_w = recon_w * recon_loss_decay_factor(
                step, recon_loss_decays_to_zero_after, recon_loss_decay_mode
            )
        kl = info.get("kl", 0.0)
        metrics = {"adv": adv, "fm": fm, "kl": kl}
        if teacher_encode is not None:
            # the reference's whole teacher block is no-grad
            # (autoencoders.py:286-295): teacher outputs — including the
            # own-decoder decode of teacher latents — are constants
            k_teacher = jax.random.split(key, 3)[2]
            t_lat = jax.lax.stop_gradient(teacher_encode(reals, k_teacher))
            t_dec = jax.lax.stop_gradient(teacher_decode(t_lat))
            own_lat_t_dec = jax.lax.stop_gradient(
                teacher_decode(jax.lax.stop_gradient(lat))
            )
            t_lat_own_dec = jax.lax.stop_gradient(
                decode_apply({"params": gen_params}, t_lat)
            )
            mrstft = spectral(recon, reals)
            distill = (
                spectral(recon, t_dec)
                + spectral(own_lat_t_dec, reals)
                + spectral(t_lat_own_dec, reals)
            )
            spec_loss = 0.25 * recon_w * mrstft + 0.25 * w["mrstft"] * distill
            metrics["mrstft_distill"] = distill
        else:
            mrstft = spectral(recon, reals)
            spec_loss = recon_w * mrstft
        loss = (
            spec_loss
            + w["adversarial"] * adv
            + w["feature_matching"] * fm
            + w["kl"] * kl
        )
        metrics.update({"loss": loss, "mrstft": mrstft})
        return loss, metrics

    def disc_loss_fn(disc_params, gen_params, key, reals, step):
        recon, _, _ = forward(gen_params, key, reals, step)
        recon = jax.lax.stop_gradient(recon)
        dis, _, _ = critic_losses(disc_params, reals, recon)
        return dis, {"loss_dis": dis}

    def gen_step(state: VAETrainState, key, reals):
        (loss, metrics), grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state.gen_params, state.disc_params, key, reals, state.step
        )
        updates, gen_opt = gen_tx.update(grads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, updates)
        ema = ema_update(state.ema_params, gen_params, state.step)
        return (
            state._replace(
                gen_params=gen_params, ema_params=ema, gen_opt=gen_opt,
                step=state.step + 1,
            ),
            metrics,
        )

    def disc_step(state: VAETrainState, key, reals):
        (loss, metrics), grads = jax.value_and_grad(disc_loss_fn, has_aux=True)(
            state.disc_params, state.gen_params, key, reals, state.step
        )
        updates, disc_opt = disc_tx.update(grads, state.disc_opt, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, updates)
        return (
            state._replace(
                disc_params=disc_params, disc_opt=disc_opt, step=state.step + 1
            ),
            metrics,
        )

    return gen_step, disc_step


def vae_step_is_disc(step: int, warmup_steps: int = 0) -> bool:
    """The reference alternates: discriminator on odd steps once past the
    warmup (autoencoders.py:319)."""
    return step > warmup_steps and step % 2 == 1
