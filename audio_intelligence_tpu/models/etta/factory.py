"""Config-driven model construction (ETTA models/factory.py parity).

``create_model_from_config`` dispatches on ``model_type`` ∈ {autoencoder,
diffusion_cond, diffusion_uncond, lm} over the reference's JSON schema
(etta_vae.json / etta_dit.json structures) and returns the corresponding
flax modules + metadata. Bottleneck/pretransform factories mirror
factory.py:36-157.
"""

from __future__ import annotations

from typing import Any

from audio_intelligence_tpu.models.etta.bottleneck import (
    DACRVQBottleneck,
    DACRVQVAEBottleneck,
    FSQBottleneck,
    L2Bottleneck,
    RVQBottleneck,
    RVQVAEBottleneck,
    TanhBottleneck,
    VAEBottleneck,
    WassersteinBottleneck,
)
from audio_intelligence_tpu.models.etta.dit import DiffusionTransformer
from audio_intelligence_tpu.models.etta.discriminators import (
    DACDiscriminator,
    MultiScaleSTFTDiscriminator,
    OobleckDiscriminator,
)
from audio_intelligence_tpu.models.etta.vae import (
    AudioAutoencoder,
    OobleckDecoder,
    OobleckEncoder,
)


def create_bottleneck_from_config(cfg: dict):
    kind = cfg.get("type", "vae")
    config = cfg.get("config", {})
    table = {
        "vae": VAEBottleneck,
        "tanh": TanhBottleneck,
        "l2_norm": L2Bottleneck,
        "wasserstein": WassersteinBottleneck,
        "fsq": FSQBottleneck,
    }
    # quantizer bottlenecks (reference factory quantizer_kwargs pass-through,
    # bottleneck.py:150-316); lucidrains kwarg names map onto the flax fields
    if kind in ("rvq", "rvq_vae"):
        cls = RVQBottleneck if kind == "rvq" else RVQVAEBottleneck
        return cls(
            num_quantizers=config.get("num_quantizers", 8),
            codebook_size=config.get("codebook_size", 1024),
            dim=config.get("dim", 256),
        )
    if kind in ("dac_rvq", "dac_rvq_vae"):
        kwargs = dict(
            n_codebooks=config.get("n_codebooks", 9),
            codebook_size=config.get("codebook_size", 1024),
            codebook_dim=config.get("codebook_dim", 8),
            quantize_on_decode=config.get("quantize_on_decode", False),
        )
        if kind == "dac_rvq":
            return DACRVQBottleneck(
                noise_augment_dim=config.get("noise_augment_dim", 0), **kwargs
            )
        return DACRVQVAEBottleneck(**kwargs)
    if kind not in table:
        raise ValueError(f"unknown bottleneck type {kind}")
    kwargs = {}
    if kind == "fsq" and "levels" in config:
        kwargs["levels"] = tuple(config["levels"])
    return table[kind](**kwargs)


def create_autoencoder_from_config(model_cfg: dict) -> AudioAutoencoder:
    enc_cfg = model_cfg["encoder"]["config"]
    dec_cfg = model_cfg["decoder"]["config"]
    assert model_cfg["encoder"].get("type", "oobleck") == "oobleck"
    io_ch = model_cfg.get("io_channels", 2)
    encoder = OobleckEncoder(
        in_channels=enc_cfg.get("in_channels", io_ch),
        channels=enc_cfg.get("channels", 128),
        latent_dim=enc_cfg.get("latent_dim", 128),
        c_mults=tuple(enc_cfg.get("c_mults", (1, 2, 4, 8, 16))),
        strides=tuple(enc_cfg.get("strides", (2, 4, 4, 8, 8))),
    )
    decoder = OobleckDecoder(
        out_channels=dec_cfg.get("out_channels", io_ch),
        channels=dec_cfg.get("channels", 128),
        latent_dim=dec_cfg.get("latent_dim", 64),
        c_mults=tuple(dec_cfg.get("c_mults", (1, 2, 4, 8, 16))),
        strides=tuple(dec_cfg.get("strides", (2, 4, 4, 8, 8))),
        final_tanh=dec_cfg.get("final_tanh", False),
    )
    bottleneck = create_bottleneck_from_config(model_cfg.get("bottleneck", {"type": "vae"}))
    return AudioAutoencoder(
        encoder=encoder,
        decoder=decoder,
        bottleneck=bottleneck,
        downsampling_ratio=model_cfg.get("downsampling_ratio", 2048),
        io_channels=io_ch,
        sample_rate=model_cfg.get("sample_rate", 44100),
    )


def create_dit_from_config(diff_cfg: dict) -> DiffusionTransformer:
    d = diff_cfg["config"]
    xattn = d.get("context_xattn", {})
    return DiffusionTransformer(
        io_channels=d.get("io_channels", 64),
        embed_dim=d.get("embed_dim", 1536),
        depth=d.get("depth", 24),
        num_heads=d.get("num_heads", 24),
        cond_token_dim=d.get("cond_token_dim", 768),
        global_cond_dim=d.get("global_cond_dim", 1536),
        project_cond_tokens=d.get("project_cond_tokens", False),
        patch_size=d.get("patch_size", 1),
        kernel_size=d.get("kernel_size", 1),
        p_dropout=d.get("p_dropout", 0.1),
        rope_base=d.get("rope_base", 16384),
        xattn_heads=xattn.get("n_heads", 16),
        xattn_d_memory=xattn.get("d_heads", 768),
        apply_norm_to_cond=d.get("apply_norm_to_cond", True),
        qknorm=d.get("qknorm"),
        input_concat_dim=d.get("input_concat_dim", 0),
    )


def create_discriminator_from_config(loss_cfg: dict, io_channels: int = 2):
    """Critic dispatch (reference training/autoencoders.py loss_config
    "discriminator.type": encodec | oobleck | dac). The returned module's
    gan flavor: encodec/oobleck → hinge; dac → least-squares
    (pass gan_type="dac" to make_vae_train_steps)."""
    disc = loss_cfg["discriminator"]
    dtype_ = disc.get("type", "encodec")
    c = disc.get("config", {})
    if dtype_ == "encodec":
        return MultiScaleSTFTDiscriminator(
            filters=c.get("filters", 64),
            n_ffts=tuple(c.get("n_ffts", (2048, 1024, 512, 256, 128))),
            hop_lengths=tuple(c.get("hop_lengths", (512, 256, 128, 64, 32))),
            win_lengths=tuple(c.get("win_lengths", (2048, 1024, 512, 256, 128))),
            in_channels=io_channels,
        )
    if dtype_ == "oobleck":
        return OobleckDiscriminator(capacity=c.get("capacity", 32))
    if dtype_ == "dac":
        return DACDiscriminator(
            periods=tuple(c.get("periods", (2, 3, 5, 7, 11))),
            fft_sizes=tuple(c.get("fft_sizes", (2048, 1024, 512))),
        )
    raise ValueError(f"unknown discriminator type {dtype_!r}")


def create_model_from_config(config: dict) -> dict[str, Any]:
    """Top-level dispatch (factory.py:7-28). Returns a dict of modules +
    metadata keyed by role."""
    model_type = config["model_type"]
    model_cfg = config["model"]
    out: dict[str, Any] = {"model_type": model_type}

    if model_type == "autoencoder":
        out["autoencoder"] = create_autoencoder_from_config(model_cfg)
        if "training" in config and "loss_configs" in config["training"]:
            out["discriminator"] = create_discriminator_from_config(
                config["training"]["loss_configs"],
                model_cfg.get("io_channels", 2),
            )
    elif model_type in (
        "diffusion_cond",
        "diffusion_uncond",
        "diffusion_cond_inpaint",
        "diffusion_prior",
    ):
        dcfg = model_cfg["diffusion"]
        if model_type == "diffusion_cond_inpaint":
            # inpaint conditioning rides input-concat channels
            # [masked_input ‖ mask] (training/diffusion.py:1205-1207)
            io = dcfg["config"].get("io_channels", 64)
            dcfg = dict(dcfg)
            dcfg["config"] = dict(
                dcfg["config"], input_concat_dim=dcfg["config"].get(
                    "input_concat_dim", io + 1
                )
            )
        elif model_type == "diffusion_prior":
            # source (e.g. mono) latents as input-concat
            # (diffusion_prior.py:17-25, MonoToStereoDiffusionPrior)
            io = dcfg["config"].get("io_channels", 64)
            dcfg = dict(dcfg)
            dcfg["config"] = dict(
                dcfg["config"], input_concat_dim=dcfg["config"].get(
                    "input_concat_dim", io
                )
            )
        out["diffusion"] = create_dit_from_config(dcfg)
        out["diffusion_objective"] = model_cfg["diffusion"].get(
            "diffusion_objective", "rectified_flow"
        )
        if "pretransform" in model_cfg:
            out["pretransform"] = create_autoencoder_from_config(
                model_cfg["pretransform"]["config"]
            )
        out["cross_attention_cond_ids"] = model_cfg.get(
            "cross_attention_cond_ids", ["prompt", "seconds_start", "seconds_total"]
        )
        out["global_cond_ids"] = model_cfg.get(
            "global_cond_ids", ["seconds_start", "seconds_total"]
        )
    elif model_type == "diffusion_autoencoder":
        from audio_intelligence_tpu.models.etta.diffusion_autoencoder import (
            DiffusionAutoencoder,
        )

        enc_cfg = model_cfg["encoder"]["config"]
        latent_dim = model_cfg.get("latent_dim", enc_cfg.get("latent_dim", 32))
        encoder = OobleckEncoder(
            in_channels=enc_cfg.get("in_channels", model_cfg.get("io_channels", 2)),
            channels=enc_cfg.get("channels", 128),
            latent_dim=latent_dim,
            c_mults=tuple(enc_cfg.get("c_mults", (1, 2, 4, 8))),
            strides=tuple(enc_cfg.get("strides", (2, 4, 4, 8))),
        )
        dcfg = dict(model_cfg["diffusion"])
        dcfg["config"] = dict(
            dcfg["config"],
            input_concat_dim=dcfg["config"].get("input_concat_dim", latent_dim),
        )
        out["diffusion_autoencoder"] = DiffusionAutoencoder(
            encoder=encoder,
            diffusion=create_dit_from_config(dcfg),
            latent_dim=latent_dim,
            downsampling_ratio=model_cfg.get("downsampling_ratio", 2048),
            io_channels=model_cfg.get("io_channels", 2),
        )
    elif model_type == "lm":
        from audio_intelligence_tpu.models.etta.lm import AudioLanguageModel

        lm_cfg = model_cfg.get("lm", {}).get("config", {})
        out["lm"] = AudioLanguageModel(
            num_quantizers=lm_cfg.get("num_quantizers", 8),
            codebook_size=lm_cfg.get("codebook_size", 1024),
            dim=lm_cfg.get("dim", 512),
            depth=lm_cfg.get("depth", 8),
            heads=lm_cfg.get("heads", 8),
        )
        out["codebook_pattern"] = model_cfg.get("codebook_pattern", "delay")
        if "pretransform" in model_cfg:
            out["pretransform"] = create_autoencoder_from_config(
                model_cfg["pretransform"]["config"]
            )
    else:
        raise ValueError(f"unknown model_type {model_type}")
    return out


def create_training_wrapper_from_config(
    config: dict, modules: dict, batch_size: int = 2, seed: int = 0
):
    """Config → training-step functions + initial state (reference
    training/factory.py create_training_wrapper_from_config:9-169).

    autoencoder → {"gen_step", "disc_step", "state", "gan_type"}
    diffusion_* → {"train_step", "state"}
    Steps are un-jitted; callers jit (or pjit with shardings).
    """
    import jax
    import jax.numpy as jnp

    from audio_intelligence_tpu.models.etta import training as T

    model_type = config["model_type"]
    model_cfg = config["model"]
    tr = config.get("training", {})
    sample_size = config.get("sample_size", 65536)
    sr = config.get("sample_rate", 44100)

    if model_type == "autoencoder":
        ae = modules["autoencoder"]
        disc = modules["discriminator"]
        io_ch = model_cfg.get("io_channels", 2)
        gan_type = (
            "dac"
            if tr.get("loss_configs", {}).get("discriminator", {}).get("type")
            == "dac"
            else "hinge"
        )
        reals0 = jnp.zeros((batch_size, sample_size, io_ch))
        gp = ae.init(
            jax.random.PRNGKey(seed), reals0, jax.random.PRNGKey(seed + 1)
        )["params"]
        dp = disc.init(jax.random.PRNGKey(seed + 2), reals0)["params"]
        gen_tx, disc_tx = T.make_vae_optimizers()
        state = T.VAETrainState(
            gp, dp, gp, gen_tx.init(gp), disc_tx.init(dp),
            jnp.zeros((), jnp.int32),
        )
        # reference trainer modes (training/factory.py:25-61 →
        # autoencoders.py): encoder freeze / freeze-on-warmup, latent
        # masking, teacher distillation, recon-loss decay
        loss_cfg = tr.get("loss_configs", {}) or {}
        extra = dict(
            encoder_freeze=tr.get("encoder_freeze", False),
            encoder_freeze_on_warmup=tr.get("encoder_freeze_on_warmup", False),
            warmup_steps=tr.get("warmup_steps", 0),
            latent_mask_ratio=tr.get("latent_mask_ratio", 0.0),
            recon_loss_decays_to_zero_after=loss_cfg.get(
                "recon_loss_decays_to_zero_after"
            ),
            recon_loss_decay_mode=loss_cfg.get(
                "recon_loss_decay_mode", "linear"
            ),
        )
        teacher_cfg = tr.get("teacher_model")
        if teacher_cfg is not None:
            teacher_ckpt = tr.get("teacher_model_ckpt")
            if teacher_ckpt is None:
                raise ValueError(
                    "teacher_model_ckpt must be specified if teacher_model "
                    "is specified"
                )
            t_ae = create_model_from_config(teacher_cfg)["autoencoder"]
            from audio_intelligence_tpu.train.checkpoint import (
                load_exported_weights,
            )

            t_tmpl = jax.eval_shape(
                lambda: t_ae.init(
                    jax.random.PRNGKey(0), reals0, jax.random.PRNGKey(1)
                )["params"]
            )
            t_params = load_exported_weights(t_tmpl, teacher_ckpt)
            extra["teacher_encode"] = lambda x, k: t_ae.apply(
                {"params": t_params}, x, k, method=type(t_ae).encode
            )
            extra["teacher_decode"] = lambda z: t_ae.apply(
                {"params": t_params}, z, method=type(t_ae).decode
            )
        needs_split = (
            extra["encoder_freeze"]
            or extra["encoder_freeze_on_warmup"]
            or extra["latent_mask_ratio"] > 0.0
            or teacher_cfg is not None
        )
        if needs_split:
            extra["encode_apply"] = lambda v, x, k: ae.apply(
                v, x, k, True, method=type(ae).encode
            )
            extra["decode_apply"] = lambda v, z: ae.apply(
                v, z, method=type(ae).decode
            )
        gen_step, disc_step = T.make_vae_train_steps(
            ae.apply, disc.apply, gen_tx, disc_tx, sample_rate=sr,
            stereo=io_ch == 2, gan_type=gan_type, **extra,
        )
        return {
            "gen_step": gen_step, "disc_step": disc_step, "state": state,
            "gan_type": gan_type, "step_is_disc": T.vae_step_is_disc,
        }

    if model_type in (
        "diffusion_cond",
        "diffusion_uncond",
        "diffusion_cond_inpaint",
        "diffusion_prior",
    ):
        dit = modules["diffusion"]
        dcfg = model_cfg["diffusion"]["config"]
        io = dcfg.get("io_channels", 64)
        t_len = sample_size // config.get("downsampling_ratio", 2048)
        objective = modules.get("diffusion_objective", "rectified_flow")
        x0 = jnp.zeros((batch_size, t_len, io))
        cond0 = jnp.zeros((batch_size, 1, dcfg.get("cond_token_dim", 768)))
        gcond0 = jnp.zeros((batch_size, dcfg.get("global_cond_dim", 1536)))
        init_kwargs = {}
        concat_dim = getattr(dit, "input_concat_dim", 0)
        if concat_dim:
            init_kwargs["input_concat_cond"] = jnp.zeros(
                (batch_size, t_len, concat_dim)
            )
        params = dit.init(
            jax.random.PRNGKey(seed), x0, jnp.zeros((batch_size,)),
            cond0, jnp.ones((batch_size, 1), bool), gcond0, **init_kwargs,
        )["params"]
        tx = T.make_diffusion_optimizer()
        state = T.DiffusionTrainState(
            params, params, tx.init(params), jnp.zeros((), jnp.int32)
        )
        if model_type == "diffusion_cond_inpaint":
            train_step = T.make_inpaint_train_step(
                dit.apply, tx,
                mask_type=tr.get("mask_type", "random_mask"),
                objective=objective,
                timestep_sampler=tr.get("timestep_sampler", "uniform"),
                cfg_dropout_prob=tr.get("cfg_dropout_prob", 0.1),
            )
        else:
            train_step = T.make_diffusion_train_step(
                dit.apply, tx,
                cfg_dropout_prob=tr.get("cfg_dropout_prob", 0.1),
                objective=objective,
                timestep_sampler=tr.get("timestep_sampler", "logit_normal"),
            )
        return {"train_step": train_step, "state": state}

    if model_type == "diffusion_autoencoder":
        from audio_intelligence_tpu.models.etta.diffusion_autoencoder import (
            dae_rf_loss,
        )
        import optax

        dae = modules["diffusion_autoencoder"]
        io = model_cfg.get("io_channels", 2)
        audio0 = jnp.zeros((batch_size, sample_size, io))
        variables = dae.init(
            jax.random.PRNGKey(seed), audio0, jnp.full((batch_size,), 0.5)
        )
        params = variables["params"]
        tx = T.make_diffusion_optimizer()
        state = T.DiffusionTrainState(
            params, params, tx.init(params), jnp.zeros((), jnp.int32)
        )

        def train_step(state, key, batch):
            loss, grads = jax.value_and_grad(
                lambda p: dae_rf_loss({"params": p}, dae, key, batch["audio"])
            )(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            from audio_intelligence_tpu.train.common import ema_update

            ema = ema_update(state.ema_params, params, state.step)
            return (
                T.DiffusionTrainState(params, ema, opt_state, state.step + 1),
                {"loss": loss, "grad_norm": optax.global_norm(grads)},
            )

        return {"train_step": train_step, "state": state}

    if model_type == "lm":
        from audio_intelligence_tpu.models.etta.lm import lm_cross_entropy
        import optax

        lm = modules["lm"]
        seq0 = jnp.full(
            (batch_size, 16, lm.num_quantizers), lm.codebook_size, jnp.int32
        )
        params = lm.init(jax.random.PRNGKey(seed), seq0)["params"]
        tx = T.make_diffusion_optimizer(lr=tr.get("learning_rate", 1e-4))
        state = T.DiffusionTrainState(
            params, params, tx.init(params), jnp.zeros((), jnp.int32)
        )

        def train_step(state, key, batch):
            codes = batch["codes"]  # [B, S, N] pattern-interleaved

            def loss_fn(p):
                logits = lm.apply({"params": p}, codes[:, :-1])
                loss, per_q = lm_cross_entropy(
                    logits, codes[:, 1:], lm.codebook_size
                )
                return loss, per_q

            (loss, per_q), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            from audio_intelligence_tpu.train.common import ema_update

            ema = ema_update(state.ema_params, params, state.step)
            return (
                T.DiffusionTrainState(params, ema, opt_state, state.step + 1),
                {
                    "loss": loss,
                    "per_codebook_ce": per_q,
                    "grad_norm": optax.global_norm(grads),
                },
            )

        return {"train_step": train_step, "state": state}

    raise ValueError(f"no training wrapper for model_type {model_type!r}")


def create_demo_callback_from_config(config: dict, demo_fn):
    """Config → DemoCallback (reference training/factory.py:170-250).
    ``demo_fn(step) -> {name: (wav, sr)}`` renders the demos."""
    from audio_intelligence_tpu.train.demo import DemoCallback

    demo_cfg = config.get("training", {}).get("demo", {})
    return DemoCallback(
        demo_fn=demo_fn,
        demo_every=demo_cfg.get("demo_every", 2000),
        out_dir=demo_cfg.get("demo_dir", demo_cfg.get("out_dir", "demo")),
    )
