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
    FSQBottleneck,
    L2Bottleneck,
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
    encoder = OobleckEncoder(
        in_channels=enc_cfg.get("in_channels", 2),
        channels=enc_cfg.get("channels", 128),
        latent_dim=enc_cfg.get("latent_dim", 128),
        c_mults=tuple(enc_cfg.get("c_mults", (1, 2, 4, 8, 16))),
        strides=tuple(enc_cfg.get("strides", (2, 4, 4, 8, 8))),
    )
    decoder = OobleckDecoder(
        out_channels=dec_cfg.get("out_channels", 2),
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
        io_channels=model_cfg.get("io_channels", 2),
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
    elif model_type in ("diffusion_cond", "diffusion_uncond"):
        out["diffusion"] = create_dit_from_config(model_cfg["diffusion"])
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
    else:
        raise ValueError(f"unknown model_type {model_type}")
    return out
