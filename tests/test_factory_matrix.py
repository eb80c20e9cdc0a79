"""Factory matrix: inpaint / diffusion_autoencoder / lm model types,
v-objective training, MusicLM pattern, ETTA audio LM."""

import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.etta.factory import (
    create_model_from_config,
    create_training_wrapper_from_config,
)
from audio_intelligence_tpu.models.etta.inpaint_masks import (
    random_mask,
    speechflow_mask,
)
from audio_intelligence_tpu.models.ualm.interleave import (
    musiclm_pattern,
    musiclm_unpattern,
)


def _dit_cfg(model_type, **extra):
    cfg = {
        "model_type": model_type,
        "sample_rate": 16000,
        "sample_size": 4096,
        "downsampling_ratio": 256,
        "model": {"diffusion": {"type": "dit", "config": {
            "io_channels": 8, "embed_dim": 32, "depth": 1, "num_heads": 2,
            "cond_token_dim": 16, "global_cond_dim": 16}}},
    }
    cfg["model"].update(extra.pop("model_extra", {}))
    cfg.update(extra)
    return cfg


def test_speechflow_mask_reference_convention():
    m = np.asarray(speechflow_mask(jax.random.PRNGKey(0), 32, 100, p_cond=0.9))
    assert m.shape == (32, 100)
    assert ((m == 0) | (m == 1)).all()
    # keep-convention: partial masks keep SOME frames; unconditional rows
    # (prob 0.1) are all-zero
    frac_kept = m.mean(axis=1)
    partial = m[frac_kept > 0]
    assert len(partial) > 0
    # partial rows mask a substantial fraction (spans may overlap, so the
    # masked fraction is below the drawn span rate — same as the reference)
    assert (partial.mean(axis=1) < 0.8).all()
    assert ((1.0 - partial).sum(axis=1) >= 10).all()  # ≥ min_span masked


def test_random_mask_reference_convention():
    m = np.asarray(random_mask(jax.random.PRNGKey(1), 64, 100))
    assert ((m == 0) | (m == 1)).all()
    frac = m.mean(axis=1)
    assert (frac == 0.0).any()  # full-mask mode
    # causal mode rows: a kept prefix then masked suffix
    causal_like = 0
    for row in m:
        on = np.flatnonzero(row)
        if len(on) and (np.diff(on) == 1).all() and row[0] == 1 and row[-1] == 0:
            causal_like += 1
    assert causal_like > 0


def test_inpaint_training_wrapper():
    cfg = _dit_cfg("diffusion_cond_inpaint")
    cfg["training"] = {"mask_type": "random_mask", "timestep_sampler": "uniform"}
    mods = create_model_from_config(cfg)
    assert mods["diffusion"].input_concat_dim == 9  # io + 1
    w = create_training_wrapper_from_config(cfg, mods, batch_size=2)
    rng = np.random.default_rng(0)
    batch = {
        "latents": jnp.asarray(rng.standard_normal((2, 16, 8)), jnp.float32),
        "cross_attn_cond": jnp.zeros((2, 1, 16)),
        "cross_attn_mask": jnp.ones((2, 1), bool),
        "global_cond": jnp.zeros((2, 16)),
    }
    st, m = jax.jit(w["train_step"])(w["state"], jax.random.PRNGKey(0), batch)
    assert np.isfinite(float(m["loss"]))
    st, m2 = jax.jit(w["train_step"])(st, jax.random.PRNGKey(1), batch)
    assert int(st.step) == 2


def test_v_objective_training():
    cfg = _dit_cfg("diffusion_cond")
    cfg["model"]["diffusion"]["diffusion_objective"] = "v"
    cfg["training"] = {"timestep_sampler": "uniform"}
    mods = create_model_from_config(cfg)
    assert mods["diffusion_objective"] == "v"
    w = create_training_wrapper_from_config(cfg, mods, batch_size=2)
    rng = np.random.default_rng(0)
    batch = {
        "latents": jnp.asarray(rng.standard_normal((2, 16, 8)), jnp.float32),
        "cross_attn_cond": jnp.zeros((2, 1, 16)),
        "cross_attn_mask": jnp.ones((2, 1), bool),
        "global_cond": jnp.zeros((2, 16)),
    }
    st, m = jax.jit(w["train_step"])(w["state"], jax.random.PRNGKey(0), batch)
    assert np.isfinite(float(m["loss"]))


def test_v_targets_match_vp_circle():
    from audio_intelligence_tpu.models.etta.training import diffusion_targets

    x = jnp.ones((2, 4, 2))
    n = jnp.full((2, 4, 2), 2.0)
    t = jnp.asarray([0.0, 1.0])
    x_t, tgt = diffusion_targets("v", x, n, t)
    # t=0: α=1 σ=0 → x_t = x, target = noise
    np.testing.assert_allclose(np.asarray(x_t[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tgt[0]), 2.0, atol=1e-6)
    # t=1: α=0 σ=1 → x_t = noise, target = −x
    np.testing.assert_allclose(np.asarray(x_t[1]), 2.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tgt[1]), -1.0, atol=1e-6)


def test_diffusion_autoencoder_factory():
    cfg = {
        "model_type": "diffusion_autoencoder",
        "sample_rate": 16000,
        "sample_size": 64,
        "model": {
            "io_channels": 1,
            "latent_dim": 4,
            "downsampling_ratio": 4,
            "encoder": {"type": "oobleck", "config": {
                "in_channels": 1, "channels": 8, "latent_dim": 4,
                "c_mults": [1, 2], "strides": [2, 2]}},
            "diffusion": {"type": "dit", "config": {
                "io_channels": 1, "embed_dim": 32, "depth": 1, "num_heads": 2,
                "cond_token_dim": 0, "global_cond_dim": 0}},
        },
    }
    mods = create_model_from_config(cfg)
    w = create_training_wrapper_from_config(cfg, mods, batch_size=2)
    rng = np.random.default_rng(0)
    batch = {"audio": jnp.asarray(rng.standard_normal((2, 64, 1)) * 0.3, jnp.float32)}
    st, m = jax.jit(w["train_step"])(w["state"], jax.random.PRNGKey(0), batch)
    assert np.isfinite(float(m["loss"]))


def test_lm_factory_and_training():
    cfg = {
        "model_type": "lm",
        "model": {"lm": {"config": {
            "num_quantizers": 4, "codebook_size": 32, "dim": 32,
            "depth": 1, "heads": 2}},
            "codebook_pattern": "delay"},
    }
    mods = create_model_from_config(cfg)
    assert mods["codebook_pattern"] == "delay"
    w = create_training_wrapper_from_config(cfg, mods, batch_size=2)
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 32, (2, 12, 4)), jnp.int32)
    st, m = jax.jit(w["train_step"])(w["state"], jax.random.PRNGKey(0), {"codes": codes})
    assert np.isfinite(float(m["loss"]))
    assert m["per_codebook_ce"].shape == (4,)


def test_etta_lm_generate_and_ce():
    from audio_intelligence_tpu.models.etta.lm import (
        AudioLanguageModel,
        generate,
        lm_cross_entropy,
    )

    lm = AudioLanguageModel(num_quantizers=2, codebook_size=16, dim=32, depth=1, heads=2)
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 16, (2, 8, 2)), jnp.int32)
    params = lm.init(jax.random.PRNGKey(0), codes)["params"]
    logits = lm.apply({"params": params}, codes)
    assert logits.shape == (2, 8, 2, 16)

    # special positions excluded from CE
    tgt = codes.at[:, 0, :].set(16)
    loss, per_q = lm_cross_entropy(logits, tgt, 16)
    assert np.isfinite(float(loss)) and per_q.shape == (2,)

    out = generate(
        lambda p, c: lm.apply({"params": p}, c),
        params, jax.random.PRNGKey(1), batch=2, gen_len=6,
        num_quantizers=2, codebook_size=16,
        prompt=codes[:, :2], temperature=1.0, top_k=4,
    )
    o = np.asarray(out)
    assert o.shape == (2, 6, 2)
    np.testing.assert_array_equal(o[:, :2], np.asarray(codes[:, :2]))
    assert (o[:, 2:] < 16).all()  # sampled ids in-vocab


def test_musiclm_pattern_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 100, (2, 6, 4)).astype(np.int64)
    pads = [100, 100, 100, 100]
    pat = musiclm_pattern(codes, pads, group_by=2)
    assert pat.shape == (2, 24, 4)
    # grouped order: first T·G steps only touch streams 0..1
    assert (pat[:, : 6 * 2, 2:] == 100).all()
    back = musiclm_unpattern(pat, 4, group_by=2)
    np.testing.assert_array_equal(back, codes)
