"""Cross-area smoke layer for the default (`-m "not slow"`) run.

The compile-heavy per-area suites are slow-marked so the default run
stays a <5-minute signal; this file keeps one tiny sanity check per area
so a default run still exercises every stack's forward path: A2SB (UNet
fwd + one bridge step), ETTA (DiT CFG fwd, VAE roundtrip), UALM
(multi-stream LM fwd), and the int8 conv path.

Compile-cost discipline (measured on CPU XLA): ``flax Module.init`` is
internally jitted and costs ~30 s even for tiny models, so params come
from ``jax.eval_shape`` + random fill, and applies run eagerly (~0.3 s).
Real-init numerics live in the slow suites; full coverage: ``pytest
tests/``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _fill_params(shapes, scale=0.05, seed=0):
    # numpy fill: per-leaf jax.random.normal would compile a tiny
    # program per unique shape (~0.3 s each × ~100 leaves)
    rng = np.random.default_rng(seed)
    leaves, treedef = jax.tree.flatten(shapes)
    return jax.tree.unflatten(
        treedef,
        [jnp.asarray(rng.standard_normal(s.shape) * scale, s.dtype)
         for s in leaves],
    )


def test_a2sb_tiny_forward_and_bridge_step():
    from audio_intelligence_tpu.models.a2sb.bridge import BridgeSchedule
    from audio_intelligence_tpu.models.a2sb.unet import (
        AttnUNetF,
        sinusoidal_temporal_embedding,
    )

    model = AttnUNetF(
        n_updown_levels=2, hidden_channels=(8, 16, 16), emb_channels=8,
        band_embedding_dim=4, attention_levels=(1,), n_attn_heads=1,
        num_res_blocks=1, rotary_dim=2,
    )
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), jnp.float32)
    te = sinusoidal_temporal_embedding(jnp.asarray([0.5]), 8)
    params = _fill_params(
        jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x1, te))
    )
    out = model.apply(params, x1, te)
    assert out.shape == x1.shape and np.isfinite(np.asarray(out)).all()

    sched = BridgeSchedule(beta_max=1.0)
    t, t_prev = jnp.asarray(0.8), jnp.asarray(0.6)
    pred_x0 = sched.pred_x0(t, x1, out)
    x_prev = sched.p_posterior(jax.random.PRNGKey(1), t_prev, t, x1, pred_x0)
    assert np.isfinite(np.asarray(x_prev)).all()


def test_etta_tiny_dit_cfg_and_vae():
    from audio_intelligence_tpu.models.etta.dit import (
        DiffusionTransformer,
        cfg_forward,
    )
    from audio_intelligence_tpu.models.etta import vae as V

    dit = DiffusionTransformer(
        io_channels=4, embed_dim=32, depth=1, num_heads=2,
        cond_token_dim=8, global_cond_dim=16, xattn_heads=2, xattn_d_memory=8,
        p_dropout=0.0,
    )
    x = jnp.zeros((1, 8, 4))
    cond = jnp.zeros((1, 3, 8))
    g = jnp.zeros((1, 16))
    params = _fill_params(
        jax.eval_shape(
            lambda: dit.init(
                jax.random.PRNGKey(0), x, jnp.asarray([0.5]), cond,
                jnp.ones((1, 3), bool), g,
            )
        ),
        seed=1,
    )
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 4))
    lat = cfg_forward(
        lambda *a, **k: dit.apply(params, *a, **k),
        z, jnp.asarray([0.7]), cond, None, g, cfg_scale=2.0,
    )
    assert lat.shape == z.shape and np.isfinite(np.asarray(lat)).all()

    enc = V.OobleckEncoder(in_channels=2, channels=4, latent_dim=6,
                           c_mults=(1, 2), strides=(2, 4))
    dec = V.OobleckDecoder(out_channels=2, channels=4, latent_dim=6,
                           c_mults=(1, 2), strides=(2, 4))
    wav = jnp.asarray(np.random.default_rng(1).standard_normal((1, 64, 2)),
                      jnp.float32)
    pe = _fill_params(
        jax.eval_shape(lambda: enc.init(jax.random.PRNGKey(2), wav)), seed=2
    )
    zz = enc.apply(pe, wav)
    assert zz.shape == (1, 8, 6)
    pd = _fill_params(
        jax.eval_shape(lambda: dec.init(jax.random.PRNGKey(3), zz)), seed=3
    )
    out = dec.apply(pd, zz)
    assert out.shape == (1, 64, 2) and np.isfinite(np.asarray(out)).all()


def test_ualm_tiny_forward():
    from audio_intelligence_tpu.models.ualm.backbone import BackboneConfig
    from audio_intelligence_tpu.models.ualm.lm import ParallelLM

    cfg = BackboneConfig(
        hidden_size=32, num_layers=1, num_heads=4, num_kv_heads=2,
        intermediate_size=64,
    )
    model = ParallelLM(cfg=cfg, vocab_size=64, num_stream=2)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(1, 60, (1, 6, 2)), jnp.int32
    )
    variables = _fill_params(
        jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), ids)), seed=4
    )
    logits = model.apply(variables, ids)
    arr = np.asarray(logits[0] if isinstance(logits, tuple) else logits)
    assert np.isfinite(arr).all()
    # the KV-cache decode scan costs ~15 s of CPU-XLA compile — covered
    # by the slow decode suites; this forward is the default-run signal


def test_int8_conv_sanity():
    from audio_intelligence_tpu.models.a2sb.unet import QConv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)), jnp.float32)
    conv8 = QConv(8, (3, 3), padding=1, impl="int8")
    conv16 = QConv(8, (3, 3), padding=1, impl="bf16")
    params = conv8.init(jax.random.PRNGKey(0), x)
    y8 = np.asarray(conv8.apply(params, x), np.float32)
    y16 = np.asarray(conv16.apply(params, x), np.float32)
    rel = np.abs(y8 - y16).max() / max(np.abs(y16).max(), 1e-6)
    assert rel < 0.05, rel
