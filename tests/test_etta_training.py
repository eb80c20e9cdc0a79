"""ETTA training loops: RF step, GAN-VAE alternating steps, EMA/schedules."""

import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.train.common import (
    ema_update,
    ema_decay_schedule,
    inverse_lr,
    logit_normal_sample,
    nan_safe_update,
)
from audio_intelligence_tpu.models.etta.dit import DiffusionTransformer
from audio_intelligence_tpu.models.etta.vae import OobleckEncoder, OobleckDecoder, AudioAutoencoder
from audio_intelligence_tpu.models.etta.bottleneck import VAEBottleneck
from audio_intelligence_tpu.models.etta.discriminators import (
    MultiScaleSTFTDiscriminator,
    encodec_gan_losses,
)
from audio_intelligence_tpu.models.etta.training import (
    DiffusionTrainState,
    make_diffusion_optimizer,
    make_diffusion_train_step,
    VAETrainState,
    make_vae_optimizers,
    make_vae_train_steps,
    vae_step_is_disc,
)
import optax


def test_inverse_lr_schedule():
    s = inverse_lr(1.0, inv_gamma=100, power=0.5, warmup=0.0)
    np.testing.assert_allclose(float(s(0)), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(s(100)), 2 ** -0.5, atol=1e-5)
    # warmup ramps from ~0
    s2 = inverse_lr(1.0, inv_gamma=1e9, power=0.5, warmup=0.99)
    assert float(s2(0)) < 0.02
    assert float(s2(1000)) > 0.9


def test_logit_normal_in_unit_interval():
    t = logit_normal_sample(jax.random.PRNGKey(0), (10000,))
    t = np.asarray(t)
    assert (t > 0).all() and (t < 1).all()
    assert 0.45 < t.mean() < 0.55


def test_ema_schedule_and_update():
    assert float(ema_decay_schedule(jnp.asarray(0.0))) == 0.0  # first step copies
    assert abs(float(ema_decay_schedule(jnp.asarray(1e8))) - 0.9999) < 1e-6
    ema = {"w": jnp.zeros(3)}
    params = {"w": jnp.ones(3)}
    out = ema_update(ema, params, jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(out["w"]), 1.0)  # copies at step 0


def test_nan_safe_update_skips():
    tx = nan_safe_update(optax.sgd(0.1))
    params = {"w": jnp.ones(2)}
    state = tx.init(params)
    bad = {"w": jnp.asarray([jnp.nan, 1.0])}
    updates, state = tx.update(bad, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), 0.0)


def test_diffusion_train_step_runs_and_learns():
    model = DiffusionTransformer(
        io_channels=4, embed_dim=32, depth=1, num_heads=2,
        cond_token_dim=8, global_cond_dim=16, xattn_heads=2, xattn_d_memory=8,
    )
    rng = np.random.default_rng(0)
    batch = {
        "latents": jnp.asarray(rng.standard_normal((2, 8, 4)), jnp.float32),
        "cross_attn_cond": jnp.asarray(rng.standard_normal((2, 3, 8)), jnp.float32),
        "cross_attn_mask": jnp.ones((2, 3), bool),
        "global_cond": jnp.asarray(rng.standard_normal((2, 16)), jnp.float32),
    }
    params = model.init(
        jax.random.PRNGKey(0),
        batch["latents"],
        jnp.asarray([0.5, 0.5]),
        batch["cross_attn_cond"],
        batch["cross_attn_mask"],
        batch["global_cond"],
    )["params"]
    tx = make_diffusion_optimizer(lr=1e-3)
    state = DiffusionTrainState(params, params, tx.init(params), jnp.asarray(0))
    step = jax.jit(make_diffusion_train_step(model.apply, tx))
    losses = []
    for i in range(6):
        state, m = step(state, jax.random.PRNGKey(0), batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # EMA tracks params
    assert np.isfinite(
        np.asarray(jax.tree.leaves(state.ema_params)[0])
    ).all()


def test_vae_gan_alternating_steps():
    latent = 4
    enc = OobleckEncoder(in_channels=1, channels=8, latent_dim=2 * latent, c_mults=(1, 2), strides=(2, 2))
    dec = OobleckDecoder(out_channels=1, channels=8, latent_dim=latent, c_mults=(1, 2), strides=(2, 2))
    ae = AudioAutoencoder(encoder=enc, decoder=dec, bottleneck=VAEBottleneck(), downsampling_ratio=4, io_channels=1)
    disc = MultiScaleSTFTDiscriminator(
        filters=4, n_ffts=(128, 64), hop_lengths=(32, 16), win_lengths=(128, 64), in_channels=1
    )
    rng = np.random.default_rng(0)
    reals = jnp.asarray(rng.standard_normal((2, 256, 1)) * 0.1, jnp.float32)

    gp = ae.init(jax.random.PRNGKey(0), reals, jax.random.PRNGKey(1))["params"]
    dp = disc.init(jax.random.PRNGKey(2), reals)["params"]
    gen_tx, disc_tx = make_vae_optimizers()
    state = VAETrainState(gp, dp, gp, gen_tx.init(gp), disc_tx.init(dp), jnp.asarray(0))

    gen_step, disc_step = make_vae_train_steps(
        ae.apply, disc.apply, gen_tx, disc_tx, sample_rate=16000, stereo=False
    )
    gen_step, disc_step = jax.jit(gen_step), jax.jit(disc_step)

    for i in range(4):
        key = jax.random.PRNGKey(i)
        if vae_step_is_disc(i, warmup_steps=1):
            state, m = disc_step(state, key, reals)
            assert np.isfinite(float(m["loss_dis"]))
        else:
            state, m = gen_step(state, key, reals)
            assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 4


def test_hinge_losses():
    lt = [jnp.full((1, 4, 4, 1), 2.0)]
    lf = [jnp.full((1, 4, 4, 1), -2.0)]
    ft = [[jnp.ones((1, 4, 4, 2))]]
    ff = [[jnp.zeros((1, 4, 4, 2))]]
    dis, adv, fm = encodec_gan_losses(lt, ft, lf, ff)
    np.testing.assert_allclose(float(dis), 0.0)  # perfectly separated
    np.testing.assert_allclose(float(adv), 2.0)
    np.testing.assert_allclose(float(fm), 1.0)


def test_per_sigma_loss_buckets():
    from audio_intelligence_tpu.models.etta.training import per_sigma_loss_buckets

    t = jnp.asarray([0.05, 0.15, 0.95, 0.12])
    loss = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    buckets = per_sigma_loss_buckets(t, loss, n_buckets=10)
    assert buckets.shape == (10,)
    np.testing.assert_allclose(float(buckets[0]), 1.0)
    np.testing.assert_allclose(float(buckets[1]), 3.0)  # mean(2, 4)
    np.testing.assert_allclose(float(buckets[9]), 3.0)


def test_oobleck_discriminator():
    from audio_intelligence_tpu.models.etta.discriminators import OobleckDiscriminator

    disc = OobleckDiscriminator(capacity=4, n_scales=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 256, 1)), jnp.float32)
    v = disc.init(jax.random.PRNGKey(0), x)
    logits, feats = disc.apply(v, x)
    assert len(logits) == 2 and len(feats) == 2
    # hinge/fm losses compose with the shared loss fn
    dis, adv, fm = encodec_gan_losses(logits, feats, logits, feats)
    assert np.isfinite(float(dis)) and float(fm) == 0.0
