"""DAC critics + phoneme/CLAP conditioners (gap-fill for SURVEY §2.2)."""

import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.etta.discriminators import (
    DACDiscriminator,
    dac_gan_losses,
)
from audio_intelligence_tpu.models.etta.conditioners import (
    ARPABET_PHONEMES,
    PhonemeConditioner,
    clap_audio_embed_host,
    clap_text_embed_host,
    phonemize_host,
)


def test_dac_discriminator_shapes_and_losses():
    disc = DACDiscriminator(periods=(2, 3), fft_sizes=(512, 256))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4096, 1))
    params = disc.init(jax.random.PRNGKey(1), x)
    fmaps_real = disc.apply(params, x)
    fmaps_fake = disc.apply(params, x * 0.5 + 0.01)
    # 2 MPD + 2 MRD ensembles, each a list ending in a logits map
    assert len(fmaps_real) == 4
    for fm in fmaps_real:
        assert fm[-1].shape[-1] == 1
    dis, gen, fm = dac_gan_losses(fmaps_real, fmaps_fake)
    assert np.isfinite(float(dis)) and np.isfinite(float(gen))
    assert float(fm) > 0  # real != fake -> nonzero feature distance
    # identical inputs -> zero feature distance, gen pulls logits to 1
    dis2, gen2, fm2 = dac_gan_losses(fmaps_real, fmaps_real)
    assert float(fm2) == 0.0


def test_dac_discriminator_grads_flow():
    disc = DACDiscriminator(periods=(2,), fft_sizes=(256,))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2048, 1))
    params = disc.init(jax.random.PRNGKey(1), x)

    def dloss(p):
        fr = disc.apply(p, x)
        ff = disc.apply(p, x * 0.3)
        d, _, _ = dac_gan_losses(fr, ff)
        return d

    g = jax.grad(dloss)(params)
    leaves = jax.tree.leaves(g)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_phonemize_and_conditioner():
    ids, mask = phonemize_host(["hello world", "a"], max_length=32)
    assert ids.shape == (2, 32)
    assert mask[0].sum() > mask[1].sum() > 0
    assert ids[ids > 0].max() <= len(ARPABET_PHONEMES) + 1
    # deterministic
    ids2, _ = phonemize_host(["hello world", "a"], max_length=32)
    np.testing.assert_array_equal(ids, ids2)

    cond = PhonemeConditioner(output_dim=16, project_out=True)
    params = cond.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask))
    emb, m = cond.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    assert emb.shape == (2, 32, 16)
    assert m.shape == (2, 32)


def test_clap_fallback_embeddings():
    t = clap_text_embed_host(["rock music", "rock music", "rain"])
    assert t.shape == (3, 512)
    np.testing.assert_allclose(t[0], t[1], atol=1e-6)  # deterministic
    assert not np.allclose(t[0], t[2])
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0, atol=1e-4)

    sr = 16000
    wav = np.stack([
        np.sin(2 * np.pi * 440 * np.arange(sr) / sr),
        np.random.default_rng(0).standard_normal(sr) * 0.1,
    ]).astype(np.float32)
    a = clap_audio_embed_host(wav, sr)
    assert a.shape == (2, 512)
    assert not np.allclose(a[0], a[1])
    np.testing.assert_allclose(np.linalg.norm(a, axis=-1), 1.0, atol=1e-4)


def test_factory_dispatches_dac_and_oobleck():
    from audio_intelligence_tpu.models.etta.factory import (
        create_discriminator_from_config,
    )
    from audio_intelligence_tpu.models.etta.discriminators import (
        OobleckDiscriminator,
    )

    d = create_discriminator_from_config(
        {"discriminator": {"type": "dac", "config": {"periods": [2, 3]}}}
    )
    assert isinstance(d, DACDiscriminator) and d.periods == (2, 3)
    o = create_discriminator_from_config(
        {"discriminator": {"type": "oobleck", "config": {}}}
    )
    assert isinstance(o, OobleckDiscriminator)


def test_vae_train_steps_dac_flavor():
    from audio_intelligence_tpu.models.etta.training import (
        VAETrainState,
        make_vae_optimizers,
        make_vae_train_steps,
    )

    import flax.linen as nn

    class AE(nn.Module):
        @nn.compact
        def __call__(self, x, rng):
            h = nn.Conv(4, (9,), padding=4)(x)
            y = nn.Conv(x.shape[-1], (9,), padding=4)(jax.nn.silu(h))
            return y, {"kl": jnp.mean(h**2)}

    ae = AE()
    disc = DACDiscriminator(periods=(2,), fft_sizes=(256,))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2048, 1))
    gp = ae.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))["params"]
    dp = disc.init(jax.random.PRNGKey(3), x)["params"]
    gen_tx, disc_tx = make_vae_optimizers()
    gen_step, disc_step = make_vae_train_steps(
        ae.apply, disc.apply, gen_tx, disc_tx,
        stereo=False, gan_type="dac", sample_rate=16000,
    )
    state = VAETrainState(
        gen_params=gp, ema_params=gp, disc_params=dp,
        gen_opt=gen_tx.init(gp), disc_opt=disc_tx.init(dp), step=0,
    )
    state, m = jax.jit(gen_step)(state, jax.random.PRNGKey(4), x)
    assert np.isfinite(float(m["loss"]))
    state, md = jax.jit(disc_step)(state, jax.random.PRNGKey(5), x)
    assert np.isfinite(float(md["loss_dis"]))
