"""ETTA DiT, conditioners, and RF sampler tests (tiny configs)."""

import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.etta.dit import (
    DiffusionTransformer,
    cfg_forward,
    apply_neox_rope,
    modulate,
)
from audio_intelligence_tpu.models.etta.conditioners import (
    MultiConditioner,
    route_conditioning,
    hash_text_embedding,
)
from audio_intelligence_tpu.models.etta.sampling import (
    sample_discrete_euler,
    sample_discrete_heun,
    sample_v_ddim,
    sample_discrete_euler_inpaint,
    autoguided,
)


def tiny_dit(**kw):
    cfg = dict(
        io_channels=8,
        embed_dim=64,
        depth=2,
        num_heads=4,
        cond_token_dim=16,
        global_cond_dim=32,
        xattn_heads=4,
        xattn_d_memory=16,
        rope_base=16384.0,
    )
    cfg.update(kw)
    return DiffusionTransformer(**cfg)


def _inputs(b=2, t=12, tc=5):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, 8)), jnp.float32)
    tt = jnp.asarray([0.3, 0.9][:b])
    cond = jnp.asarray(rng.standard_normal((b, tc, 16)), jnp.float32)
    mask = jnp.ones((b, tc), bool)
    g = jnp.asarray(rng.standard_normal((b, 32)), jnp.float32)
    return x, tt, cond, mask, g


def test_dit_forward_shape_and_zero_init():
    model = tiny_dit()
    x, t, cond, mask, g = _inputs()
    params = model.init(jax.random.PRNGKey(0), x, t, cond, mask, g)
    out = model.apply(params, x, t, cond, mask, g)
    assert out.shape == x.shape
    # adaLN-Zero + zero final linear → output must be exactly zero at init
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_dit_conditioning_changes_output():
    model = tiny_dit()
    x, t, cond, mask, g = _inputs()
    params = model.init(jax.random.PRNGKey(0), x, t, cond, mask, g)
    leaves, td = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree.unflatten(
        td, [l + 0.05 * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)]
    )
    o1 = model.apply(params, x, t, cond, mask, g)
    o2 = model.apply(params, x, t, cond * 2.0, mask, g)
    assert np.abs(np.asarray(o1 - o2)).max() > 1e-6
    # memory mask must matter: masking all cond tokens == zero-ish attention
    o3 = model.apply(params, x, t, cond, jnp.zeros_like(mask), g)
    assert np.abs(np.asarray(o1 - o3)).max() > 1e-6


def test_cfg_forward_interpolates():
    """cfg_scale=1 equals the conditional forward; scale>1 extrapolates."""
    model = tiny_dit()
    x, t, cond, mask, g = _inputs()
    params = model.init(jax.random.PRNGKey(0), x, t, cond, mask, g)
    leaves, td = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree.unflatten(
        td, [l + 0.05 * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)]
    )

    def apply_fn(x, t, c, m, g, **kw):
        return model.apply(params, x, t, c, m, g)

    cond_out = apply_fn(x, t, cond, mask, g)
    uncond_out = apply_fn(x, t, jnp.zeros_like(cond), mask, g)
    cfg2 = cfg_forward(apply_fn, x, t, cond, mask, g, cfg_scale=2.0)
    ref = uncond_out + (cond_out - uncond_out) * 2.0
    np.testing.assert_allclose(np.asarray(cfg2), np.asarray(ref), atol=1e-5)


def test_neox_rope_properties():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2, 16, 8)), jnp.float32)
    y = apply_neox_rope(x, 10000.0)
    # position 0 unrotated
    np.testing.assert_allclose(np.asarray(y[:, :, 0]), np.asarray(x[:, :, 0]), atol=1e-6)
    # norm preserved
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )


def test_rf_euler_recovers_target_with_oracle():
    """Oracle RF velocity v = (x_t − x₀)/t integrates back to x₀."""
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, 16, 4)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((2, 16, 4)), jnp.float32)

    def oracle(x, t):
        tt = t.reshape(-1, 1, 1)
        return (x - x0) / jnp.maximum(tt, 1e-6)

    out = sample_discrete_euler(oracle, noise, steps=100)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=0.05)
    out_h = sample_discrete_heun(oracle, noise, steps=50)
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(x0), atol=0.05)


def test_v_ddim_recovers_target_with_oracle():
    """Oracle v-model: v = α·ε − σ·x₀ with the trajectory's own (x₀, ε)."""
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, 8, 4)), jnp.float32)

    def oracle(x, t):
        tt = t.reshape(-1, 1, 1)
        alpha = jnp.cos(tt * jnp.pi / 2)
        sigma = jnp.sin(tt * jnp.pi / 2)
        # x = α x0 + σ ε ⇒ ε = (x − α x0)/σ;  v = α ε − σ x0
        eps = (x - alpha * x0) / jnp.maximum(sigma, 1e-6)
        return alpha * eps - sigma * x0

    noise = jnp.asarray(rng.standard_normal((1, 8, 4)), jnp.float32)
    out = sample_v_ddim(oracle, noise, steps=50)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=0.05)


def test_autoguidance_formula():
    good = lambda x, t: jnp.ones_like(x)
    bad = lambda x, t: jnp.zeros_like(x)
    fn = autoguided(good, bad, scale=2.0)
    out = fn(jnp.zeros((1, 4, 2)), jnp.asarray([0.5]))
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_inpaint_sampler_keeps_known():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, 16, 4)), jnp.float32)
    init = jnp.asarray(rng.standard_normal((1, 16, 4)), jnp.float32)
    mask = jnp.zeros((1, 16, 4)).at[:, 4:12, :].set(1.0)

    def oracle(x, t):
        tt = t.reshape(-1, 1, 1)
        return (x - x0) / jnp.maximum(tt, 1e-6)

    noise = jnp.asarray(rng.standard_normal((1, 16, 4)), jnp.float32)
    out = sample_discrete_euler_inpaint(
        oracle, noise, init, mask, jax.random.PRNGKey(0), steps=50
    )
    known = np.asarray(mask) == 0
    np.testing.assert_allclose(np.asarray(out)[known], np.asarray(init)[known], atol=1e-6)
    # the generate region must follow the oracle trajectory to x0 — it is
    # released from step 0 (polarity check: a flipped bmask pins it to the
    # noised init instead)
    gen = ~known
    np.testing.assert_allclose(np.asarray(out)[gen], np.asarray(x0)[gen], atol=0.05)


def test_build_mask_and_generation_inpaint_dispatch():
    from audio_intelligence_tpu.models.etta.generation import (
        GenerationConfig,
        build_mask,
        cut_paste,
        generate_diffusion_cond,
    )

    m = build_mask(100, {"maskstart": 20, "maskend": 60, "softnessL": 10,
                         "softnessR": 10, "marination": 0.0})
    assert m.shape == (100,)
    assert m[:20].sum() == 0 and (m[30:50] == 1).all() and m[60:].sum() == 0
    assert 0 < m[25] < 1 and 0 < m[55] < 1  # hann ramps
    m2 = build_mask(100, {"maskstart": 20, "maskend": 60, "softnessL": 0,
                          "softnessR": 0, "marination": 0.2})
    assert np.isclose(m2[40], 0.8)

    # cut_paste moves a segment onto a zero canvas
    lat = jnp.asarray(np.arange(32, dtype=np.float32).reshape(1, 16, 2))
    cp = cut_paste(lat, 16, {"cropfrom": 0, "pastefrom": 50, "pasteto": 100})
    assert np.asarray(cp)[0, :8].sum() == 0
    np.testing.assert_allclose(np.asarray(cp)[0, 8:], np.asarray(lat)[0, :8])

    # end-to-end dispatch: RF-euler inpaint and a k-sampler, oracle model
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, 16, 4)), jnp.float32)

    def dit_apply(x, t, c, cm, g, **kw):
        tt = t.reshape(-1, 1, 1)
        return (x - x0) / jnp.maximum(tt, 1e-6)

    cfg = GenerationConfig(
        steps=20, cfg_scale=1.0, sample_size=64, downsampling_ratio=4,
        latent_dim=4,
    )
    init = jnp.asarray(rng.standard_normal((1, 16, 4)), jnp.float32)
    mask = jnp.asarray(build_mask(16, {"maskstart": 25, "maskend": 75,
                                       "softnessL": 0, "softnessR": 0,
                                       "marination": 0.0}))
    out = generate_diffusion_cond(
        dit_apply, lambda z: z, jax.random.PRNGKey(0),
        jnp.zeros((1, 1, 8)), jnp.ones((1, 1), bool), jnp.zeros((1, 8)),
        cfg, init_latent=init, mask=mask,
    )
    keep = np.asarray(mask) == 0
    np.testing.assert_allclose(
        np.asarray(out)[0][keep], np.asarray(init)[0][keep], atol=1e-6
    )

    # k-sampler path runs and lands on the oracle's x0 (v-objective oracle)
    def v_dit_apply(x, t, c, cm, g, **kw):
        tt = t.reshape(-1, 1, 1)
        alpha = jnp.cos(tt * jnp.pi / 2)
        sigma = jnp.sin(tt * jnp.pi / 2)
        eps = (x - alpha * x0) / jnp.maximum(sigma, 1e-6)
        return alpha * eps - sigma * x0

    cfg_k = GenerationConfig(
        steps=30, cfg_scale=1.0, sampler_type="dpmpp-2m", sample_size=64,
        downsampling_ratio=4, latent_dim=4,
    )
    out_k = generate_diffusion_cond(
        v_dit_apply, lambda z: z, jax.random.PRNGKey(0),
        jnp.zeros((1, 1, 8)), jnp.ones((1, 1), bool), jnp.zeros((1, 8)),
        cfg_k,
    )
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(x0), atol=0.05)


def test_multiconditioner_and_routing():
    texts = ["a dog barking", "rain on a tin roof"]
    emb, mask = hash_text_embedding(texts, dim=16, max_length=8)
    # determinism
    emb2, _ = hash_text_embedding(texts, dim=16, max_length=8)
    np.testing.assert_allclose(emb, emb2)

    mc = MultiConditioner(
        number_ids=("seconds_start", "seconds_total"), number_dim=16, text_ids=("prompt",)
    )
    metadata = {
        "prompt_embed": jnp.asarray(emb),
        "prompt_mask": jnp.asarray(mask),
        "seconds_start": jnp.asarray([0.0, 0.0]),
        "seconds_total": jnp.asarray([10.0, 10.0]),
    }
    params = mc.init(jax.random.PRNGKey(0), metadata)
    cond = mc.apply(params, metadata)
    cross, cross_mask, g = route_conditioning(cond)
    assert cross.shape == (2, 8 + 2, 16)
    assert cross_mask.shape == (2, 10)
    assert g.shape == (2, 32)


def test_tokenizer_lut_conditioner():
    from audio_intelligence_tpu.models.etta.conditioners import (
        TokenizerLUTConditioner,
        tokenize_for_lut,
    )

    ids, mask = tokenize_for_lut(["hi", "longer text"], max_length=8)
    assert ids.shape == (2, 8) and mask[0, :2].all() and not mask[0, 2:].any()
    cond = TokenizerLUTConditioner(vocab_size=257, output_dim=16, max_length=8)
    params = cond.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask))
    emb, m = cond.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    assert emb.shape == (2, 8, 16)
    # padded positions zeroed
    assert np.abs(np.asarray(emb[0, 2:])).max() == 0


def test_dit_remat_matches_plain():
    """DiffusionTransformer(remat=True) — per-block activation
    checkpointing for larger single-chip train batches — is numerics-
    neutral in forward and gradient."""
    import numpy as np

    kwargs = dict(
        io_channels=4, embed_dim=32, depth=2, num_heads=4,
        cond_token_dim=16, global_cond_dim=32, xattn_heads=4,
        xattn_d_memory=16,
    )
    d0 = DiffusionTransformer(**kwargs)
    d1 = DiffusionTransformer(**kwargs, remat=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 4)), jnp.float32)
    t = jnp.asarray([0.3, 0.7], jnp.float32)
    cond = jnp.asarray(rng.standard_normal((2, 5, 16)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((2, 32)), jnp.float32)
    params = d0.init(jax.random.PRNGKey(0), x, t, cond, None, g)

    def loss(p, m):
        return jnp.mean(m.apply(p, x, t, cond, None, g) ** 2)

    l0, g0 = jax.value_and_grad(loss)(params, d0)
    l1, g1 = jax.value_and_grad(loss)(params, d1)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
