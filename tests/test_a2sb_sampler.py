"""Sampler, MultiDiffusion, corruption, and train-step tests."""

import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.a2sb.bridge import BridgeSchedule
from audio_intelligence_tpu.models.a2sb.sampler import (
    bridge_sample,
    multidiffusion_vf,
    pad_for_multidiffusion,
    unpad_multidiffusion,
    select_expert_vf,
)
from audio_intelligence_tpu.models.a2sb import corruption
from audio_intelligence_tpu.models.a2sb.training import (
    make_optimizer,
    make_train_step,
    TrainState,
)
from audio_intelligence_tpu.models.a2sb.unet import AttnUNetF, sinusoidal_temporal_embedding


def test_pad_unpad_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 300, 3)), jnp.float32)
    padded, width = pad_for_multidiffusion(x, 256, 128)
    assert (padded.shape[-2] - 256) % 128 == 0
    # pad content copied from the head (diffusion.py:67-83)
    to_pad = padded.shape[-2] - 300
    np.testing.assert_allclose(
        np.asarray(padded[..., 300:, :]), np.asarray(x[..., :to_pad, :])
    )
    np.testing.assert_allclose(np.asarray(unpad_multidiffusion(padded, width)), np.asarray(x))


def test_multidiffusion_identity_model_averages_to_input():
    """With vf(x) = x, overlap-averaging must reproduce x exactly."""
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 384, 3)), jnp.float32)
    out = multidiffusion_vf(lambda w, t: w, x, jnp.asarray(0.5), 256, 128, chunk_size=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_multidiffusion_matches_reference_overlap_count():
    """A window-position-dependent vf must be averaged with correct counts."""
    x = jnp.zeros((1, 2, 384, 1))

    def vf(w, t):
        return jnp.ones_like(w)

    out = multidiffusion_vf(vf, x, jnp.asarray(0.5), 256, 128, chunk_size=4)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def test_bridge_sample_recovers_clean_with_oracle_vf():
    """With the oracle vector field v = (x_t − x₀)/σ_fwd, sampling from x₁
    must land on x₀."""
    sched = BridgeSchedule(beta_max=1.0)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, 8, 32, 3)), jnp.float32)
    x1 = jnp.asarray(rng.standard_normal((1, 8, 32, 3)), jnp.float32)

    def oracle_vf(x_t, t):
        return sched.v_target(t, x_t, x0)

    t_steps = jnp.linspace(1.0, 0.01, 51)
    out = bridge_sample(oracle_vf, sched, jax.random.PRNGKey(0), x1, t_steps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=0.05)


def test_bridge_sample_mask_keeps_known_region():
    """Masked sampling must return the known region of x₁ in pred_x0."""
    sched = BridgeSchedule(beta_max=1.0)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, 8, 32, 3)), jnp.float32)
    x1 = jnp.asarray(rng.standard_normal((1, 8, 32, 3)), jnp.float32)
    mask = jnp.zeros((1, 8, 32, 3)).at[:, :, 8:16, :].set(1.0)

    def oracle_vf(x_t, t):
        return sched.v_target(t, x_t, x0)

    t_steps = jnp.linspace(1.0, 0.01, 26)
    out = bridge_sample(oracle_vf, sched, jax.random.PRNGKey(0), x1, t_steps, mask=mask)
    known = np.asarray(mask) == 0
    np.testing.assert_allclose(np.asarray(out)[known], np.asarray(x1)[known], atol=1e-5)


def test_select_expert_vf_switches_at_cutoff():
    vf = select_expert_vf(
        [lambda x, t: jnp.ones_like(x), lambda x, t: jnp.full_like(x, 2.0)], [0.5]
    )
    x = jnp.zeros((1, 2, 2, 1))
    np.testing.assert_allclose(np.asarray(vf(x, jnp.asarray(0.3))), 1.0)
    np.testing.assert_allclose(np.asarray(vf(x, jnp.asarray(0.7))), 2.0)
    np.testing.assert_allclose(np.asarray(vf(x, jnp.asarray(0.5))), 2.0)  # >= cutoff


def test_corruption_masks():
    shape = (64, 128, 3)
    m = corruption.upsample_mask(
        jax.random.PRNGKey(0), shape, 2000, 16000, 44100, dc_dropped=True
    )
    assert m.shape == shape
    col = np.asarray(m[:, 0, 0])
    # contiguous high-band mask
    first = int(np.argmax(col))
    assert col[first:].all() and not col[:first].any()
    low = int(128 * 2000 / 44100)
    assert first >= low

    m2 = corruption.inpaint_mask(jax.random.PRNGKey(1), shape, 0.1, 0.5)
    row = np.asarray(m2[0, :, 0])
    frac = row.mean()
    assert 0.05 <= frac <= 0.55
    # contiguous
    on = np.flatnonzero(row)
    assert (np.diff(on) == 1).all()

    m3 = corruption.extension_mask(jax.random.PRNGKey(2), shape)
    row3 = np.asarray(m3[0, :, 0])
    assert row3.min() == 0 and row3.max() == 1


def test_multinomial_corruption_jits_and_respects_probs():
    c = corruption.MultinomialCorruption(
        p_upsample_mask=1.0,
        p_extension_mask=0.0,
        p_inpaint_mask=0.0,
        sampling_rate=44100,
        upsample_mask_kwargs=dict(min_cutoff_freq=2000, max_cutoff_freq=16000),
        inpainting_mask_kwargs=dict(min_inpainting_frac=0.1, max_inpainting_frac=0.5),
    )
    spec = jnp.asarray(np.random.default_rng(0).standard_normal((64, 128, 3)), jnp.float32)
    corrupted, mask = jax.jit(c.__call__)(jax.random.PRNGKey(0), spec)
    assert corrupted.shape == spec.shape
    # with p_upsample=1 the mask must be a band mask (constant over frames)
    m = np.asarray(mask)
    assert (m.std(axis=1) < 1e-6).all()
    # unmasked region untouched
    np.testing.assert_allclose(
        np.asarray(corrupted)[m == 0], np.asarray(spec)[m == 0], atol=1e-6
    )


def test_train_step_decreases_loss_tiny():
    model = AttnUNetF(
        n_updown_levels=2,
        hidden_channels=(16, 32, 32),
        emb_channels=16,
        band_embedding_dim=4,
        attention_levels=(1,),
        n_attn_heads=2,
        num_res_blocks=1,
        rotary_dim=4,
    )
    sched = BridgeSchedule(beta_max=1.0)
    rng = np.random.default_rng(0)
    batch = {
        "x_0_clean": jnp.asarray(rng.standard_normal((2, 16, 8, 3)), jnp.float32),
        "x_0_corrupted": jnp.asarray(rng.standard_normal((2, 16, 8, 3)), jnp.float32),
        "loss_mask": jnp.ones((2, 16, 8, 1)),
    }
    t_emb = sinusoidal_temporal_embedding(jnp.asarray([0.5, 0.5]), 16)
    params = model.init(jax.random.PRNGKey(0), batch["x_0_clean"], t_emb)["params"]
    tx = make_optimizer(learning_rate=1e-3)
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    # fixed mid-range t (σ_fwd well away from 0) and a fixed key so the
    # optimization signal is deterministic
    step = jax.jit(
        make_train_step(
            model.apply, sched, tx, t_min=0.45, t_max=0.55, n_timestep_channels=16
        )
    )
    losses = []
    for i in range(10):
        state, metrics = step(state, jax.random.PRNGKey(0), batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_bridge_sample_vf_layout_nchw_matches():
    """vf_layout="nchw" (channels-first model IO end-to-end, no boundary
    transposes) produces the same restore as the NHWC path."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from audio_intelligence_tpu.models.a2sb.bridge import BridgeSchedule
    from audio_intelligence_tpu.models.a2sb.sampler import bridge_sample
    from audio_intelligence_tpu.models.a2sb.unet import (
        AttnUNetF,
        sinusoidal_temporal_embedding,
    )

    kw = dict(
        n_updown_levels=2, hidden_channels=(8, 16, 16), emb_channels=8,
        band_embedding_dim=4, attention_levels=(1,), n_attn_heads=1,
        num_res_blocks=1, rotary_dim=2, p_dropout=0.0,
    )
    m_cl = AttnUNetF(**kw)
    m_cf = AttnUNetF(**kw, io_layout="nchw")
    sched = BridgeSchedule(beta_max=1.0)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)
    mask = jnp.asarray(
        (rng.random((1, 16, 16, 3)) > 0.5).astype(np.float32)
    )
    t_steps = jnp.linspace(1.0, 0.1, 6)
    params = m_cl.init(
        jax.random.PRNGKey(0), x1[:, :, :8, :],
        sinusoidal_temporal_embedding(jnp.asarray([0.5]), 8),
    )

    def vf_cl(x, t):
        te = sinusoidal_temporal_embedding(jnp.broadcast_to(t, (x.shape[0],)), 8)
        return m_cl.apply(params, x, te)

    def vf_cf(x, t):
        te = sinusoidal_temporal_embedding(jnp.broadcast_to(t, (x.shape[0],)), 8)
        return m_cf.apply(params, x, te)

    # hop == win + nchw runs the window-layout scan whose per-step noise
    # draws in window order — compare on the deterministic ot_ode path
    out_cl = bridge_sample(
        vf_cl, sched, jax.random.PRNGKey(1), x1, t_steps, mask=mask,
        win_length=8, hop_length=8, chunk_size=2, ot_ode=True,
    )
    out_cf = bridge_sample(
        vf_cf, sched, jax.random.PRNGKey(1), x1, t_steps, mask=mask,
        win_length=8, hop_length=8, chunk_size=2, vf_layout="nchw",
        ot_ode=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_cl), np.asarray(out_cf), atol=1e-4, rtol=1e-4
    )
    # stochastic path: same shape, finite, and known region preserved
    out_sto = bridge_sample(
        vf_cf, sched, jax.random.PRNGKey(1), x1, t_steps, mask=mask,
        win_length=8, hop_length=8, chunk_size=2, vf_layout="nchw",
    )
    assert out_sto.shape == x1.shape
    assert np.isfinite(np.asarray(out_sto)).all()

    # overlapping windows (hop < win): the channels-first path now runs
    # the tile-layout carry, whose noise draws are in tile order — compare
    # deterministically (ot_ode), like the window-scan comparison above
    out_cf_ov = bridge_sample(
        vf_cf, sched, jax.random.PRNGKey(1), x1, t_steps, mask=mask,
        win_length=8, hop_length=4, chunk_size=3, vf_layout="nchw",
        ot_ode=True,
    )
    out_cl_ov = bridge_sample(
        vf_cl, sched, jax.random.PRNGKey(1), x1, t_steps, mask=mask,
        win_length=8, hop_length=4, chunk_size=3, ot_ode=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_cl_ov), np.asarray(out_cf_ov), atol=1e-4, rtol=1e-4
    )
