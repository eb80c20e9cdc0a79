"""Golden numerical gates against the ACTUAL reference A2SB modules.

/root/reference/A2SB/diffusion.py is pure torch and importable in this
image; networks.py needs only a faithful stand-in for the (uninstalled)
rotary_embedding_torch package. These tests execute the reference bridge
math / UNet directly and assert our JAX implementations (and the
checkpoint converter) reproduce them — the BASELINE "within
spectral-distance tolerance of the PyTorch reference" machinery
(VERDICT r1 item 4).
"""

import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

REF = "/root/reference/A2SB"


def _load_reference_modules():
    """Import reference diffusion+networks with a rotary stand-in."""
    if "rotary_embedding_torch" not in sys.modules:
        stub = types.ModuleType("rotary_embedding_torch")

        class RotaryEmbedding:
            """pixel-mode axial rotary, mirroring the public library's
            semantics (freqs = linspace(1, max_freq/2, dim/2)·π over
            positions linspace(−1, 1, n), interleaved pairs)."""

            def __init__(self, dim, freqs_for="pixel", max_freq=64):
                assert freqs_for == "pixel"
                self.freqs = torch.linspace(1.0, max_freq / 2, dim // 2) * torch.pi

            def get_axial_freqs(self, h, w):
                def axis(n):
                    pos = torch.linspace(-1.0, 1.0, n)
                    ang = pos[:, None] * self.freqs[None, :]
                    return ang.repeat_interleave(2, dim=-1)  # [n, dim]

                ah = axis(h)[:, None, :].expand(h, w, -1)
                aw = axis(w)[None, :, :].expand(h, w, -1)
                return torch.cat([ah, aw], dim=-1)  # [h, w, 2*dim]

        def apply_rotary_emb(freqs, t):
            rot = freqs.shape[-1]
            t_rot, t_pass = t[..., :rot], t[..., rot:]
            x = t_rot.reshape(*t_rot.shape[:-1], -1, 2)
            rh = torch.stack([-x[..., 1], x[..., 0]], dim=-1).reshape(t_rot.shape)
            out = t_rot * freqs.cos() + rh * freqs.sin()
            return torch.cat([out, t_pass], dim=-1)

        stub.RotaryEmbedding = RotaryEmbedding
        stub.apply_rotary_emb = apply_rotary_emb
        sys.modules["rotary_embedding_torch"] = stub

    # networks.py imports (but never calls) utils.SequenceLength; the real
    # utils.py needs torchaudio (absent) — provide a one-symbol stand-in
    # and remove it from sys.modules afterwards ("utils" is too generic a
    # name to leave registered).
    had_utils = "utils" in sys.modules
    if not had_utils:
        ustub = types.ModuleType("utils")

        class SequenceLength:  # pragma: no cover - never instantiated
            def __init__(self, lengths):
                self.lengths = lengths

        ustub.SequenceLength = SequenceLength
        sys.modules["utils"] = ustub

    sys.path.insert(0, REF)
    try:
        import diffusion as ref_diffusion  # noqa: F401
        import networks as ref_networks  # noqa: F401
    finally:
        sys.path.remove(REF)
        if not had_utils:
            sys.modules.pop("utils", None)
    return ref_diffusion, ref_networks


from audio_intelligence_tpu.models.a2sb.bridge import BridgeSchedule


def test_bridge_math_matches_reference():
    ref_diffusion, _ = _load_reference_modules()
    ref = ref_diffusion.Diffusion(beta_max=1.0)
    sched = BridgeSchedule(beta_max=1.0)

    t = torch.tensor([0.05, 0.3, 0.5, 0.7, 0.95], dtype=torch.float32)
    tj = jnp.asarray(t.numpy())
    np.testing.assert_allclose(
        np.asarray(sched.int_beta(tj)), ref.get_int_beta_0_t(t.clone()).numpy(),
        rtol=2e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(sched.std_fwd(tj)), ref.get_std_fwd(t.clone()).numpy(), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(sched.std_t(tj)), ref.get_std_t(t.clone()).numpy(), rtol=2e-5
    )

    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((5, 7, 3)).astype(np.float32)
    x1 = rng.standard_normal((5, 7, 3)).astype(np.float32)

    # deterministic branches: q_sample(ot_ode=True) and pred_x0
    q_ref = ref.q_sample(
        t.clone(), torch.asarray(x0), torch.asarray(x1), ot_ode=True
    ).numpy()
    q_ours = np.asarray(
        sched.q_sample(jax.random.PRNGKey(0), tj, jnp.asarray(x0), jnp.asarray(x1),
                       ot_ode=True)
    )
    np.testing.assert_allclose(q_ours, q_ref, rtol=1e-4, atol=1e-6)

    # get_pred_x0 is called with a scalar t in the reference sampler
    v = rng.standard_normal((5, 7, 3)).astype(np.float32)
    for tv in (0.05, 0.5, 0.95):
        p_ref = ref.get_pred_x0(
            torch.tensor(tv), torch.asarray(x1), torch.asarray(v)
        ).numpy()
        p_ours = np.asarray(
            sched.pred_x0(jnp.asarray(tv), jnp.asarray(x1), jnp.asarray(v))
        )
        np.testing.assert_allclose(p_ours, p_ref, rtol=1e-4, atol=1e-6)


def test_posterior_trajectory_matches_reference():
    """5-step deterministic (ot_ode) posterior loop: trajectories match."""
    ref_diffusion, _ = _load_reference_modules()
    ref = ref_diffusion.Diffusion(beta_max=1.0)
    sched = BridgeSchedule(beta_max=1.0)

    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((1, 8, 4)).astype(np.float32)
    x_t_ref = torch.asarray(rng.standard_normal((1, 8, 4)).astype(np.float32))
    x_t_j = jnp.asarray(x_t_ref.numpy())

    ts = np.linspace(1.0, 0.05, 6)
    for t_curr, t_prev in zip(ts[:-1], ts[1:]):
        x_t_ref = ref.p_posterior(
            torch.tensor(t_prev), torch.tensor(t_curr), x_t_ref,
            torch.asarray(x0), ot_ode=True,
        )
        x_t_j = sched.p_posterior(
            jax.random.PRNGKey(0), jnp.asarray(t_prev), jnp.asarray(t_curr),
            x_t_j, jnp.asarray(x0), ot_ode=True,
        )
    np.testing.assert_allclose(
        np.asarray(x_t_j), x_t_ref.numpy(), rtol=1e-4, atol=1e-6
    )


def test_unet_forward_parity_via_converter():
    """Tiny reference AttnUNetF (WITH rotary attention + band embeddings)
    → convert_a2sb_unet → flax forward matches torch ≤ fp32 tolerance."""
    _, ref_networks = _load_reference_modules()
    sys.path.insert(0, "/root/repo")
    from tools.convert_checkpoint import convert_a2sb_unet
    from audio_intelligence_tpu.models.a2sb.unet import (
        AttnUNetF,
        sinusoidal_temporal_embedding,
    )

    torch.manual_seed(0)
    # head_dim must be ≥ 2·rotary_dim(32) = 64 at attention levels:
    # channels 64 with 1 head at level 1
    ref_model = ref_networks.AttnUNetF(
        n_updown_levels=2,
        in_channels=3,
        hidden_channels=[32, 64, 64],
        out_channels=3,
        emb_channels=8,
        band_embedding_dim=4,
        attention_levels=[1],
        n_attn_heads=1,
        num_res_blocks=1,
        use_attn_input_norm=True,
    ).eval()
    # randomize the zero-initialized convs so the test has signal there
    with torch.no_grad():
        for name, p in ref_model.named_parameters():
            if p.abs().sum() == 0:
                p.copy_(torch.randn_like(p) * 0.05)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 16, 8)).astype(np.float32)  # NCHW
    t = np.asarray([0.3, 0.7], np.float32)

    # reference temporal embedding with the lightning-module min_freq=0.5
    # (A2SB_lightning_module.py:223), matching our default
    temb_mod = ref_networks.SinusoidalTemporalEmbedding(n_bands=4, min_freq=0.5)
    with torch.no_grad():
        t_emb_ref = temb_mod(torch.asarray(t))
        out_ref = ref_model(torch.asarray(x), t_emb_ref).numpy()

    params = convert_a2sb_unet(
        {k: v.numpy() for k, v in ref_model.state_dict().items()},
        n_updown_levels=2,
        num_res_blocks=1,
        attention_levels=(1,),
        strip_prefix="",
    )
    model = AttnUNetF(
        n_updown_levels=2,
        hidden_channels=(32, 64, 64),
        emb_channels=8,
        band_embedding_dim=4,
        attention_levels=(1,),
        n_attn_heads=1,
        num_res_blocks=1,
    )
    t_emb = sinusoidal_temporal_embedding(jnp.asarray(t), 8)
    np.testing.assert_allclose(
        np.asarray(t_emb), t_emb_ref.numpy(), atol=1e-5
    )
    out = model.apply(
        {"params": params}, jnp.asarray(np.moveaxis(x, 1, -1)), t_emb
    )
    out_nchw = np.moveaxis(np.asarray(out), -1, 1)
    np.testing.assert_allclose(out_nchw, out_ref, atol=2e-4, rtol=1e-3)
