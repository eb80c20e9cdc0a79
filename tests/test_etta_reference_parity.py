"""Golden forward-parity gates against the ACTUAL reference ETTA modules.

Round-2 VERDICT missing #2: ETTA was the only stack without reference-
module numerics (the DiT test was structure-only; VAE parity was against
torch primitives). Here the real ``DiffusionTransformer``
(ETTA/stable_audio_tools/models/dit.py + etta_transformer.py, naive
attention path — no flash_attn needed) and ``OobleckEncoder/Decoder``
(autoencoders.py:322-493) execute under import stubs (the
``rotary_embedding_torch`` recipe from test_a2sb_reference_parity), and
our flax models under ``tools/convert_checkpoint.py`` conversion must
reproduce their forward numerics.

Stubbed third-party deps and their fidelity requirements:
- flash_attn.layers.rotary.RotaryEmbedding IS exercised by attn_naive
  (etta_transformer.py:432-433 ``self.rope(qkv)``) → faithful NeoX-style
  non-interleaved rotary (the flash-attn convention our dit.py mirrors);
- dac Snake1d / x_transformers / torchaudio / alias_free_torch / encodec
  are imported but never executed on these paths → inert placeholders.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # torch-reference fixtures

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference/ETTA/stable_audio_tools"


class _FlashRotaryStub(torch.nn.Module):
    """flash_attn.layers.rotary.RotaryEmbedding semantics, naive-path
    subset: non-interleaved (GPT-NeoX rotate-half) rotary over the full
    head dim, positions 0..T-1, inv_freq = base^(-2i/d)."""

    def __init__(self, dim, base=10000.0, interleaved=False, **kw):
        super().__init__()
        assert not interleaved
        self.dim, self.base = dim, float(base)

    def _cos_sin(self, t_len):
        inv = 1.0 / (
            self.base
            ** (torch.arange(0, self.dim, 2, dtype=torch.float32) / self.dim)
        )
        ang = torch.outer(torch.arange(t_len, dtype=torch.float32), inv)
        return ang.cos(), ang.sin()

    @staticmethod
    def _apply(x, cos, sin):
        d2 = cos.shape[-1]
        x1, x2 = x[..., :d2], x[..., d2 : 2 * d2]
        c = cos[None, :, None, :]
        s = sin[None, :, None, :]
        return torch.cat(
            [x1 * c - x2 * s, x2 * c + x1 * s, x[..., 2 * d2 :]], dim=-1
        )

    def forward(self, qkv, kv=None, **kw):
        if kv is None:  # packed [B, T, 3, H, D] self-attention path
            cos, sin = self._cos_sin(qkv.shape[1])
            q = self._apply(qkv[:, :, 0], cos, sin)
            k = self._apply(qkv[:, :, 1], cos, sin)
            return torch.stack([q, k, qkv[:, :, 2]], dim=2)
        q = self._apply(qkv, *self._cos_sin(qkv.shape[1]))
        cos, sin = self._cos_sin(kv.shape[1])
        k = self._apply(kv[:, :, 0], cos, sin)
        return q, torch.stack([k, kv[:, :, 1]], dim=2)


def _mod(name):
    m = types.ModuleType(name)
    sys.modules[name] = m
    return m


def _load_reference_etta():
    """Load the reference dit/etta_transformer/autoencoders modules into a
    synthetic ``sat_ref`` package with faithful stubs for the absent
    third-party deps."""
    if "sat_ref.models.dit" in sys.modules:
        return (
            sys.modules["sat_ref.models.dit"],
            sys.modules["sat_ref.models.autoencoders"],
        )

    if "flash_attn" not in sys.modules:
        fa = _mod("flash_attn")

        def _no_flash(*a, **k):  # pragma: no cover
            raise RuntimeError("flash path must not run under the stub")

        fa.flash_attn_varlen_qkvpacked_func = _no_flash
        fa.flash_attn_varlen_kvpacked_func = _no_flash
        fal = _mod("flash_attn.layers")
        far = _mod("flash_attn.layers.rotary")
        far.RotaryEmbedding = _FlashRotaryStub
        fa.layers = fal
        fal.rotary = far

    if "dac" not in sys.modules:
        _mod("dac")
        _mod("dac.nn")
        dacl = _mod("dac.nn.layers")

        class Snake1d(torch.nn.Module):  # imported, unused by Oobleck
            def __init__(self, channels):
                super().__init__()
                self.alpha = torch.nn.Parameter(torch.ones(1, channels, 1))

            def forward(self, x):  # pragma: no cover
                a = self.alpha
                return x + (a + 1e-9).reciprocal() * torch.sin(a * x).pow(2)

        dacl.Snake1d = Snake1d

        # dac's WNConv layers ARE the Oobleck weight-norm convs — these
        # stand-ins replicate descript-audio-codec exactly:
        # WNConv1d = weight_norm(nn.Conv1d(*args, **kwargs))
        from torch.nn.utils import weight_norm

        dacl.WNConv1d = lambda *a, **k: weight_norm(torch.nn.Conv1d(*a, **k))
        dacl.WNConvTranspose1d = lambda *a, **k: weight_norm(
            torch.nn.ConvTranspose1d(*a, **k)
        )
        dacq = _mod("dac.nn.quantize")
        dacq.ResidualVectorQuantize = type("ResidualVectorQuantize", (), {})

    if "x_transformers" not in sys.modules:
        xt = _mod("x_transformers")
        xt.ContinuousTransformerWrapper = type("ContinuousTransformerWrapper", (), {})
        xt.Encoder = type("Encoder", (), {})

    if "torchaudio" not in sys.modules:
        ta = _mod("torchaudio")
        ta.transforms = _mod("torchaudio.transforms")

    if "alias_free_torch" not in sys.modules:
        aft = _mod("alias_free_torch")

        class Activation1d(torch.nn.Module):  # antialias off in tests
            def __init__(self, activation):  # pragma: no cover
                super().__init__()
                self.act = activation

            def forward(self, x):  # pragma: no cover
                return self.act(x)

        aft.Activation1d = Activation1d

    if "encodec" not in sys.modules:
        _mod("encodec")
        _mod("encodec.modules")
        encc = _mod("encodec.modules.conv")
        encc.SConv1d = type("SConv1d", (), {})
        encc.SConvTranspose1d = type("SConvTranspose1d", (), {})

    # synthetic package skeleton for the reference's relative imports
    pkg = _mod("sat_ref")
    pkg.__path__ = []
    models = _mod("sat_ref.models")
    models.__path__ = []
    inference = _mod("sat_ref.inference")
    inference.__path__ = []
    _mod("sat_ref.inference.sampling").sample = lambda *a, **k: None
    _mod("sat_ref.inference.utils").prepare_audio = lambda *a, **k: None
    bott = _mod("sat_ref.models.bottleneck")
    bott.Bottleneck = type("Bottleneck", (torch.nn.Module,), {})
    bott.DiscreteBottleneck = type("DiscreteBottleneck", (bott.Bottleneck,), {})
    diff = _mod("sat_ref.models.diffusion")
    for n in (
        "ConditionedDiffusionModel",
        "DAU1DCondWrapper",
        "UNet1DCondWrapper",
        "DiTWrapper",
    ):
        setattr(diff, n, type(n, (), {}))
    fact = _mod("sat_ref.models.factory")
    fact.create_pretransform_from_config = lambda *a, **k: None
    fact.create_bottleneck_from_config = lambda *a, **k: None
    _mod("sat_ref.models.pretransforms").Pretransform = type("Pretransform", (), {})

    def load(name):
        spec = importlib.util.spec_from_file_location(
            f"sat_ref.models.{name}", f"{REF}/models/{name}.py"
        )
        m = importlib.util.module_from_spec(spec)
        sys.modules[f"sat_ref.models.{name}"] = m
        spec.loader.exec_module(m)
        return m

    load("blocks")
    load("transformer")
    load("etta_transformer")
    dit = load("dit")
    ae = load("autoencoders")

    # Drop the third-party stubs from sys.modules: they exist only so the
    # reference files import. Leaving spec-less stand-ins registered
    # breaks later availability probes in the same pytest session
    # (importlib.util.find_spec raises ValueError on a module whose
    # __spec__ is unset — observed as xcodec/whisper fixture errors in
    # the full-suite run). The loaded sat_ref modules hold direct
    # references, so they keep working.
    for name in list(sys.modules):
        root = name.split(".")[0]
        if root in (
            "flash_attn", "dac", "x_transformers", "torchaudio",
            "alias_free_torch", "encodec",
        ) and not getattr(sys.modules[name], "__file__", None):
            del sys.modules[name]
    return dit, ae


def _randomize(model, scale=0.05, seed=3):
    """Fill zero-init params (adaLN gates, pre/post convs) with noise so
    parity exercises every branch."""
    torch.manual_seed(seed)
    with torch.no_grad():
        for _n, p in model.named_parameters():
            if p.abs().sum() == 0:
                p.copy_(torch.randn_like(p) * scale)
    return model.eval()


def test_etta_dit_reference_forward_parity():
    """Tiny reference DiffusionTransformer (etta_transformer backend,
    naive attention, rope) vs our converted flax DiT — full forward."""
    ref_dit_mod, _ = _load_reference_etta()
    from tools.convert_checkpoint import convert_etta_dit
    from audio_intelligence_tpu.models.etta.dit import DiffusionTransformer

    depth, d, heads = 2, 64, 2
    ref = ref_dit_mod.DiffusionTransformer(
        io_channels=4,
        patch_size=1,
        embed_dim=d,
        cond_token_dim=16,
        project_cond_tokens=False,
        global_cond_dim=d,
        depth=depth,
        num_heads=heads,
        transformer_type="etta_transformer",
        global_cond_type="adaLN",
        is_causal=False,
        pos_emb_name="rope",
        rope_base=16384,
        use_flash_attention=False,
        deterministic=False,
        p_dropout=0.0,
        apply_norm_to_cond=True,
        kernel_size=1,
        context_xattn={"n_heads": 2, "d_heads": 16, "pos_emb_name": ""},
    )
    _randomize(ref)

    t_len, c_len = 24, 5
    torch.manual_seed(0)
    x_t = torch.randn(1, 4, t_len)
    t_t = torch.tensor([0.4])
    cond_t = torch.randn(1, c_len, 16)
    g_t = torch.randn(1, d)
    with torch.no_grad():
        ref_out = ref._forward(
            x_t,
            t_t,
            cross_attn_cond=cond_t,
            cross_attn_cond_mask=torch.ones(1, c_len, dtype=torch.bool),
            global_embed=g_t,
        ).numpy()

    params = convert_etta_dit(
        {k: v.numpy() for k, v in ref.state_dict().items()},
        depth=depth,
        strip_prefix="",
    )
    ours_model = DiffusionTransformer(
        io_channels=4,
        embed_dim=d,
        depth=depth,
        num_heads=heads,
        cond_token_dim=16,
        global_cond_dim=d,
        project_cond_tokens=False,
        xattn_heads=2,
        xattn_d_memory=16,
        p_dropout=0.0,
    )
    out = ours_model.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(x_t.numpy().transpose(0, 2, 1)),
        jnp.asarray([0.4]),
        jnp.asarray(cond_t.numpy()),
        jnp.ones((1, c_len), bool),
        jnp.asarray(g_t.numpy()),
    )
    ours = np.asarray(out).transpose(0, 2, 1)
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=2e-3)


def test_oobleck_reference_roundtrip_parity():
    """Tiny reference OobleckEncoder/Decoder (weight-norm convs + snake)
    vs our converted flax modules — encode and decode forwards."""
    _, ae = _load_reference_etta()
    from tools.convert_checkpoint import convert_oobleck
    from audio_intelligence_tpu.models.etta import vae as our_vae

    ch, latent = 8, 6
    c_mults, strides = [1, 2], [2, 4]
    torch.manual_seed(1)
    ref_enc = ae.OobleckEncoder(
        in_channels=2, channels=ch, latent_dim=latent,
        c_mults=c_mults, strides=strides, use_snake=True,
    )
    ref_dec = ae.OobleckDecoder(
        out_channels=2, channels=ch, latent_dim=latent,
        c_mults=c_mults, strides=strides, use_snake=True,
    )
    _randomize(ref_enc, seed=4)
    _randomize(ref_dec, seed=5)

    x_t = torch.randn(1, 2, 64)
    with torch.no_grad():
        lat_ref = ref_enc(x_t)
        wav_ref = ref_dec(lat_ref)

    n_blocks = len(c_mults)
    enc_params = convert_oobleck(
        {k: v.numpy() for k, v in ref_enc.state_dict().items()}, n_blocks
    )
    dec_params = convert_oobleck(
        {k: v.numpy() for k, v in ref_dec.state_dict().items()},
        n_blocks, decoder=True,
    )
    our_enc = our_vae.OobleckEncoder(
        in_channels=2, channels=ch, latent_dim=latent,
        c_mults=tuple(c_mults), strides=tuple(strides),
    )
    our_dec = our_vae.OobleckDecoder(
        out_channels=2, channels=ch, latent_dim=latent,
        c_mults=tuple(c_mults), strides=tuple(strides),
        final_tanh=True,  # the reference decoder's default
    )
    lat = our_enc.apply(
        {"params": jax.tree.map(jnp.asarray, enc_params)},
        jnp.asarray(x_t.numpy().transpose(0, 2, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(lat).transpose(0, 2, 1), lat_ref.numpy(), atol=2e-4, rtol=2e-3
    )
    wav = our_dec.apply(
        {"params": jax.tree.map(jnp.asarray, dec_params)}, lat
    )
    np.testing.assert_allclose(
        np.asarray(wav).transpose(0, 2, 1), wav_ref.numpy(), atol=5e-4, rtol=5e-3
    )
