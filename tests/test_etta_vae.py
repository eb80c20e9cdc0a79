"""ETTA VAE: conv golden tests vs torch, shape/ratio tests, bottlenecks."""

import numpy as np
import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow
import torch
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.etta.vae import (
    WNConv,
    WNConvTranspose,
    SnakeBeta,
    OobleckEncoder,
    OobleckDecoder,
    AudioAutoencoder,
    chunked_apply,
)
from audio_intelligence_tpu.models.etta.bottleneck import (
    VAEBottleneck,
    vae_sample,
    TanhBottleneck,
)


def test_wnconv_matches_torch_conv():
    """Our explicit weight-norm conv == torch weight_norm(Conv1d) given the
    same v/g/bias."""
    rng = np.random.default_rng(0)
    b, t, cin, cout, k, dil = 2, 64, 8, 16, 7, 3
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    v = rng.standard_normal((k, cin, cout)).astype(np.float32)
    g = np.abs(rng.standard_normal(cout)).astype(np.float32) + 0.5
    bias = rng.standard_normal(cout).astype(np.float32)

    pad = dil * (k - 1) // 2
    model = WNConv(cout, k, dilation=dil, padding=pad)
    params = {"params": {"v": jnp.asarray(v), "g": jnp.asarray(g), "bias": jnp.asarray(bias)}}
    ours = np.asarray(model.apply(params, jnp.asarray(x)))

    conv = torch.nn.Conv1d(cin, cout, k, dilation=dil, padding=pad)
    conv = torch.nn.utils.weight_norm(conv)
    with torch.no_grad():
        # torch weight layout (out, in, k); ours (k, in, out)
        conv.weight_v.copy_(torch.from_numpy(v.transpose(2, 1, 0)))
        conv.weight_g.copy_(torch.from_numpy(g).view(-1, 1, 1))
        conv.bias.copy_(torch.from_numpy(bias))
        ref = conv(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_wnconvtranspose_matches_torch():
    rng = np.random.default_rng(1)
    b, t, cin, cout, stride = 2, 16, 8, 4, 4
    k, pad = 2 * stride, 2  # ceil(stride/2)
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    v = rng.standard_normal((k, cin, cout)).astype(np.float32)
    g = np.abs(rng.standard_normal(cin)).astype(np.float32) + 0.5
    bias = rng.standard_normal(cout).astype(np.float32)

    model = WNConvTranspose(cout, k, stride=stride, padding=pad)
    params = {"params": {"v": jnp.asarray(v), "g": jnp.asarray(g), "bias": jnp.asarray(bias)}}
    ours = np.asarray(model.apply(params, jnp.asarray(x)))

    tconv = torch.nn.ConvTranspose1d(cin, cout, k, stride=stride, padding=pad)
    tconv = torch.nn.utils.weight_norm(tconv)
    with torch.no_grad():
        # torch ConvTranspose1d weight layout (in, out, k); ours (k, in, out)
        tconv.weight_v.copy_(torch.from_numpy(v.transpose(1, 2, 0)))
        tconv.weight_g.copy_(torch.from_numpy(g).view(-1, 1, 1))
        tconv.bias.copy_(torch.from_numpy(bias))
        ref = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
    assert ours.shape == ref.shape == (b, t * stride, cout)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_snake_beta_formula():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 4)), jnp.float32)
    model = SnakeBeta()
    params = model.init(jax.random.PRNGKey(0), x)
    # log-scale init 0 → α=β=1
    out = np.asarray(model.apply(params, x))
    ref = np.asarray(x) + np.sin(np.asarray(x)) ** 2
    np.testing.assert_allclose(out, ref, atol=1e-5)


def small_codec(latent=8):
    enc = OobleckEncoder(
        in_channels=2, channels=16, latent_dim=2 * latent, c_mults=(1, 2), strides=(2, 4)
    )
    dec = OobleckDecoder(
        out_channels=2, channels=16, latent_dim=latent, c_mults=(1, 2), strides=(2, 4)
    )
    return enc, dec


def test_oobleck_shapes_and_ratio():
    enc, dec = small_codec()
    x = jnp.zeros((2, 64, 2))
    ep = enc.init(jax.random.PRNGKey(0), x)
    z = enc.apply(ep, x)
    assert z.shape == (2, 8, 16)  # 64 / (2·4), 2×latent channels
    dp = dec.init(jax.random.PRNGKey(1), z[..., :8])
    y = dec.apply(dp, z[..., :8])
    assert y.shape == (2, 64, 2)


def test_vae_bottleneck_sample_and_kl():
    rng = np.random.default_rng(0)
    mean = jnp.asarray(rng.standard_normal((4, 16, 8)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal((4, 16, 8)), jnp.float32)
    z, kl = vae_sample(jax.random.PRNGKey(0), mean, scale)
    assert z.shape == mean.shape
    # KL must match the reference formula evaluated in numpy
    stdev = np.log1p(np.exp(np.asarray(scale))) + 1e-4
    var = stdev**2
    ref_kl = (np.asarray(mean) ** 2 + var - np.log(var) - 1).sum(-1).mean()
    np.testing.assert_allclose(float(kl), ref_kl, rtol=1e-4)

    bn = VAEBottleneck()
    x = jnp.concatenate([mean, scale], axis=-1)
    z2, info = bn.encode(x, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-6)
    np.testing.assert_allclose(float(info["kl"]), float(kl), atol=1e-6)


def test_autoencoder_end_to_end():
    enc, dec = small_codec()
    ae = AudioAutoencoder(
        encoder=enc, decoder=dec, bottleneck=VAEBottleneck(),
        downsampling_ratio=8, io_channels=2,
    )
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 2)), jnp.float32)
    variables = ae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    y, info = ae.apply(variables, x, jax.random.PRNGKey(1))
    assert y.shape == x.shape
    assert "kl" in info and np.isfinite(float(info["kl"]))


def test_chunked_apply_matches_full_for_identity():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 512, 4)), jnp.float32)
    out = chunked_apply(lambda c: c, x, in_chunk=128, out_chunk=128, in_overlap=32, out_overlap=32)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_chunked_apply_scaling():
    """Encode-like 4× downsample via mean-pooling must stitch correctly."""
    x = jnp.asarray(np.arange(1 * 256 * 1, dtype=np.float32).reshape(1, 256, 1))
    pool = lambda c: c.reshape(c.shape[0], -1, 4, 1).mean(axis=2)
    full = pool(x)
    out = chunked_apply(pool, x, in_chunk=64, out_chunk=16, in_overlap=16, out_overlap=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=1e-5)
