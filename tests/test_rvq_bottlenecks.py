"""RVQ-family bottlenecks (ETTA stable_audio_tools/models/bottleneck.py:
150-316): RVQ / RVQVAE (lucidrains-style plain residual VQ) and
DAC-RVQ(-VAE) (projected codebooks, cosine lookup). Gates: shapes, the
straight-through value identity encode(z) == decode_tokens(codes), loss
keys, and factory dispatch + AudioAutoencoder integration."""

import numpy as np
import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.etta.bottleneck import (
    DACRVQBottleneck,
    DACRVQVAEBottleneck,
    RVQBottleneck,
    RVQVAEBottleneck,
)
from audio_intelligence_tpu.models.etta.factory import (
    create_bottleneck_from_config,
)


def test_rvq_bottleneck_roundtrip():
    bn = RVQBottleneck(num_quantizers=4, codebook_size=32, dim=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 16))
    variables = bn.init(jax.random.PRNGKey(1), x, method="encode")
    q, info = bn.apply(variables, x, method="encode")
    assert q.shape == x.shape
    assert info["quantizer_indices"].shape == (2, 10, 4)
    assert np.isfinite(float(info["quantizer_loss"]))
    # straight-through value identity: quantized == lookup(codes)
    via_tokens = bn.apply(
        variables, info["quantizer_indices"], method="decode_tokens"
    )
    np.testing.assert_allclose(
        np.asarray(q), np.asarray(via_tokens), atol=1e-5
    )


def test_rvq_vae_bottleneck():
    bn = RVQVAEBottleneck(num_quantizers=2, codebook_size=16, dim=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 16))  # 2×dim
    variables = bn.init(
        jax.random.PRNGKey(1), x, jax.random.PRNGKey(2), method="encode"
    )
    q, info = bn.apply(variables, x, jax.random.PRNGKey(2), method="encode")
    assert q.shape == (1, 6, 8)
    assert "kl" in info and np.isfinite(float(info["kl"]))
    assert info["quantizer_indices"].shape == (1, 6, 2)


@pytest.mark.parametrize("cls", [DACRVQBottleneck, DACRVQVAEBottleneck])
def test_dac_rvq_bottlenecks(cls):
    is_vae = cls is DACRVQVAEBottleneck
    dim = 16
    bn = cls(n_codebooks=3, codebook_size=32, codebook_dim=4)
    in_dim = 2 * dim if is_vae else dim
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, in_dim))
    args = (x, jax.random.PRNGKey(2)) if is_vae else (x,)
    variables = bn.init(jax.random.PRNGKey(1), *args, method="encode")
    z, info = bn.apply(variables, *args, method="encode")
    assert z.shape == (2, 5, dim)
    assert info["codes"].shape == (2, 5, 3)
    assert info["latents"].shape == (2, 5, 12)  # n_q · codebook_dim
    assert np.isfinite(float(info["vq/commitment_loss"]))
    assert np.isfinite(float(info["vq/codebook_loss"]))
    # z == from_codes(codes) (straight-through value identity)
    via_tokens = bn.apply(variables, info["codes"], method="decode_tokens")
    np.testing.assert_allclose(
        np.asarray(z), np.asarray(via_tokens), atol=1e-5
    )


def test_factory_dispatch():
    rvq = create_bottleneck_from_config(
        {"type": "rvq", "config": {"num_quantizers": 4, "codebook_size": 64,
                                   "dim": 32}}
    )
    assert isinstance(rvq, RVQBottleneck) and rvq.num_quantizers == 4
    dac = create_bottleneck_from_config(
        {"type": "dac_rvq_vae", "config": {"n_codebooks": 9,
                                           "codebook_size": 1024,
                                           "codebook_dim": 8}}
    )
    assert isinstance(dac, DACRVQVAEBottleneck) and dac.n_codebooks == 9


def test_autoencoder_with_rvq_bottleneck():
    """Full composite: Oobleck encoder → RVQ → decoder builds and runs."""
    from audio_intelligence_tpu.models.etta.factory import (
        create_autoencoder_from_config,
    )

    cfg = {
        "io_channels": 1,
        "downsampling_ratio": 4,
        "encoder": {"type": "oobleck", "config": {
            "in_channels": 1, "channels": 8, "latent_dim": 8,
            "c_mults": [1, 2], "strides": [2, 2]}},
        "decoder": {"config": {
            "out_channels": 1, "channels": 8, "latent_dim": 8,
            "c_mults": [1, 2], "strides": [2, 2]}},
        "bottleneck": {"type": "rvq", "config": {
            "num_quantizers": 2, "codebook_size": 16, "dim": 8}},
    }
    ae = create_autoencoder_from_config(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 1))
    variables = ae.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))
    y, info = ae.apply(variables, x, jax.random.PRNGKey(2))
    assert y.shape == x.shape
    assert "quantizer_loss" in info
