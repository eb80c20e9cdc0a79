"""MoE-enabled backbone (Qwen3-MoE parity) + aux loss surfacing."""

import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.ualm.backbone import BackboneConfig, QwenBackbone, KVCache
from audio_intelligence_tpu.models.ualm.lm import ParallelLM, multistream_loss


def moe_cfg():
    return BackboneConfig(
        hidden_size=32, num_layers=2, num_heads=4, num_kv_heads=2,
        intermediate_size=64, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=32,
        # no-drop capacity (e/k) so prefill == incremental decode exactly
        moe_capacity_factor=2.0,
    )


def test_moe_backbone_forward_and_aux():
    cfg = moe_cfg()
    model = QwenBackbone(cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 32)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out, inter = model.apply(variables, x, mutable=["intermediates"])
    assert out.shape == x.shape
    aux = inter["intermediates"]["moe_aux"][0]
    assert float(aux) > 0  # load-balance loss accumulated over layers
    # MoE params exist per layer
    assert "moe" in variables["params"]["layers_0"]


def test_moe_backbone_with_cache():
    cfg = moe_cfg()
    model = QwenBackbone(cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 6, 32)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    full = model.apply(variables, x)
    cache = KVCache.init(cfg, 1, 8)
    pos = jnp.arange(6)[None]
    (h, cache), _ = model.apply(
        variables, x[:, :4], pos[:, :4], cache, mutable=["intermediates"]
    )
    outs = [h]
    for i in range(4, 6):
        (h, cache), _ = model.apply(
            variables, x[:, i : i + 1], pos[:, i : i + 1], cache,
            mutable=["intermediates"],
        )
        outs.append(h)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc), atol=2e-4)


def test_moe_parallel_lm_trains():
    cfg = moe_cfg()
    model = ParallelLM(cfg=cfg, vocab_size=64, num_stream=2)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 30, (2, 6, 2)), jnp.int32)
    mask = jnp.ones((2, 6, 2))
    variables = model.init(jax.random.PRNGKey(0), ids)
    loss, stats = multistream_loss(model, variables, ids, mask, [(30, 60)])
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda p: multistream_loss(model, {"params": p}, ids, mask, [(30, 60)])[0]
    )(variables["params"])
    gn = float(jax.tree.reduce(lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0))
    assert np.isfinite(gn) and gn > 0
