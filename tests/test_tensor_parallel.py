"""Tensor parallelism: sharded LM forward/loss on the virtual mesh."""

import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from audio_intelligence_tpu.parallel import MeshSpec, make_mesh
from audio_intelligence_tpu.parallel.tp import tp_shardings_for_params
from audio_intelligence_tpu.models.ualm.backbone import BackboneConfig
from audio_intelligence_tpu.models.ualm.lm import ParallelLM, multistream_loss


def test_tp_sharded_lm_matches_replicated():
    mesh = make_mesh(MeshSpec(data=2, tensor=4, fsdp=1, expert=1))
    cfg = BackboneConfig(
        hidden_size=64, num_layers=2, num_heads=8, num_kv_heads=4,
        intermediate_size=128,
    )
    model = ParallelLM(cfg=cfg, vocab_size=96, num_stream=2)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 90, (4, 6, 2)), jnp.int32)
    mask = jnp.ones((4, 6, 2))
    variables = model.init(jax.random.PRNGKey(0), ids)

    # replicated baseline
    base_loss, _ = multistream_loss(model, variables, ids, mask, [(40, 90)])

    shardings = tp_shardings_for_params(variables["params"], mesh)
    sharded = jax.device_put(variables["params"], shardings)
    ids_s = jax.device_put(ids, NamedSharding(mesh, P("data")))
    mask_s = jax.device_put(mask, NamedSharding(mesh, P("data")))

    # spot-check specs
    l0 = sharded["backbone"]["layers_0"]
    assert l0["self_attn"]["q_proj"]["kernel"].sharding.spec == P(None, "tensor")
    assert l0["self_attn"]["o_proj"]["kernel"].sharding.spec == P("tensor", None)
    assert l0["mlp"]["down_proj"]["kernel"].sharding.spec == P("tensor", None)
    assert sharded["lm_head_kernel"].sharding.spec == P(None, "tensor")

    @jax.jit
    def loss_fn(p, ids, mask):
        return multistream_loss(model, {"params": p}, ids, mask, [(40, 90)])[0]

    tp_loss = loss_fn(sharded, ids_s, mask_s)
    np.testing.assert_allclose(float(tp_loss), float(base_loss), rtol=2e-4)
