"""MoE: routing, capacity, load-balance loss, expert-parallel sharding."""

import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from audio_intelligence_tpu.models.ualm.moe import (
    SparseMoEBlock,
    load_balancing_loss,
    moe_param_shardings,
)
from audio_intelligence_tpu.parallel import MeshSpec, make_mesh


def test_load_balancing_loss_uniform_is_one():
    """Perfectly uniform routing → loss = E · E·(1/E · 1/E) = 1."""
    t, e = 64, 4
    probs = jnp.full((t, e), 1.0 / e)
    mask = jnp.zeros((t, e)).at[jnp.arange(t), jnp.arange(t) % e].set(1.0)
    loss = load_balancing_loss(probs, mask)
    np.testing.assert_allclose(float(loss), 1.0, rtol=1e-5)


def test_moe_forward_and_gates():
    block = SparseMoEBlock(hidden_size=16, intermediate_size=32, num_experts=4, top_k=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 16)), jnp.float32)
    params = block.init(jax.random.PRNGKey(0), x)
    y, aux = block.apply(params, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all() and np.isfinite(float(aux))

    # with ample capacity, output == gate-weighted sum of chosen experts'
    # outputs: check differentiability + nonzero grads through router
    def loss(p):
        out, aux = block.apply(p, x)
        return jnp.sum(out**2) + 0.01 * aux

    g = jax.grad(lambda p: loss(p))(params)
    gn = float(jax.tree.reduce(lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0))
    assert gn > 0


def test_moe_capacity_drops_overflow():
    """capacity_factor → tiny forces token drops without NaNs."""
    block = SparseMoEBlock(
        hidden_size=8, intermediate_size=16, num_experts=2, top_k=1,
        capacity_factor=0.1,
    )
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 32, 8)), jnp.float32)
    params = block.init(jax.random.PRNGKey(0), x)
    y, _ = block.apply(params, x)
    # most tokens dropped → most outputs exactly zero
    norms = np.linalg.norm(np.asarray(y)[0], axis=-1)
    assert (norms == 0).sum() > 16


def test_moe_expert_parallel_sharding_runs():
    """Jit the MoE with expert-sharded weights on the 8-device CPU mesh."""
    mesh = make_mesh(MeshSpec(data=2, expert=4, fsdp=1, tensor=1))
    block = SparseMoEBlock(hidden_size=16, intermediate_size=32, num_experts=8, top_k=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8, 16)), jnp.float32)
    params = block.init(jax.random.PRNGKey(0), x)
    shardings = moe_param_shardings(params["params"], mesh)
    sharded = jax.device_put(params["params"], shardings)
    xs = jax.device_put(x, NamedSharding(mesh, P(("data",))))

    @jax.jit
    def fwd(p, x):
        y, aux = block.apply({"params": p}, x)
        return y, aux

    y, aux = fwd(sharded, xs)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    # expert weights actually sharded over the expert axis
    wg = sharded["w_gate"]
    assert wg.sharding.spec == P("expert", None, None)
