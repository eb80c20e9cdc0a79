"""Gradient accumulation + remat."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.train.common import accumulate_gradients, remat


def test_accumulate_matches_full_batch():
    params = {"w": jnp.asarray([1.0, -2.0, 0.5])}
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((4, 8, 3)), jnp.float32)  # 4 microbatches

    def loss_fn(p, batch):
        return jnp.mean((batch @ p["w"]) ** 2)

    mean_loss, mean_grads = accumulate_gradients(loss_fn, params, data)

    full_loss, full_grads = jax.value_and_grad(
        lambda p: jnp.mean(
            jnp.stack([loss_fn(p, data[i]) for i in range(4)])
        )
    )(params)
    np.testing.assert_allclose(float(mean_loss), float(full_loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mean_grads["w"]), np.asarray(full_grads["w"]), rtol=1e-5
    )


def test_remat_same_values_and_grads():
    def f(p, x):
        h = jnp.tanh(x @ p)
        return jnp.sum(jnp.sin(h @ p.T))

    p = jnp.asarray(np.random.default_rng(0).standard_normal((4, 4)), jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 4)), jnp.float32)
    f_r = remat(f, "nothing")
    np.testing.assert_allclose(float(f(p, x)), float(f_r(p, x)), rtol=1e-6)
    g1 = jax.grad(f)(p, x)
    g2 = jax.grad(f_r)(p, x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5)
    assert remat(f, "none") is f
