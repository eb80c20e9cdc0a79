"""Diffusion solvers: rectified-flow + v-objective, CFG/autoguidance.

Re-designs ETTA/stable_audio_tools/inference/sampling.py as ``lax.scan``
loops (the reference's Python per-step loops each sync the host):

- ``sample_discrete_euler`` (:33-56)       — RF Euler, t: σmax → 0.
- ``sample_discrete_heun``  (:124-158)     — RF Heun (2nd order).
- ``..._autoguidance``      (:60-120, 162-245) — bad-model guidance
  pred = bad + (good − bad)·scale.
- ``sample_v_ddim``         (:249-290)     — v-objective DDIM with η.
- inpainting via the shrinking binary-mask callback (:295-320).

``model_fn(x, t)`` is any denoiser closure (CFG is baked into the closure
via dit.cfg_forward), x is [B, T, C], t is [B].
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def t_schedule_rf(steps: int, sigma_max: float = 1.0) -> jax.Array:
    """linspace(σmax, 0, steps+1) — the RF Euler grid (sampling.py:41)."""
    return jnp.linspace(sigma_max, 0.0, steps + 1)


def sample_discrete_euler(
    model_fn: Callable,
    x: jax.Array,
    steps: int = 100,
    sigma_max: float = 1.0,
) -> jax.Array:
    """Rectified-flow Euler: x_{t-dt} = x + dt·v(x, t) with v = dx/dσ.

    Matches sampling.py:33-56 (the model predicts the velocity pointing
    from data to noise; stepping toward t=0 subtracts it).
    """
    ts = t_schedule_rf(steps, sigma_max)

    def step(x, tt):
        t_curr, t_prev = tt
        v = model_fn(x, jnp.broadcast_to(t_curr, (x.shape[0],)))
        x = (x + (t_prev - t_curr) * v).astype(x.dtype)
        return x, None

    pairs = jnp.stack([ts[:-1], ts[1:]], axis=-1)
    x, _ = jax.lax.scan(step, x, pairs)
    return x


def sample_discrete_heun(
    model_fn: Callable,
    x: jax.Array,
    steps: int = 100,
    sigma_max: float = 1.0,
) -> jax.Array:
    """RF Heun: trapezoidal correction, Euler fallback on the final step
    (sampling.py:124-158)."""
    ts = t_schedule_rf(steps, sigma_max)

    def step(x, tt):
        t_curr, t_prev = tt
        bcast = lambda t: jnp.broadcast_to(t, (x.shape[0],))
        dt = t_prev - t_curr
        v1 = model_fn(x, bcast(t_curr))
        x_euler = x + dt * v1

        def heun(_):
            v2 = model_fn(x_euler, bcast(t_prev))
            return x + dt * 0.5 * (v1 + v2)

        x_next = jax.lax.cond(t_prev > 0, heun, lambda _: x_euler, None)
        return x_next.astype(x.dtype), None

    pairs = jnp.stack([ts[:-1], ts[1:]], axis=-1)
    x, _ = jax.lax.scan(step, x, pairs)
    return x


def autoguided(model_fn: Callable, bad_model_fn: Callable, scale: float) -> Callable:
    """Autoguidance: v = v_bad + (v_good − v_bad)·scale (sampling.py:60-120)."""

    def fn(x, t):
        good = model_fn(x, t)
        bad = bad_model_fn(x, t)
        return bad + (good - bad) * scale

    return fn


def sample_v_ddim(
    model_fn: Callable,
    x: jax.Array,
    key: jax.Array | None = None,
    steps: int = 100,
    eta: float = 0.0,
    sigma_max: float = 1.0,
) -> jax.Array:
    """v-objective DDIM sampler (sampling.py:249-290).

    t runs σmax→0 on the variance-preserving circle:
    alpha = cos(t·π/2), sigma = sin(t·π/2); the model predicts
    v = alpha·eps − sigma·x0.
    """
    ts = jnp.linspace(sigma_max, 0.0, steps + 1)

    def alpha_sigma(t):
        return jnp.cos(t * jnp.pi / 2), jnp.sin(t * jnp.pi / 2)

    def step(carry, tt):
        x, key = carry
        in_dtype = x.dtype
        t_curr, t_next = tt
        alpha, sigma = alpha_sigma(t_curr)
        v = model_fn(x, jnp.broadcast_to(t_curr, (x.shape[0],)))
        pred_x0 = alpha * x - sigma * v
        eps = sigma * x + alpha * v

        alpha_n, sigma_n = alpha_sigma(t_next)
        if eta > 0 and key is not None:
            key, sub = jax.random.split(key)
            ddim_sigma = (
                eta
                * jnp.sqrt(jnp.maximum(sigma_n**2 / jnp.maximum(sigma**2, 1e-12), 0))
                * jnp.sqrt(jnp.maximum(1 - alpha**2 / jnp.maximum(alpha_n**2, 1e-12), 0))
            )
            adjusted = jnp.sqrt(jnp.maximum(sigma_n**2 - ddim_sigma**2, 0.0))
            x = (
                pred_x0 * alpha_n
                + eps * adjusted
                + jax.random.normal(sub, x.shape, x.dtype) * ddim_sigma
            )
        else:
            x = pred_x0 * alpha_n + eps * sigma_n
        return (x.astype(in_dtype), key), None

    pairs = jnp.stack([ts[:-1], ts[1:]], axis=-1)
    (x, _), _ = jax.lax.scan(step, (x, key), pairs)
    return x


def make_cond_model_fn(model_fn: Callable, cond_fn: Callable) -> Callable:
    """Gradient-based conditioning guidance (sampling.py:302-313).

    The reference wraps the denoiser so an external ``cond_fn(x, sigma,
    denoised=...)`` (typically the gradient of some loss w.r.t. x, computed
    with torch.enable_grad) nudges the denoised estimate:
    ``denoised + cond_grad · σ²``. In JAX the gradient is explicit —
    ``cond_fn`` receives (x, sigma, denoised) and returns the guidance
    field directly; build it with ``jax.grad`` of a scalar objective, e.g.

        cond_fn = jax.grad(lambda x, s, denoised: my_loss(denoised))

    The wrapped fn matches the ``model_fn(x, t)`` solver contract, so it
    drops into any sampler in this module.
    """

    def cond_model_fn(x, sigma, **kwargs):
        denoised = model_fn(x, sigma, **kwargs)
        cond_grad = jax.lax.stop_gradient(
            cond_fn(x, sigma, denoised=denoised, **kwargs)
        )
        s = jnp.reshape(sigma, (-1,) + (1,) * (x.ndim - 1))
        return denoised + cond_grad * s**2

    return cond_model_fn


def get_bmask(i, steps, mask):
    """Shrinking binary mask (reference sampling.py:295-299): 1 where the
    soft mask value has been *reached* by the schedule — those positions are
    re-pinned to the noised input; positions with mask > strength evolve
    freely. mask: 0 = keep input, 1 = generate (build_mask convention —
    note the reference's build_mask comment states the opposite of what its
    own callback computes; the code is the spec)."""
    strength = (i + 1.0) / steps
    return jnp.where(mask <= strength, 1.0, 0.0)


def sample_discrete_euler_inpaint(
    model_fn: Callable,
    x: jax.Array,
    init_latent: jax.Array,
    mask: jax.Array,
    key: jax.Array,
    steps: int = 100,
    sigma_max: float = 1.0,
) -> jax.Array:
    """RF Euler with the reference's inpainting-callback semantics
    (sampling.py get_bmask:295-299 + inpainting_callback:370-383), which
    the reference only wires for v-objective checkpoints — this extends it
    to the RF path:

    before each model evaluation, re-impose the *known* region as
    init + noise·σ via the shrinking binary mask: where bmask = 1
    (mask value ≤ schedule strength — the keep region, mask = 0, from the
    first step) x is pinned to the noised input; the generate region
    (mask = 1) is released for the whole trajectory. Soft boundary values
    pin progressively. A final hard paste makes the keep region bit-exact.

    mask: 1 = generate, 0 = keep.
    """
    ts = t_schedule_rf(steps, sigma_max)
    pairs = jnp.stack(
        [ts[:-1], ts[1:], jnp.arange(steps, dtype=ts.dtype)], axis=-1
    )

    def step(carry, tt):
        x, key = carry
        in_dtype = x.dtype
        t_curr, t_prev, i = tt[0], tt[1], tt[2]
        key, sub = jax.random.split(key)
        bmask = get_bmask(i, steps, mask)
        noised = init_latent + jax.random.normal(sub, x.shape, x.dtype) * t_curr
        x = bmask * noised + (1.0 - bmask) * x
        v = model_fn(x, jnp.broadcast_to(t_curr, (x.shape[0],)))
        x = (x + (t_prev - t_curr) * v).astype(in_dtype)
        return (x, key), None

    (x, _), _ = jax.lax.scan(step, (x, key), pairs)
    # final hard paste of the known region
    return jnp.where(mask > 0, x, init_latent)
