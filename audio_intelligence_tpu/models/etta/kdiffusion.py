"""k-diffusion-family solvers for the v-objective path.

The reference's ``sample_k`` (ETTA/stable_audio_tools/inference/
sampling.py:321-475) wraps models in k-diffusion's VDenoiser and runs
k-samplers over a polyexponential sigma ramp. This module provides the
same capability natively: the VDenoiser parameterization and the most
used solvers (k-euler, k-heun, dpm++ 2M) as ``lax.scan`` loops.

VDenoiser (Karras preconditioning of a v-model):
  c_skip = 1/(σ²+1), c_out = −σ/√(σ²+1), c_in = 1/√(σ²+1)
  D(x, σ) = c_skip·x + c_out·model(c_in·x, t(σ)),  t(σ) = atan(σ)·2/π
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def sigmas_polyexponential(
    n: int, sigma_min: float = 0.01, sigma_max: float = 100.0, rho: float = 1.0
) -> jax.Array:
    """Polyexponential noise schedule (k_diffusion.sampling), σmax→σmin→0."""
    ramp = jnp.linspace(1.0, 0.0, n) ** rho
    sigmas = jnp.exp(
        ramp * (np.log(sigma_max) - np.log(sigma_min)) + np.log(sigma_min)
    )
    return jnp.concatenate([sigmas, jnp.zeros((1,))])


def v_denoiser(model_fn: Callable) -> Callable:
    """Wrap a v-objective model(x, t) into a Karras denoiser D(x, σ)."""

    def denoise(x, sigma):
        s = sigma.reshape((-1,) + (1,) * (x.ndim - 1))
        c_skip = 1.0 / (s**2 + 1.0)
        c_out = -s / jnp.sqrt(s**2 + 1.0)
        c_in = 1.0 / jnp.sqrt(s**2 + 1.0)
        t = jnp.arctan(sigma) * 2.0 / jnp.pi
        return c_skip * x + c_out * model_fn(c_in * x, t)

    return denoise


def sample_k_euler(denoise: Callable, x: jax.Array, sigmas: jax.Array) -> jax.Array:
    def step(x, ss):
        s, s_next = ss
        d = (x - denoise(x, jnp.broadcast_to(s, (x.shape[0],)))) / s
        return (x + d * (s_next - s)).astype(x.dtype), None

    pairs = jnp.stack([sigmas[:-1], sigmas[1:]], -1)
    x, _ = jax.lax.scan(step, x, pairs)
    return x


def sample_k_heun(denoise: Callable, x: jax.Array, sigmas: jax.Array) -> jax.Array:
    def step(x, ss):
        s, s_next = ss
        b = lambda v: jnp.broadcast_to(v, (x.shape[0],))
        d = (x - denoise(x, b(s))) / s
        x_e = x + d * (s_next - s)

        def heun(_):
            d2 = (x_e - denoise(x_e, b(s_next))) / s_next
            return x + 0.5 * (d + d2) * (s_next - s)

        return jax.lax.cond(s_next > 0, heun, lambda _: x_e, None).astype(x.dtype), None

    pairs = jnp.stack([sigmas[:-1], sigmas[1:]], -1)
    x, _ = jax.lax.scan(step, x, pairs)
    return x


def sample_dpmpp_2m(denoise: Callable, x: jax.Array, sigmas: jax.Array) -> jax.Array:
    """DPM-Solver++(2M) — the reference's dpmpp-2m-sde deterministic core."""

    def t_of(s):
        return -jnp.log(jnp.maximum(s, 1e-10))

    def step(carry, ss):
        x, old_denoised, prev_sigma = carry
        s, s_next = ss
        b = lambda v: jnp.broadcast_to(v, (x.shape[0],))
        den = denoise(x, b(s))
        t, t_next = t_of(s), t_of(s_next)
        h = t_next - t

        def first_or_last(_):
            return (s_next / s) * x - jnp.expm1(-h) * den

        def multistep(_):
            h_last = t - t_of(prev_sigma)
            r = h_last / h
            denoised_d = (1 + 1 / (2 * r)) * den - (1 / (2 * r)) * old_denoised
            return (s_next / s) * x - jnp.expm1(-h) * denoised_d

        has_prev = prev_sigma > 0
        x_next = jax.lax.cond(
            has_prev & (s_next > 0), multistep, first_or_last, None
        )
        return (x_next.astype(x.dtype), den.astype(x.dtype), s), None

    pairs = jnp.stack([sigmas[:-1], sigmas[1:]], -1)
    (x, _, _), _ = jax.lax.scan(step, (x, jnp.zeros_like(x), jnp.zeros(())), pairs)
    return x


def sample_k(
    model_fn: Callable,
    x: jax.Array,
    steps: int = 100,
    sampler_type: str = "dpmpp-2m",
    sigma_min: float = 0.3,
    sigma_max: float = 500.0,
    rho: float = 1.0,
) -> jax.Array:
    """sample_k entry (sampling.py:321-475 defaults for v-objective ckpts:
    σ 0.3/500). x is unit noise; it is scaled by σmax internally."""
    sigmas = sigmas_polyexponential(steps, sigma_min, sigma_max, rho)
    denoise = v_denoiser(model_fn)
    x = x * sigmas[0]
    if sampler_type in ("k-euler", "euler"):
        return sample_k_euler(denoise, x, sigmas)
    if sampler_type in ("k-heun", "heun"):
        return sample_k_heun(denoise, x, sigmas)
    if sampler_type in ("dpmpp-2m", "dpmpp-2m-sde"):
        return sample_dpmpp_2m(denoise, x, sigmas)
    raise ValueError(f"unknown sampler_type {sampler_type}")
