"""I2SB-style Schrödinger-bridge math as vectorized pure functions.

Re-derivation of the reference's ``Diffusion`` module
(A2SB/diffusion.py:90-168) with branch-free closed forms suitable for
``jit``/``scan``:

- symmetric noise schedule β(t) = t²·βmax for t ≤ ½ else (1−t)²·βmax,
- closed-form ∫₀ᵗβ,
- q(x_t | x₀, x₁) as the Gaussian product of the forward/reverse bridges,
- posterior p(x_{t_prev} | x_t, x̂₀),
- x̂₀ = x_t − σ_fwd(t)·v from the predicted vector field.

All functions take ``t`` of shape [B] (or scalar) and broadcast over
arbitrary trailing data dims. Randomness is explicit via PRNG keys.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


def _bcast(coef: jax.Array, like: jax.Array) -> jax.Array:
    """Broadcast a [B]-shaped (or scalar) coefficient over data dims."""
    coef = jnp.asarray(coef)
    return coef.reshape(coef.shape + (1,) * (like.ndim - coef.ndim))


def gaussian_product_coef(sigma1, sigma2):
    """N(x|x₀,σ₁²)·N(x|x₁,σ₂²) → (coef₀, coef₁, var) of the product Gaussian."""
    denom = sigma1**2 + sigma2**2
    coef1 = sigma2**2 / denom
    coef2 = sigma1**2 / denom
    var = (sigma1**2 * sigma2**2) / denom
    return coef1, coef2, var


@dataclass(frozen=True)
class BridgeSchedule:
    """The symmetric-β bridge schedule (flagship: beta_max=1.0,
    A2SB/configs/pretrain.yaml:77)."""

    beta_max: float = 1.0

    def beta(self, t):
        return jnp.where(t <= 0.5, t**2, (1.0 - t) ** 2) * self.beta_max

    def int_beta(self, t):
        """∫₀ᵗ β(s) ds, branch-free (A2SB/diffusion.py:114-123)."""
        full = 2.0 * self.beta_max * 0.5**3 / 3.0
        lower = self.beta_max * t**3 / 3.0
        upper = full - self.beta_max * (1.0 - t) ** 3 / 3.0
        return jnp.where(t <= 0.5, lower, upper)

    def std_fwd(self, t):
        return jnp.sqrt(self.int_beta(t))

    def std_rev(self, t):
        return jnp.sqrt(self.int_beta(1.0 - t))

    def std_t(self, t):
        """Marginal std of q(x_t | x₀, x₁)."""
        _, _, var = gaussian_product_coef(self.std_fwd(t), self.std_rev(t))
        return jnp.sqrt(var)

    def q_sample(self, key, t, x_0, x_1, ot_ode: bool = False):
        """Sample x_t ~ q(x_t | x₀, x₁) (A2SB/diffusion.py:137-151)."""
        c0, c1, var = gaussian_product_coef(self.std_fwd(t), self.std_rev(t))
        x_t = _bcast(c0, x_0) * x_0 + _bcast(c1, x_0) * x_1
        if not ot_ode:
            x_t = x_t + _bcast(jnp.sqrt(var), x_0) * jax.random.normal(
                key, x_0.shape, x_0.dtype
            )
        return x_t

    def p_posterior(
        self, key, t_prev, t, x_t, x_0, ot_ode: bool = False, noise=None
    ):
        """One reverse step: sample p(x_{t_prev} | x_t, x̂₀)
        (A2SB/diffusion.py:153-163). Noise is masked where t_prev == 0 or
        under the ODE formulation — branch-free for use inside scan.
        ``noise`` lets the caller supply the standard-normal draw (the
        sampler shares one draw between the posterior and the known-region
        re-noise: they compose on disjoint mask regions, so sharing is
        distribution-identical and saves a full-tensor RNG pass/step)."""
        std_t = self.std_fwd(t)
        std_t_prev = self.std_fwd(t_prev)
        std_delta = jnp.sqrt(std_t**2 - std_t_prev**2)
        mu_x0, mu_xt, var = gaussian_product_coef(std_t_prev, std_delta)
        x_t_prev = _bcast(mu_x0, x_0) * x_0 + _bcast(mu_xt, x_t) * x_t
        if not ot_ode:
            if noise is None:
                noise = jax.random.normal(key, x_t.shape, x_t.dtype)
            noise_std = jnp.where(t_prev > 0, jnp.sqrt(var), 0.0)
            x_t_prev = x_t_prev + _bcast(noise_std, x_t) * noise
        return x_t_prev

    def pred_x0(self, t, x_t, vf_out):
        """x̂₀ = x_t − σ_fwd(t)·v (A2SB/diffusion.py:165-168)."""
        return x_t - _bcast(self.std_fwd(t), x_t) * vf_out

    def v_target(self, t, x_t, x_0):
        """Training target v = (x_t − x₀)/σ_fwd(t)
        (A2SB/A2SB_lightning_module.py:386-387)."""
        return (x_t - x_0) / _bcast(self.std_fwd(t), x_t)
