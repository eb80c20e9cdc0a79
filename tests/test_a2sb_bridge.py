"""Golden tests for the Schrödinger-bridge math vs the reference equations.

The reference formulas (A2SB/diffusion.py:90-168) are re-evaluated here in
float64 numpy as an independent oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.a2sb.bridge import BridgeSchedule, gaussian_product_coef


BETA_MAX = 1.0


def ref_int_beta(t, beta_max=BETA_MAX):
    t = np.asarray(t, dtype=np.float64)
    full = 2 * beta_max * 0.5**3 / 3
    return np.where(t > 0.5, full - beta_max * (1 - t) ** 3 / 3, beta_max * t**3 / 3)


def test_int_beta_matches_reference():
    sched = BridgeSchedule(beta_max=BETA_MAX)
    t = np.linspace(0.0, 1.0, 101).astype(np.float32)
    ours = np.asarray(sched.int_beta(jnp.asarray(t)))
    np.testing.assert_allclose(ours, ref_int_beta(t), atol=1e-6)


def test_int_beta_is_integral_of_beta():
    sched = BridgeSchedule(beta_max=BETA_MAX)
    t = np.linspace(0, 1, 2001)
    beta = np.asarray(sched.beta(jnp.asarray(t)))
    integral = np.concatenate([[0], np.cumsum((beta[1:] + beta[:-1]) / 2 * np.diff(t))])
    ours = np.asarray(sched.int_beta(jnp.asarray(t)))
    np.testing.assert_allclose(ours, integral, atol=1e-5)


def test_q_sample_moments():
    """E[x_t] = c0·x0 + c1·x1, Var[x_t] = σ_fwd²σ_rev²/(σ_fwd²+σ_rev²)."""
    sched = BridgeSchedule(beta_max=BETA_MAX)
    t = jnp.full((20000,), 0.3)
    x0 = jnp.ones((20000, 1, 1, 1)) * 2.0
    x1 = jnp.ones((20000, 1, 1, 1)) * -1.0
    x_t = sched.q_sample(jax.random.PRNGKey(0), t, x0, x1)
    sf = np.sqrt(ref_int_beta(0.3))
    sr = np.sqrt(ref_int_beta(0.7))
    c0, c1, var = gaussian_product_coef(sf, sr)
    mean_expected = c0 * 2.0 + c1 * -1.0
    np.testing.assert_allclose(float(x_t.mean()), mean_expected, atol=0.02)
    np.testing.assert_allclose(float(x_t.std()), np.sqrt(var), rtol=0.05)


def test_p_posterior_deterministic_at_t0():
    """At t_prev=0 no noise is added; posterior mean matches the reference."""
    sched = BridgeSchedule(beta_max=BETA_MAX)
    x_t = jnp.ones((4, 2, 2, 3)) * 0.5
    x_0 = jnp.zeros((4, 2, 2, 3))
    t, t_prev = jnp.asarray(0.05), jnp.asarray(0.0)
    out1 = sched.p_posterior(jax.random.PRNGKey(0), t_prev, t, x_t, x_0)
    out2 = sched.p_posterior(jax.random.PRNGKey(1), t_prev, t, x_t, x_0)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-7)
    # reference closed form
    std_t = np.sqrt(ref_int_beta(0.05))
    std_prev = np.sqrt(ref_int_beta(0.0))
    std_delta = np.sqrt(std_t**2 - std_prev**2)
    mu_x0, mu_xt, _ = gaussian_product_coef(std_prev, std_delta)
    np.testing.assert_allclose(np.asarray(out1), mu_x0 * 0.0 + mu_xt * 0.5, atol=1e-6)


def test_pred_x0_inverts_v_target():
    sched = BridgeSchedule(beta_max=BETA_MAX)
    rng = np.random.default_rng(0)
    x_0 = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    x_t = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    t = jnp.asarray([0.3, 0.8])
    v = sched.v_target(t, x_t, x_0)
    np.testing.assert_allclose(
        np.asarray(sched.pred_x0(t, x_t, v)), np.asarray(x_0), atol=1e-5
    )
