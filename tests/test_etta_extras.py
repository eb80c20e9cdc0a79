"""k-diffusion solvers, FSQ bottleneck."""

import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.etta.kdiffusion import (
    sigmas_polyexponential,
    v_denoiser,
    sample_k,
)
from audio_intelligence_tpu.models.etta.bottleneck import FSQBottleneck


def test_sigma_schedule():
    s = np.asarray(sigmas_polyexponential(10, 0.3, 500.0))
    np.testing.assert_allclose(s[0], 500.0, rtol=1e-5)
    np.testing.assert_allclose(s[-2], 0.3, rtol=1e-4)
    assert s[-1] == 0.0
    assert (np.diff(s) < 0).all()


def _oracle_v_model(x0):
    """v-model consistent with x = α x0 + σ ε on the VP circle."""

    def model(x, t):
        tt = t.reshape((-1,) + (1,) * (x.ndim - 1))
        alpha = jnp.cos(tt * jnp.pi / 2)
        sigma = jnp.sin(tt * jnp.pi / 2)
        eps = (x - alpha * x0) / jnp.maximum(sigma, 1e-8)
        return alpha * eps - sigma * x0

    return model


def test_v_denoiser_recovers_x0():
    """D(x, σ) of the oracle v-model must return x0 exactly."""
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, 8, 4)), jnp.float32)
    den = v_denoiser(_oracle_v_model(x0))
    # x at noise level σ: x = (x0 + σ ε)/... Karras-space x = x0 + σ·ε
    eps = jnp.asarray(rng.standard_normal((2, 8, 4)), jnp.float32)
    for sigma in (0.5, 2.0, 30.0):
        x = x0 + sigma * eps
        out = den(x, jnp.full((2,), sigma))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-3)


def test_k_samplers_recover_target():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, 8, 4)), jnp.float32)
    model = _oracle_v_model(x0)
    noise = jnp.asarray(rng.standard_normal((1, 8, 4)), jnp.float32)
    for sampler in ("k-euler", "k-heun", "dpmpp-2m"):
        out = sample_k(model, noise, steps=50, sampler_type=sampler)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(x0), atol=0.05,
            err_msg=f"sampler {sampler}",
        )


def test_full_k_sampler_family_recovers_target():
    """Every solver the reference exposes converges to x0 on the oracle."""
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.standard_normal((1, 8, 4)), jnp.float32)
    model = _oracle_v_model(x0)
    noise = jnp.asarray(rng.standard_normal((1, 8, 4)), jnp.float32)
    key = jax.random.PRNGKey(7)
    for sampler in (
        "k-dpmpp-2s-ancestral",
        "k-dpm-2",
        "dpm-fast",
        "dpm-adaptive",
        "dpmpp-2m-sde",
        "dpmpp-3m-sde",
    ):
        out = sample_k(model, noise, steps=30, sampler_type=sampler, key=key)
        assert np.isfinite(np.asarray(out)).all(), sampler
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(x0), atol=0.05,
            err_msg=f"sampler {sampler}",
        )


def _gaussian_denoiser(s_d: float):
    """Exact denoiser for data ~ N(0, s_d²): D(x, σ) = x·s_d²/(s_d²+σ²).

    The probability-flow ODE dx/dσ = (x−D)/σ = x·σ/(s_d²+σ²) has the
    closed form x(b) = x(a)·√((s_d²+b²)/(s_d²+a²)) — an analytic gate on
    the integrator math itself (not just the final denoise step).
    """

    def denoise(x, sigma):
        s = sigma.reshape((-1,) + (1,) * (x.ndim - 1))
        return x * (s_d**2 / (s_d**2 + s**2))

    return denoise


def test_k_solver_integration_accuracy():
    from audio_intelligence_tpu.models.etta.kdiffusion import (
        sample_dpm_2,
        sample_dpm_adaptive,
        sample_dpm_fast,
        sample_dpmpp_2m,
        sample_dpmpp_2m_sde,
        sample_dpmpp_2s_ancestral,
        sample_dpmpp_3m_sde,
        sample_k_euler,
        sample_k_heun,
    )

    s_d, sigma_max, sigma_min = 1.0, 20.0, 0.01
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 16)), jnp.float32) * sigma_max
    den = _gaussian_denoiser(s_d)
    sigmas = sigmas_polyexponential(50, sigma_min, sigma_max)
    # final σ = 0 ⇒ analytic shrink factor √(s_d²/(s_d²+σmax²))
    target = np.asarray(x) * np.sqrt(s_d**2 / (s_d**2 + sigma_max**2))
    key = jax.random.PRNGKey(3)

    results = {
        "euler": sample_k_euler(den, x, sigmas),
        "heun": sample_k_heun(den, x, sigmas),
        "dpmpp-2m": sample_dpmpp_2m(den, x, sigmas),
        "dpm-2": sample_dpm_2(den, x, sigmas),
        # eta=0 reduces the stochastic samplers to their deterministic cores
        "2s-ancestral(η0)": sample_dpmpp_2s_ancestral(den, x, sigmas, key, eta=0.0),
        "2m-sde(η0)": sample_dpmpp_2m_sde(den, x, sigmas, key, eta=0.0),
        "3m-sde(η0)": sample_dpmpp_3m_sde(den, x, sigmas, key, eta=0.0),
        "dpm-fast": sample_dpm_fast(den, x, sigma_min, sigma_max, 60),
        "dpm-adaptive": sample_dpm_adaptive(
            den, x, sigma_min, sigma_max, rtol=0.002, atol=1e-5
        ),
    }
    scale = np.abs(target).max()
    # euler is 1st order; adaptive's contract is per-STEP tolerance, which
    # accumulates over the trajectory (same as k-diffusion's controller)
    tols = {"euler": 0.06, "dpm-adaptive": 0.05}
    for name, out in results.items():
        tol = tols.get(name, 0.03)
        err = np.abs(np.asarray(out) - target).max() / scale
        assert err < tol, f"{name}: relative error {err:.4f}"
    # higher-order solvers must beat Euler on the same grid
    e_euler = np.abs(np.asarray(results["euler"]) - target).max()
    for name in ("heun", "dpmpp-2m", "dpm-2"):
        e = np.abs(np.asarray(results[name]) - target).max()
        assert e <= e_euler * 1.01, f"{name} ({e}) not better than euler ({e_euler})"


def test_k_sampler_pre_step_hook_runs():
    """pre_step must be applied before every model evaluation."""
    from audio_intelligence_tpu.models.etta.kdiffusion import sample_k_euler

    den = _gaussian_denoiser(1.0)
    sigmas = sigmas_polyexponential(10, 0.01, 20.0)
    x = jnp.ones((1, 4), jnp.float32) * 20.0

    def pin_first(i, x, sigma, key):
        return x.at[:, 0].set(5.0)

    out = sample_k_euler(den, x, sigmas, pre_step=pin_first)
    # the pinned component took its final euler step from 5.0, the rest
    # followed the full trajectory — they must differ
    o = np.asarray(out)
    assert not np.allclose(o[:, 0], o[:, 1])


def test_fsq_roundtrip():
    fsq = FSQBottleneck(levels=(8, 5, 5, 5))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 6, 4)) * 2, jnp.float32)
    zq, info = fsq.encode(x)
    assert zq.shape == x.shape
    # quantized values are integers within the level bounds
    z = np.asarray(zq)
    np.testing.assert_allclose(z, np.round(z), atol=1e-5)
    assert (np.abs(z[..., 0]) <= 3.5).all()
    # codes decode back to the same quantized vectors
    back = fsq.decode_tokens(info["codes"])
    np.testing.assert_allclose(np.asarray(back), z, atol=1e-5)
    assert int(np.asarray(info["codes"]).max()) < 8 * 5 * 5 * 5


def test_make_cond_model_fn_gradient_guidance():
    """Grad-based conditioning (sampling.py:302-313): the wrapped denoiser
    adds cond_grad·σ², and jax.grad-built guidance pulls an euler sample
    toward the objective's optimum."""
    import jax
    from audio_intelligence_tpu.models.etta.sampling import make_cond_model_fn

    target = jnp.full((1, 4, 2), 2.0)

    def model_fn(x, t, **kw):
        return x * 0.9  # plain contraction toward 0

    # guidance = ∇ₓ of -||denoised(x) - target||² … in the reference, the
    # cond_fn author differentiates; here we express it with jax.grad of
    # the objective as a function of the denoised estimate
    w = 0.1

    def cond_fn(x, sigma, denoised=None, **kw):
        obj = lambda d: -w * jnp.sum((d - target) ** 2)
        return jax.grad(obj)(denoised)

    guided = make_cond_model_fn(model_fn, cond_fn)
    # exact contract: denoised + grad·σ²
    x = jnp.ones((1, 4, 2))
    sigma = jnp.asarray([0.5])
    want = model_fn(x, sigma) + (-2.0 * w * (model_fn(x, sigma) - target)) * 0.25
    np.testing.assert_allclose(np.asarray(guided(x, sigma)), np.asarray(want), atol=1e-5)

    # end-to-end with the k-diffusion euler sampler (the reference feeds
    # cond_model_fn into sample_k, sampling.py:393-401): guidance on the
    # DENOISED estimate pulls the trajectory toward the target — the
    # guided sample must land measurably higher than the unguided
    # contraction toward 0
    from audio_intelligence_tpu.models.etta.kdiffusion import sample_k_euler

    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 2))
    sigmas = jnp.linspace(1.0, 0.0, 21)
    plain = sample_k_euler(model_fn, noise, sigmas)
    pulled = sample_k_euler(guided, noise, sigmas)
    m_plain = float(jnp.mean(plain))
    m_guided = float(jnp.mean(pulled))
    assert m_plain < m_guided <= 2.5, (m_plain, m_guided)
