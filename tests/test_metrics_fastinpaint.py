"""Audio metrics + fast-inpaint path."""

import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.ops.metrics import log_spectral_distance, si_sdr, spectral_snr
from audio_intelligence_tpu.models.a2sb.bridge import BridgeSchedule
from audio_intelligence_tpu.models.a2sb.sampler import (
    find_middle_of_zero_segments,
    fast_inpaint_sample,
)


def test_metrics_identity_and_ordering():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(8000) * 0.3, jnp.float32)
    noisy = x + 0.1 * jnp.asarray(rng.standard_normal(8000), jnp.float32)
    very_noisy = x + 0.5 * jnp.asarray(rng.standard_normal(8000), jnp.float32)

    assert float(log_spectral_distance(x, x)) < 1e-3
    assert float(log_spectral_distance(noisy, x)) < float(
        log_spectral_distance(very_noisy, x)
    )
    assert float(si_sdr(x, x)) > 60
    assert float(si_sdr(noisy, x)) > float(si_sdr(very_noisy, x))
    # scale invariance
    np.testing.assert_allclose(
        float(si_sdr(2.0 * noisy, x)), float(si_sdr(noisy, x)), atol=1e-3
    )
    assert float(spectral_snr(noisy, x)) > float(spectral_snr(very_noisy, x))


def test_find_middle_of_zero_segments():
    m = np.asarray([1, 1, 0, 0, 0, 1, 1, 0, 1])
    assert find_middle_of_zero_segments(m) == [3, 7]
    assert find_middle_of_zero_segments(np.ones(5)) == []
    assert find_middle_of_zero_segments(np.zeros(4)) == [2]


def test_fast_inpaint_fills_gaps_only():
    sched = BridgeSchedule(beta_max=1.0)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, 8, 96, 3)), jnp.float32)
    x1 = jnp.asarray(rng.standard_normal((1, 8, 96, 3)), jnp.float32)
    # two short gaps
    mask = jnp.zeros((1, 8, 96, 3)).at[:, :, 20:26, :].set(1.0)
    mask = mask.at[:, :, 60:64, :].set(1.0)

    def oracle_vf(x_t, t):
        # window-shape-agnostic oracle: pulls content toward zero
        return sched.v_target(t, x_t, jnp.zeros_like(x_t))

    t_steps = jnp.linspace(1.0, 0.01, 11)
    out = fast_inpaint_sample(
        oracle_vf, sched, jax.random.PRNGKey(0), x1, t_steps, mask,
        win_length=32, hop_length=32, chunk_size=4,
    )
    out = np.asarray(out)
    # known region exactly preserved
    known = np.asarray(mask) == 0
    np.testing.assert_allclose(out[known], np.asarray(x1)[known], atol=1e-5)
    # gaps actually filled toward the oracle target (zero)
    gap = np.asarray(mask) == 1
    assert np.abs(out[gap]).mean() < np.abs(np.asarray(x1)[gap]).mean() * 0.5


def test_codebook_usage():
    from audio_intelligence_tpu.ops.metrics import codebook_usage

    codes = jnp.asarray(np.random.default_rng(0).integers(0, 8, (4, 10, 2)))
    hist, used = codebook_usage(codes, 16)
    assert hist.shape == (2, 16)
    np.testing.assert_allclose(np.asarray(hist.sum(-1)), 1.0, atol=1e-6)
    assert (np.asarray(used) <= 0.5 + 1e-6).all()  # codes only span [0, 8)


def test_copy_matching_params_partial_load():
    from audio_intelligence_tpu.train.checkpoint import copy_matching_params

    t = {"a": jnp.zeros((2, 3)), "b": {"c": jnp.zeros(4), "d": jnp.zeros(5)}}
    s = {"a": jnp.ones((2, 3)), "b": {"c": jnp.ones(9)}}
    m, copied, skipped = copy_matching_params(t, s, verbose=False)
    assert float(m["a"].sum()) == 6.0       # copied (shape match)
    assert float(m["b"]["c"].sum()) == 0.0  # kept (shape mismatch)
    assert float(m["b"]["d"].sum()) == 0.0  # kept (missing in source)
    assert len(copied) == 1 and len(skipped) == 2
