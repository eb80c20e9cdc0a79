"""ETTA inpaint training masks (reference keep-convention: 1 = keep,
0 = masked/generated — training/diffusion.py:1022-1135)."""

import pytest

# Compile-heavy suite: marked slow so the default `pytest -m "not slow"`
# run stays a <5-minute smoke signal (tests/test_fast_sanity.py covers
# this area's quick sanity); run the full suite with plain `pytest tests/`.
pytestmark = pytest.mark.slow

import numpy as np
import jax

from audio_intelligence_tpu.models.etta.inpaint_masks import speechflow_mask, random_mask


def test_speechflow_mask_spans_and_uncond():
    m = np.asarray(speechflow_mask(jax.random.PRNGKey(0), 64, 200, p_cond=0.9))
    assert m.shape == (64, 200)
    assert ((m == 0) | (m == 1)).all()
    frac_kept = m.mean(axis=1)
    # unconditional rows (p=0.1): fully masked
    assert (frac_kept == 0.0).any()
    # partial rows mask at least min_span frames in ≥ min_span-long spans
    partial = m[frac_kept > 0]
    assert len(partial) > 0
    for row in partial:
        masked = np.flatnonzero(row == 0)
        assert len(masked) >= 10


def test_speechflow_mask_p_cond_extremes():
    m = np.asarray(speechflow_mask(jax.random.PRNGKey(1), 32, 100, p_cond=0.0))
    assert (m == 0).all()  # always unconditional


def test_random_mask_modes():
    m = np.asarray(random_mask(jax.random.PRNGKey(1), 96, 100))
    assert m.shape == (96, 100)
    assert ((m == 0) | (m == 1)).all()
    frac = m.mean(axis=1)
    # mode 1: full mask (all zeros) must appear
    assert (frac == 0.0).any()
    # mode 2 (causal): kept prefix then masked suffix
    causal = 0
    for row in m:
        on = np.flatnonzero(row)
        if len(on) and row[0] == 1 and row[-1] == 0 and (np.diff(on) == 1).all():
            causal += 1
    assert causal > 0
    # mode 0: rows with interior masked segments (kept at both ends)
    segmented = 0
    for row in m:
        if row[0] == 1 and row[-1] == 1 and (row == 0).any():
            segmented += 1
    assert segmented > 0
