"""ETTA inpaint training masks."""

import numpy as np
import jax

from audio_intelligence_tpu.models.etta.inpaint_masks import speechflow_mask, random_mask


def test_speechflow_mask_contiguous_and_fraction():
    m = np.asarray(speechflow_mask(jax.random.PRNGKey(0), 16, 200))
    assert m.shape == (16, 200)
    for row in m:
        on = np.flatnonzero(row)
        assert len(on) >= 10
        assert (np.diff(on) == 1).all()  # one contiguous span
        assert 0.05 <= row.mean() <= 0.95


def test_random_mask_modes():
    m = np.asarray(random_mask(jax.random.PRNGKey(1), 64, 100))
    assert m.shape == (64, 100)
    assert ((m == 0) | (m == 1)).all()
    # with 64 samples all three modes should appear: some rows fully 1
    assert (m.mean(axis=1) == 1.0).any()
    # prefix rows: once masked, stays masked to the end
    for row in m:
        on = np.flatnonzero(row)
        if len(on) and row[-1] == 1 and row.mean() < 1.0:
            break
