"""Checkpoint/resume + batch-plan state."""

import numpy as np
import jax.numpy as jnp

from audio_intelligence_tpu.train.checkpoint import (
    CheckpointManager,
    save_batch_plan,
    load_batch_plan,
    export_ema_weights,
    load_exported_weights,
)


def test_checkpoint_save_restore_latest(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    state = {"params": {"w": np.ones((4,), np.float32)}, "step": np.zeros((), np.int32)}
    for step in (100, 200, 300):
        state["step"] = np.full((), step, np.int32)
        mgr.save(step, state, extra={"note": "x"})
    assert mgr.latest_step() == 300
    restored, meta = mgr.restore(state)
    assert meta["global_step"] == 300 and meta["note"] == "x"
    assert int(restored["step"]) == 300
    # retention keeps only the newest 2
    assert mgr.latest_step() == 300
    restored2, _ = mgr.restore(state, step=200)
    assert int(restored2["step"]) == 200
    import os
    assert not os.path.exists(str(tmp_path / "ckpt" / "step_100"))


def test_checkpoint_fresh_start(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "empty"))
    state, meta = mgr.restore({"x": np.zeros(1)})
    assert state is None and meta is None


def test_batch_plan_roundtrip(tmp_path):
    path = str(tmp_path / "loader_state" / "train_0_1.json")
    batches = [[("task", "ds", "0"), ("task", "ds", "1")], [("task", "ds", "2")]]
    save_batch_plan(path, batches, consumed=1)
    loaded, consumed = load_batch_plan(path)
    assert consumed == 1
    assert loaded == batches
    none, c0 = load_batch_plan(str(tmp_path / "missing.json"))
    assert none is None and c0 == 0


def test_ema_export_roundtrip(tmp_path):
    params = {"dense": {"kernel": jnp.ones((2, 3)), "bias": jnp.zeros(3)}}
    path = str(tmp_path / "model_unwrap.msgpack")
    export_ema_weights(params, path)
    back = load_exported_weights(params, path)
    np.testing.assert_allclose(np.asarray(back["dense"]["kernel"]), 1.0)
