"""Checkpoint / resume: orbax + batch-plan state.

Covers the reference's three checkpoint idioms (SURVEY.md §5):
- step-interval saves with keep-all or top-k retention (A2SB every 1000
  steps save-all; ETTA top-10 by step + hourly last-link),
- auto-resume from the latest step directory (UALM
  deepspeed_trainer.py:112-143) with ``client_state``-style metadata
  (global_step),
- dataloader batch-plan state saved alongside so resume replays the exact
  batch order (UALM dataloader/iterator.py:288-332),
- EMA-weight export for inference (ETTA unwrap_model.py).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper with UALM-style step dirs + metadata."""

    def __init__(self, directory: str, keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.keep = keep
        self._ckpt = ocp.StandardCheckpointer()

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step}")

    def save(self, step: int, state: Any, extra: dict | None = None) -> str:
        path = self._step_dir(step)
        state_path = os.path.join(path, "state")
        self._ckpt.save(state_path, state, force=True)
        # orbax finalizes (tmp → final rename) on a background thread;
        # block until the committed directory exists so meta.json never
        # points at an unfinished checkpoint.
        import time as _time

        for _ in range(600):
            if os.path.exists(state_path):
                break
            _time.sleep(0.05)
        meta = {"global_step": int(step)}
        if extra:
            meta.update(extra)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
        self._gc()
        return path

    def latest_step(self) -> Optional[int]:
        steps = []
        for name in os.listdir(self.directory):
            m = re.fullmatch(r"step_(\d+)", name)
            if m and os.path.exists(os.path.join(self.directory, name, "meta.json")):
                steps.append(int(m.group(1)))
        return max(steps) if steps else None

    def restore(self, state_template: Any, step: Optional[int] = None):
        """Restore (state, meta) from ``step`` or the latest checkpoint.
        Returns (None, None) when nothing exists (fresh start)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None, None
        path = self._step_dir(step)
        state = self._ckpt.restore(
            os.path.join(path, "state"), target=state_template
        )
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        return state, meta

    def _gc(self):
        if self.keep is None:
            return
        steps = sorted(
            int(m.group(1))
            for name in os.listdir(self.directory)
            if (m := re.fullmatch(r"step_(\d+)", name))
        )
        for s in steps[: -self.keep]:
            import shutil

            shutil.rmtree(self._step_dir(s), ignore_errors=True)

    def wait_until_finished(self):
        pass  # StandardCheckpointer is synchronous


def save_batch_plan(path: str, batches: list, consumed: int) -> None:
    """Serialize the precomputed batch plan + cursor
    (loader_state JSON analogue, iterator.py:288-332)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump({"consumed": consumed, "batches": batches}, f)


def load_batch_plan(path: str):
    """Returns (batches, consumed) or (None, 0) when absent."""
    if not os.path.exists(path):
        return None, 0
    with open(path) as f:
        state = json.load(f)
    batches = [
        [tuple(k) if isinstance(k, list) else k for k in batch]
        for batch in state["batches"]
    ]
    return batches, int(state["consumed"])


def export_ema_weights(state, out_path: str) -> None:
    """ETTA unwrap_model.py analogue: write EMA params as an inference
    checkpoint (msgpack via flax serialization)."""
    from flax import serialization

    params = getattr(state, "ema_params", None) or state
    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_exported_weights(template, path: str):
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def copy_matching_params(target, source, verbose: bool = True):
    """Partial checkpoint loading (reference ETTA training/utils.py
    copy_state_dict:70-100): copy every leaf whose path exists in both
    trees with a matching shape; keep the target's value otherwise.
    Returns (merged, copied_paths, skipped_paths)."""
    import jax

    flat_s = {tuple(str(k) for k in p): v
              for p, v in jax.tree_util.tree_flatten_with_path(source)[0]}
    copied, skipped = [], []

    def merge(path, leaf):
        key = tuple(str(k) for k in path)
        if key in flat_s and getattr(flat_s[key], "shape", None) == getattr(
            leaf, "shape", None
        ):
            copied.append("/".join(key))
            return flat_s[key]
        skipped.append("/".join(key))
        return leaf

    merged = jax.tree_util.tree_map_with_path(merge, target)
    if verbose and skipped:
        print(f"copy_matching_params: kept {len(skipped)} target leaves "
              f"(missing/shape-mismatched in source), copied {len(copied)}")
    return merged, copied, skipped
