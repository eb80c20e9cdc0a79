"""The generic training driver: run → (train N steps → valid → save) cycles.

Re-designs ``DeepSpeedTrainer.run/train/valid``
(UALM/trainer/deepspeed_trainer.py:176-348) framework-free:

- auto-resume from the latest step checkpoint + batch-plan replay,
- metric aggregation across the mesh happens inside the jitted step (the
  loss is already a global mean under GSPMD — the reference needed an
  async all_reduce, :145-174),
- wall-clock per-iteration tracking, NaN-guarded updates in the step fn,
- rank-agnostic: under multi-host JAX every process runs the same loop.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable, Optional

import numpy as np

from audio_intelligence_tpu.train.checkpoint import (
    CheckpointManager,
    save_batch_plan,
)


@dataclass
class TrainLoopConfig:
    max_steps: int = 1_000_000
    save_interval: int = 1000
    log_interval: int = 50
    ckpt_dir: str = "exp/ckpt"
    ckpt_keep: Optional[int] = 10
    loader_state_path: Optional[str] = None


class MetricLogger:
    """Metrics sink: stdout + in-memory history, with optional wandb and
    TensorBoard backends (the reference logs through pytorch-lightning's
    WandbLogger / DeepSpeed's TB writer; here both are opt-in adapters).

    wandb is not in this image — ``use_wandb=True`` degrades to a warning
    unless the package is importable. ``tb_dir`` writes TensorBoard scalar
    event files via the same minimal writer train/demo.py uses.
    """

    def __init__(self, use_wandb: bool = False, wandb_kwargs: dict | None = None,
                 tb_dir: str | None = None):
        self.history: list[dict] = []
        self._wandb = None
        self._tb = None
        if use_wandb:
            try:
                import wandb  # gated: not in this image

                self._wandb = wandb.init(**(wandb_kwargs or {}))
            except ImportError:
                print("MetricLogger: wandb not installed; stdout only")
        if tb_dir is not None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(tb_dir)
            except ImportError:
                print("MetricLogger: tensorboard not installed; stdout only")

    def log(self, step: int, metrics: dict):
        record = {"step": step}
        record.update(
            {k: float(v) for k, v in metrics.items() if np.ndim(v) == 0}
        )
        self.history.append(record)
        parts = " ".join(f"{k}={v:.4g}" for k, v in record.items() if k != "step")
        print(f"[step {step}] {parts}", flush=True)
        if self._wandb is not None:
            self._wandb.log(record, step=step)
        if self._tb is not None:
            for k, v in record.items():
                if k != "step":
                    self._tb.add_scalar(k, v, step)

    def close(self):
        if self._wandb is not None:
            self._wandb.finish()
        if self._tb is not None:
            self._tb.flush()
            self._tb.close()


def run_training(
    state,
    train_step: Callable,
    batch_iter: Iterable,
    config: TrainLoopConfig,
    valid_fn: Optional[Callable] = None,
    logger: Optional[MetricLogger] = None,
    batch_plan: Optional[list] = None,
):
    """Drive training until max_steps; returns the final state."""
    logger = logger or MetricLogger()
    mgr = CheckpointManager(config.ckpt_dir, keep=config.ckpt_keep)

    restored, meta = mgr.restore(state)
    start_step = 0
    if restored is not None:
        state = restored
        start_step = meta["global_step"]
        print(f"resumed from step {start_step}")

    t_last = time.perf_counter()
    step = start_step
    for batch in batch_iter:
        if step >= config.max_steps:
            break
        state, metrics = train_step(state, batch)
        step += 1

        if step % config.log_interval == 0:
            now = time.perf_counter()
            metrics = dict(metrics)
            metrics["time_per_iter"] = (now - t_last) / config.log_interval
            t_last = now
            logger.log(step, metrics)

        if step % config.save_interval == 0:
            if valid_fn is not None:
                val_metrics = valid_fn(state)
                logger.log(step, {f"val/{k}": v for k, v in val_metrics.items()})
            mgr.save(step, state)
            if config.loader_state_path and batch_plan is not None:
                save_batch_plan(config.loader_state_path, batch_plan, step)

    return state, step
