"""Multi-host launch: jax.distributed + SLURM/pod integration.

Replaces the reference's three launchers (SLURM env plugin + auto-requeue
for A2SB, torchrun for ETTA, the deepspeed launcher for UALM — SURVEY.md
§2.4) with one entry:

- ``initialize_distributed()`` — on TPU pods jax.distributed discovers the
  topology automatically; under SLURM the coordinator is derived from the
  node list; explicit env vars override everything.
- ``install_requeue_handler()`` — SIGUSR1/SIGTERM → save a checkpoint and
  exit 0 so the scheduler requeues and training resumes from the step dir
  (the reference relies on Lightning's SLURM auto-requeue plugin).
"""

from __future__ import annotations

import os
import signal
from typing import Callable, Optional


def slurm_env() -> Optional[dict]:
    """Extract (rank, world, coordinator) from SLURM env vars, if present."""
    if "SLURM_PROCID" not in os.environ:
        return None
    rank = int(os.environ["SLURM_PROCID"])
    world = int(os.environ.get("SLURM_NTASKS", "1"))
    nodelist = os.environ.get("SLURM_STEP_NODELIST", os.environ.get("SLURM_NODELIST", ""))
    # first hostname of the (possibly compressed) nodelist
    head = nodelist.split(",")[0]
    if "[" in head:
        prefix, rest = head.split("[", 1)
        first = rest.split("-")[0].split(",")[0].rstrip("]")
        head = prefix + first
    port = os.environ.get("AIT_COORDINATOR_PORT", "8476")
    return {"rank": rank, "world": world, "coordinator": f"{head}:{port}"}


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize jax.distributed for multi-host meshes.

    Resolution order: explicit args → AIT_COORDINATOR/AIT_NUM_PROCS/
    AIT_PROC_ID env → SLURM env → single-process no-op. Returns a dict with
    the resolved settings. Safe to call when already initialized.
    """
    import jax

    if coordinator_address is None:
        coordinator_address = os.environ.get("AIT_COORDINATOR")
        if coordinator_address is None:
            s = slurm_env()
            if s is not None and s["world"] > 1:
                coordinator_address = s["coordinator"]
                num_processes = num_processes or s["world"]
                process_id = process_id if process_id is not None else s["rank"]
        else:
            num_processes = num_processes or int(os.environ["AIT_NUM_PROCS"])
            process_id = (
                process_id
                if process_id is not None
                else int(os.environ["AIT_PROC_ID"])
            )

    if coordinator_address is None:
        return {"distributed": False, "process_id": 0, "num_processes": 1}

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise
    return {
        "distributed": True,
        "process_id": process_id,
        "num_processes": num_processes,
        "coordinator": coordinator_address,
    }


class RequeueHandler:
    """SLURM auto-requeue semantics: on SIGUSR1/SIGTERM set a flag; the
    training loop checks ``should_exit`` each step, checkpoints, and exits
    cleanly so the job requeues and auto-resumes."""

    def __init__(self, on_exit: Optional[Callable] = None):
        self.should_exit = False
        self._on_exit = on_exit

    def _handler(self, signum, frame):
        self.should_exit = True
        if self._on_exit is not None:
            self._on_exit()

    def install(self, signals=(signal.SIGUSR1, signal.SIGTERM)):
        for s in signals:
            signal.signal(s, self._handler)
        return self


def install_requeue_handler(on_exit: Optional[Callable] = None) -> RequeueHandler:
    return RequeueHandler(on_exit).install()
