"""Launcher utilities: SLURM env parsing + requeue handler."""

import os
import signal

from audio_intelligence_tpu.parallel.launch import (
    slurm_env,
    initialize_distributed,
    install_requeue_handler,
)


def test_slurm_env_parsing(monkeypatch):
    monkeypatch.setenv("SLURM_PROCID", "3")
    monkeypatch.setenv("SLURM_NTASKS", "8")
    monkeypatch.setenv("SLURM_STEP_NODELIST", "node[017-024]")
    s = slurm_env()
    assert s == {"rank": 3, "world": 8, "coordinator": "node017:8476"}

    monkeypatch.setenv("SLURM_STEP_NODELIST", "hostA,hostB")
    assert slurm_env()["coordinator"] == "hostA:8476"


def test_initialize_single_process(monkeypatch):
    for var in ("SLURM_PROCID", "AIT_COORDINATOR"):
        monkeypatch.delenv(var, raising=False)
    out = initialize_distributed()
    assert out == {"distributed": False, "process_id": 0, "num_processes": 1}


def test_requeue_handler():
    calls = []
    h = install_requeue_handler(on_exit=lambda: calls.append(1))
    assert not h.should_exit
    os.kill(os.getpid(), signal.SIGUSR1)
    assert h.should_exit and calls == [1]
    # restore default to avoid surprising later tests
    signal.signal(signal.SIGUSR1, signal.SIG_DFL)
