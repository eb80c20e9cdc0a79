"""Config idioms and the generic training loop."""

import numpy as np
import jax.numpy as jnp

from audio_intelligence_tpu.utils.config import (
    AttrDict,
    update_params,
    instantiate_from_spec,
    parse_data_specifier,
)
from audio_intelligence_tpu.train.loop import TrainLoopConfig, run_training, MetricLogger


def test_attrdict_and_update_params():
    cfg = AttrDict({"model": {"depth": 24, "heads": 24}, "lr": 1e-4})
    assert cfg.model.depth == 24
    update_params(cfg, ["model.depth=12", "model.new.flag=true", "lr=0.001", "name=abc"])
    assert cfg.model.depth == 12
    assert cfg.model.new.flag is True
    assert cfg.lr == 0.001 and cfg.name == "abc"


def test_instantiate_from_spec():
    spec = {
        "class_path": "audio_intelligence_tpu.models.a2sb.bridge.BridgeSchedule",
        "init_args": {"beta_max": 0.5},
    }
    obj = instantiate_from_spec(spec)
    assert obj.beta_max == 0.5
    objs = instantiate_from_spec([spec, {"class_path": "collections.OrderedDict"}])
    assert objs[0].beta_max == 0.5


def test_parse_data_specifier():
    assert parse_data_specifier("caption_to_audio:audioset") == {
        "task": "caption_to_audio", "name": "audioset", "json": None, "factor": 1.0,
    }
    out = parse_data_specifier("text_only:c4:/data/c4.json:0.5")
    assert out["json"] == "/data/c4.json" and out["factor"] == 0.5
    out2 = parse_data_specifier("t:n:2.0")
    assert out2["factor"] == 2.0 and out2["json"] is None


def test_run_training_resume(tmp_path):
    """Loop runs, checkpoints, and resumes from the saved step."""
    state = {"w": np.zeros((), np.float32), "step": np.zeros((), np.int32)}

    def train_step(state, batch):
        new = {
            "w": state["w"] + batch,
            "step": state["step"] + 1,
        }
        return new, {"loss": float(batch)}

    cfg = TrainLoopConfig(
        max_steps=5, save_interval=2, log_interval=10, ckpt_dir=str(tmp_path / "ck")
    )
    batches = [np.float32(1.0)] * 10
    final, step = run_training(state, train_step, iter(batches), cfg)
    assert step == 5 and float(final["w"]) == 5.0

    # resume: loop restarts from step 4 (last save) and runs 1 more step
    final2, step2 = run_training(state, train_step, iter(batches), cfg)
    assert step2 == 5


def test_a2sb_train_smoke_runs_sampling_validation(tmp_path, capsys):
    """The train CLI wires a 25-step sampling validation
    (validation_step semantics, A2SB_lightning_module.py:433-476): at
    each checkpoint interval the val batch is restored with the bridge
    sampler and LSD / SI-SDR are logged."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "cli"))
    from cli.a2sb_train import main as train_main

    train_main(["--smoke", "--max_steps", "5",
                "--ckpt_dir", str(tmp_path / "ckpt")])
    out = capsys.readouterr().out
    assert "val/lsd=" in out, out
    assert "val/si_sdr=" in out, out
