"""Pretrained-model loading (reference pretrained.py:12-29).

Zero-egress image: the HF-hub download path is gated on huggingface_hub
being importable AND a populated local cache (HF_HOME); otherwise pass a
local directory containing ``model_config.json`` + weights. Reference
torch weights convert through tools/convert_checkpoint.py.
"""

from __future__ import annotations

import json
import os
from pathlib import Path


def get_pretrained_model(name_or_dir: str):
    """Resolve (modules dict, model_config) from a local directory or a HF
    repo id. Returns the factory output plus the raw config; converting
    torch weights into flax params is the caller's step
    (tools/convert_checkpoint.py has the per-family converters)."""
    from audio_intelligence_tpu.models.etta.factory import create_model_from_config

    local = Path(name_or_dir)
    if local.is_dir():
        config_path = local / "model_config.json"
        ckpt_path = None
        for fname in ("model.safetensors", "model.ckpt", "model_unwrap.msgpack"):
            if (local / fname).exists():
                ckpt_path = str(local / fname)
                break
    else:
        from huggingface_hub import hf_hub_download  # gated: needs local cache

        config_path = hf_hub_download(
            name_or_dir, filename="model_config.json", repo_type="model",
            local_files_only=bool(os.environ.get("HF_HUB_OFFLINE", "1")),
        )
        try:
            ckpt_path = hf_hub_download(
                name_or_dir, filename="model.safetensors", repo_type="model",
                local_files_only=True,
            )
        except Exception:
            ckpt_path = hf_hub_download(
                name_or_dir, filename="model.ckpt", repo_type="model",
                local_files_only=True,
            )

    with open(config_path) as f:
        model_config = json.load(f)
    modules = create_model_from_config(model_config)
    modules["checkpoint_path"] = ckpt_path
    return modules, model_config
