"""Model utilities (reference stable_audio_tools/models/utils.py:11-103).

- checkpoint state-dict loading (torch .ckpt / .safetensors, gated on the
  packages being importable — used by tools/convert_checkpoint.py when
  importing reference weights),
- weight-norm canonicalization for our v/g parameterization,
- size helpers. The audiocraft-style top-k/top-p samplers live in
  ``models/ualm/decode.py`` (topk_temperature_sample / top_p_sample) as
  jit-compatible lax code; re-exported here for parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.ualm.decode import (  # noqa: F401 re-export
    top_p_sample,
    topk_temperature_sample,
)


def load_ckpt_state_dict(ckpt_path: str) -> dict:
    """Load a reference checkpoint's state dict (utils.py:11-17):
    .safetensors via safetensors (gated), anything else via torch
    (``["state_dict"]`` unwrap like the reference)."""
    if ckpt_path.endswith(".safetensors"):
        from safetensors.torch import load_file  # gated: may be absent

        return load_file(ckpt_path)
    import torch

    obj = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    return obj["state_dict"] if isinstance(obj, dict) and "state_dict" in obj else obj


def remove_weight_norm_from_params(params):
    """Canonicalize every weight-norm (v, g) pair (utils.py
    remove_weight_norm_from_model:19-34): rescale v to the effective
    kernel v·g/‖v‖ and set g = ‖new v‖ (= g), so exported weights equal
    the folded kernel regardless of the original v scale. The forward is
    bit-identical; downstream consumers can read ``v`` as the kernel."""

    def fold(tree):
        if isinstance(tree, dict):
            if "v" in tree and "g" in tree:
                v, g = tree["v"], tree["g"]
                norm = jnp.linalg.norm(
                    v.reshape(-1, v.shape[-1]), axis=0
                )
                new_v = v * (g / jnp.maximum(norm, 1e-12))
                out = dict(tree)
                out["v"] = new_v
                out["g"] = g.astype(v.dtype)
                return out
            return {k: fold(sub) for k, sub in tree.items()}
        return tree

    return jax.tree_util.tree_map(
        lambda x: x, fold(params if not hasattr(params, "unfreeze") else params)
    )


def next_power_of_two(n: int) -> int:
    return 2 ** (int(n) - 1).bit_length()


def next_multiple_of_64(n: int) -> int:
    return ((int(n) + 63) // 64) * 64
