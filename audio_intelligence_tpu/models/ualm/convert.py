"""HF Qwen2 → ParallelLM weight conversion.

Implements the reference's pretrained-LM adaptation semantics
(UALM/models/ualm/lm/parallel.py:51-174): rebuild the embedding table and
lm_head to the UNIFIED multimodal vocabulary, preserving the pretrained
text rows at their interval and zeroing row/column 0 (the pad token);
every non-text row keeps its fresh initialization (audio-token rows are
trained from scratch). Backbone weights copy 1:1 (torch [out, in] linear
→ flax [in, out] kernel). Tied-embedding checkpoints (Qwen2.5 ≤1.5B)
reuse the embedding matrix as lm_head.

Usage: start from ``ParallelLM.init`` params (provides the fresh init for
non-text rows, stream_emb, adaptors) and overwrite from the state dict:

    params = convert_qwen2_to_parallel_lm(sd, init_params, text_start)
"""

from __future__ import annotations

import numpy as np

from audio_intelligence_tpu.models.ualm.backbone import BackboneConfig


def infer_qwen2_config(sd: dict, num_heads: int) -> BackboneConfig:
    """BackboneConfig from shapes + an explicit head count (head_dim =
    q_out/num_heads; kv heads follow from the k projection width)."""
    hidden = sd["model.embed_tokens.weight"].shape[1]
    num_layers = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("model.layers.")
    )
    q_out = sd["model.layers.0.self_attn.q_proj.weight"].shape[0]
    kv_out = sd["model.layers.0.self_attn.k_proj.weight"].shape[0]
    head_dim = q_out // num_heads
    return BackboneConfig(
        hidden_size=hidden,
        num_layers=num_layers,
        num_heads=num_heads,
        num_kv_heads=kv_out // head_dim,
        intermediate_size=sd["model.layers.0.mlp.gate_proj.weight"].shape[0],
        qkv_bias="model.layers.0.self_attn.q_proj.bias" in sd,
    )


def convert_qwen2_to_parallel_lm(
    sd: dict,
    init_params: dict,
    text_start: int = 0,
) -> dict:
    """Overwrite a freshly-initialized ParallelLM param tree with HF Qwen2
    weights (parallel.py:82-128 semantics). ``sd`` values are numpy.

    - text rows [text_start, text_start + orig_vocab) of embed/lm_head get
      the pretrained weights; row/col 0 of the unified tables is zeroed.
    - backbone layers/norm copy 1:1; q/k/v biases when present.
    - stream_emb / adaptors keep their fresh init (trained from scratch).
    """
    import jax

    params = jax.tree.map(np.asarray, init_params)
    old_embed = np.asarray(sd["model.embed_tokens.weight"])
    old_head = np.asarray(sd.get("lm_head.weight", old_embed))  # tied fallback
    orig_vocab, hidden = old_embed.shape
    text_end = text_start + orig_vocab

    emb = params["embed_tokens"]["embedding"].copy()
    assert text_end <= emb.shape[0], (
        f"unified vocab {emb.shape[0]} too small for text interval "
        f"[{text_start}, {text_end})"
    )
    emb[text_start:text_end] = old_embed
    emb[0] = 0.0
    params["embed_tokens"]["embedding"] = emb

    head = params["lm_head_kernel"].copy()  # [H, V]
    head[:, text_start:text_end] = old_head.T
    head[:, 0] = 0.0
    params["lm_head_kernel"] = head

    bb = params["backbone"]

    def lin(dst: dict, prefix: str, bias: bool):
        dst["kernel"] = np.ascontiguousarray(np.asarray(sd[prefix + ".weight"]).T)
        if bias:
            dst["bias"] = np.asarray(sd[prefix + ".bias"])

    n_layers = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("model.layers.")
    )
    for i in range(n_layers):
        src = f"model.layers.{i}"
        layer = bb[f"layers_{i}"]
        qkv_bias = f"{src}.self_attn.q_proj.bias" in sd
        lin(layer["self_attn"]["q_proj"], f"{src}.self_attn.q_proj", qkv_bias)
        lin(layer["self_attn"]["k_proj"], f"{src}.self_attn.k_proj", qkv_bias)
        lin(layer["self_attn"]["v_proj"], f"{src}.self_attn.v_proj", qkv_bias)
        lin(layer["self_attn"]["o_proj"], f"{src}.self_attn.o_proj", False)
        lin(layer["mlp"]["gate_proj"], f"{src}.mlp.gate_proj", False)
        lin(layer["mlp"]["up_proj"], f"{src}.mlp.up_proj", False)
        lin(layer["mlp"]["down_proj"], f"{src}.mlp.down_proj", False)
        layer["input_layernorm"]["weight"] = np.asarray(
            sd[f"{src}.input_layernorm.weight"]
        )
        layer["post_attention_layernorm"]["weight"] = np.asarray(
            sd[f"{src}.post_attention_layernorm.weight"]
        )
    bb["norm"]["weight"] = np.asarray(sd["model.norm.weight"])
    return params


# ---------------------------------------------------------------------------
# AF-Whisper continuous-audio tower
# ---------------------------------------------------------------------------


def infer_whisper_config(sd: dict, num_heads: int | None = None):
    """WhisperTowerConfig from state-dict shapes (head count defaults to
    d_model/64, the Whisper convention across all released sizes)."""
    from audio_intelligence_tpu.models.ualm.whisper_tower import WhisperTowerConfig

    d_model, n_mels, _ = sd["conv1.weight"].shape
    num_layers = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("layers.")
    )
    return WhisperTowerConfig(
        d_model=d_model,
        num_layers=num_layers,
        num_heads=num_heads or d_model // 64,
        ffn_dim=sd["layers.0.fc1.weight"].shape[0],
        n_mels=n_mels,
        max_positions=sd["embed_positions.weight"].shape[0],
    )


def convert_whisper_tower(sd: dict) -> dict:
    """Reference AFWhisperEncoder state dict → flax WhisperTower params
    (modeling_whisper.py AFWhisperEncoder:589-766; keys may be prefixed
    ``audio_tower.`` / ``sound_tower.encoder.`` — strip before calling).

    torch Conv1d [out, in, k] → flax [k, in, out]; Linear [out, in] →
    kernel [in, out]; the learned embed_positions table copies verbatim.
    """
    for prefix in ("audio_tower.", "sound_tower.encoder.", "encoder."):
        if any(k.startswith(prefix) for k in sd):
            sd = {
                k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)
            }
            break

    def conv1d(src):
        return {
            "kernel": np.ascontiguousarray(
                np.asarray(sd[src + ".weight"]).transpose(2, 1, 0)
            ),
            "bias": np.asarray(sd[src + ".bias"]),
        }

    def lin(src, bias=True):
        out = {"kernel": np.ascontiguousarray(np.asarray(sd[src + ".weight"]).T)}
        if bias:
            out["bias"] = np.asarray(sd[src + ".bias"])
        return out

    def ln(src):
        return {
            "scale": np.asarray(sd[src + ".weight"]),
            "bias": np.asarray(sd[src + ".bias"]),
        }

    params = {
        "conv1": conv1d("conv1"),
        "conv2": conv1d("conv2"),
        "embed_positions": np.asarray(sd["embed_positions.weight"]),
        "layer_norm": ln("layer_norm"),
    }
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("layers."))
    for i in range(n_layers):
        src = f"layers.{i}"
        params[f"layers_{i}"] = {
            "self_attn_layer_norm": ln(f"{src}.self_attn_layer_norm"),
            "q_proj": lin(f"{src}.self_attn.q_proj"),
            "k_proj": lin(f"{src}.self_attn.k_proj", bias=False),
            "v_proj": lin(f"{src}.self_attn.v_proj"),
            "out_proj": lin(f"{src}.self_attn.out_proj"),
            "final_layer_norm": ln(f"{src}.final_layer_norm"),
            "fc1": lin(f"{src}.fc1"),
            "fc2": lin(f"{src}.fc2"),
        }
    return params
