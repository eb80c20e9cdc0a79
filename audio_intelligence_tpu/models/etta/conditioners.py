"""Conditioning: metadata dict → {id: (tensor, mask)} and routing.

Mirrors ETTA/stable_audio_tools/models/conditioners.py (T5Conditioner:241,
NumberConditioner:61, MultiConditioner:472) and the wrapper's routing
(models/diffusion.py get_conditioning_inputs:135-212): cross-attention
conds concatenate over the sequence dim, global conds over channels.

Split host/device:
- Text encoding (T5) is frozen preprocessing — it runs host-side through
  HF transformers when the weights are available locally, else a
  deterministic hash-n-gram embedding fallback (zero-egress images can't
  download t5-base; the fallback keeps every pipeline runnable/testable
  and is clearly flagged). Either way the result enters the jitted graph
  as a plain [B, T, 768] array + mask.
- NumberConditioner is a flax module (learned Fourier embedding, trains
  with the DiT).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


class NumberEmbedder(nn.Module):
    """Continuous-value embedding (adp.py NumberEmbedder:1483 +
    LearnedPositionalEmbedding:670): x → [x ‖ sin(2π·x·w) ‖ cos(2π·x·w)] →
    Linear(dim+1 → features)."""

    features: int
    dim: int = 256

    @nn.compact
    def __call__(self, x):  # x [B]
        w = self.param(
            "freqs", nn.initializers.normal(1.0), (self.dim // 2,)
        )
        f = x[:, None] * w[None, :] * 2 * jnp.pi
        fouriered = jnp.concatenate([jnp.sin(f), jnp.cos(f)], axis=-1)
        fouriered = jnp.concatenate([x[:, None], fouriered], axis=-1)
        return nn.Dense(self.features, name="to_out")(fouriered)


class NumberConditioner(nn.Module):
    """Clamp + min-max normalize + NumberEmbedder (conditioners.py:61-95)."""

    output_dim: int
    min_val: float = 0.0
    max_val: float = 1.0

    @nn.compact
    def __call__(self, floats):  # [B]
        x = jnp.clip(floats, self.min_val, self.max_val)
        x = (x - self.min_val) / (self.max_val - self.min_val)
        emb = NumberEmbedder(self.output_dim, name="embedder")(x)
        return emb[:, None, :], jnp.ones((emb.shape[0], 1), bool)


def hash_text_embedding(
    texts: Sequence[str], dim: int = 768, max_length: int = 128
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic fallback text encoder (NOT T5): per-token embeddings
    seeded from a stable hash of (token, position-free) so identical
    prompts map to identical embeddings. Used when no local T5 weights
    exist; swap in ``t5_embed_host`` for parity runs."""
    b = len(texts)
    out = np.zeros((b, max_length, dim), np.float32)
    mask = np.zeros((b, max_length), bool)
    for i, text in enumerate(texts):
        tokens = text.lower().split()[: max_length - 1] + ["</s>"]
        for j, tok in enumerate(tokens):
            seed = int.from_bytes(
                hashlib.sha256(tok.encode()).digest()[:8], "little"
            ) % (2**32)
            rng = np.random.default_rng(seed)
            out[i, j] = rng.standard_normal(dim).astype(np.float32) / np.sqrt(dim)
            mask[i, j] = True
    return out, mask


def t5_embed_host(
    texts: Sequence[str],
    t5_model_name: str = "t5-base",
    max_length: int = 128,
) -> tuple[np.ndarray, np.ndarray]:
    """Frozen T5 encoding on host CPU via HF transformers
    (conditioners.py:241-326 semantics: masked encoder outputs, fp32 here).

    Requires the model to be available locally (HF_HOME cache or local
    path); raises otherwise — callers fall back to hash_text_embedding.
    """
    import torch
    from transformers import AutoTokenizer, T5EncoderModel

    tokenizer = AutoTokenizer.from_pretrained(t5_model_name)
    model = T5EncoderModel.from_pretrained(t5_model_name).eval()
    enc = tokenizer(
        list(texts),
        truncation=True,
        max_length=max_length,
        padding="max_length",
        return_tensors="pt",
    )
    with torch.no_grad():
        out = model(
            input_ids=enc["input_ids"], attention_mask=enc["attention_mask"]
        ).last_hidden_state
    mask = enc["attention_mask"].bool()
    out = out * mask.unsqueeze(-1)
    return out.numpy(), mask.numpy()


class TokenizerLUTConditioner(nn.Module):
    """Learned token-embedding conditioner
    (conditioners.py TokenizerLUTConditioner:384-440): token ids → LUT
    embeddings + mask. Tokenization happens host-side (HF tokenizer when
    available, ByteTextIO otherwise); the module consumes id arrays."""

    vocab_size: int
    output_dim: int
    max_length: int = 128

    @nn.compact
    def __call__(self, token_ids, mask):
        emb = nn.Embed(self.vocab_size, self.output_dim, name="lut")(token_ids)
        emb = emb * mask[..., None].astype(emb.dtype)
        return emb, mask


def tokenize_for_lut(texts, max_length: int = 128):
    """Host-side byte-level tokenization for TokenizerLUTConditioner
    (ids in [1, 256]; 0 = pad)."""
    ids = np.zeros((len(texts), max_length), np.int32)
    mask = np.zeros((len(texts), max_length), bool)
    for i, t in enumerate(texts):
        b = np.frombuffer(str(t).encode("utf-8"), np.uint8)[: max_length]
        ids[i, : len(b)] = b.astype(np.int32) + 1
        mask[i, : len(b)] = True
    return ids, mask


# ARPAbet phoneme inventory (CMUdict): 39 phones, vowels carry stress 0/1/2.
# Fixed here so PhonemeConditioner's embedding table has a stable shape
# whether or not g2p_en is installed (it is not in this image).
_ARPABET_VOWELS = ("AA", "AE", "AH", "AO", "AW", "AY", "EH", "ER", "EY",
                   "IH", "IY", "OW", "OY", "UH", "UW")
_ARPABET_CONSONANTS = ("B", "CH", "D", "DH", "F", "G", "HH", "JH", "K", "L",
                       "M", "N", "NG", "P", "R", "S", "SH", "T", "TH", "V",
                       "W", "Y", "Z", "ZH")
ARPABET_PHONEMES = tuple(
    v + s for v in _ARPABET_VOWELS for s in ("0", "1", "2")
) + _ARPABET_CONSONANTS + ("_",)  # "_" = ignored/space slot
_PHONEME_TO_ID = {p: i + 2 for i, p in enumerate(ARPABET_PHONEMES)}  # 0 pad, 1 unk


def _naive_g2p(text: str) -> list[str]:
    """Rule-based English grapheme→phoneme fallback (g2p_en is not in the
    image). Digraph-first greedy mapping — NOT linguistically faithful, but
    deterministic, covers the full ARPAbet inventory, and keeps the
    conditioner trainable/testable offline. Swap in g2p_en for parity."""
    digraphs = {
        "ch": "CH", "sh": "SH", "th": "TH", "ph": "F", "wh": "W",
        "ng": "NG", "ck": "K", "qu": "K", "ee": "IY1", "oo": "UW1",
        "ou": "AW1", "ai": "EY1", "ay": "EY1", "oa": "OW1", "oy": "OY1",
        "er": "ER0", "ar": "AA1", "or": "AO1",
    }
    singles = {
        "a": "AE1", "b": "B", "c": "K", "d": "D", "e": "EH1", "f": "F",
        "g": "G", "h": "HH", "i": "IH1", "j": "JH", "k": "K", "l": "L",
        "m": "M", "n": "N", "o": "AA1", "p": "P", "q": "K", "r": "R",
        "s": "S", "t": "T", "u": "AH1", "v": "V", "w": "W", "x": "K",
        "y": "Y", "z": "Z",
    }
    out = []
    t = text.lower()
    i = 0
    while i < len(t):
        pair = t[i : i + 2]
        if pair in digraphs:
            out.append(digraphs[pair])
            i += 2
        elif t[i] in singles:
            out.append(singles[t[i]])
            i += 1
        else:
            if not out or out[-1] != "_":
                out.append("_")
            i += 1
    return out


def phonemize_host(
    texts: Sequence[str], max_length: int = 1024
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side text → phoneme-id arrays for PhonemeConditioner
    (conditioners.py PhonemeConditioner:328-382 semantics: punctuation and
    spaces collapse to "_", unknown phones → 1, pad → 0). Uses g2p_en when
    importable, else the naive rule fallback."""
    import string as _string

    try:
        from g2p_en import G2p  # not in this image; gated

        g2p = G2p()
        ignore = set(" " + _string.punctuation)
        seqs = [
            ["_" if p in ignore else p for p in g2p(t)] for t in texts
        ]
    except Exception:
        seqs = [_naive_g2p(t) for t in texts]
    ids = np.zeros((len(texts), max_length), np.int32)
    mask = np.zeros((len(texts), max_length), bool)
    for i, seq in enumerate(seqs):
        seq = seq[:max_length]
        ids[i, : len(seq)] = [_PHONEME_TO_ID.get(p, 1) for p in seq]
        mask[i, : len(seq)] = True
    return ids, mask


class PhonemeConditioner(nn.Module):
    """Learned phoneme-embedding conditioner (conditioners.py:328-382):
    phoneme ids (from ``phonemize_host``) → LUT embedding (+2 slots for
    pad/unk) → optional projection."""

    output_dim: int
    project_out: bool = False

    @nn.compact
    def __call__(self, phoneme_ids, mask):
        emb = nn.Embed(
            len(ARPABET_PHONEMES) + 2, self.output_dim, name="phoneme_embedder"
        )(phoneme_ids)
        if self.project_out:
            emb = nn.Dense(self.output_dim, name="proj_out")(emb)
        return emb, mask


_CLAP_EMBEDDERS: dict = {}


def _clap_embedder_cached(path: str):
    """Load-once cache of flax ClapEmbedder instances per checkpoint dir
    (the towers are frozen conditioners; reloading per call would reconvert
    the weights)."""
    if path not in _CLAP_EMBEDDERS:
        try:
            from audio_intelligence_tpu.models.etta.clap import ClapEmbedder

            _CLAP_EMBEDDERS[path] = ClapEmbedder.from_hf_dir(path)
        except Exception:
            _CLAP_EMBEDDERS[path] = None
    return _CLAP_EMBEDDERS[path]


def clap_text_embed_host(
    texts: Sequence[str],
    clap_ckpt_path: str | None = None,
    dim: int = 512,
) -> np.ndarray:
    """CLAP text embedding, host-side (conditioners.py CLAPTextConditioner
    :96-177: frozen laion_clap tower → one global [B, 512] vector).

    laion_clap + its checkpoint are not in this image, so without them this
    degrades to a deterministic hash embedding pooled to one vector —
    keeping prompt-conditional pipelines runnable offline (same contract:
    unit-scale [B, dim]).

    With a checkpoint, the preferred path is the in-repo flax CLAP
    (models/etta/clap.py, parity-gated vs transformers.ClapModel):
    ``clap_ckpt_path`` pointing at an HF ClapModel directory runs the
    converted flax towers; a laion_clap .pt checkpoint is tried next
    (gated import)."""
    if clap_ckpt_path is not None:
        from pathlib import Path

        if Path(clap_ckpt_path).is_dir():
            from audio_intelligence_tpu.models.etta.clap import ClapEmbedder

            emb = _clap_embedder_cached(clap_ckpt_path)
            if emb is not None and emb.tokenizer is not None:
                return emb.embed_text(list(texts))
        try:
            import laion_clap  # gated: not in image

            model = laion_clap.CLAP_Module(enable_fusion=False)
            model.load_ckpt(clap_ckpt_path)
            return model.get_text_embedding(list(texts), use_tensor=False)
        except ImportError:
            pass
    emb, mask = hash_text_embedding(texts, dim=dim)
    pooled = emb.sum(axis=1) / np.maximum(mask.sum(axis=1, keepdims=True), 1)
    return (pooled / np.maximum(np.linalg.norm(pooled, axis=-1, keepdims=True), 1e-8)).astype(np.float32)


def clap_audio_embed_host(
    audio: np.ndarray,
    sample_rate: int,
    clap_ckpt_path: str | None = None,
    dim: int = 512,
) -> np.ndarray:
    """CLAP audio embedding (conditioners.py CLAPAudioConditioner:179-239).
    audio: [B, T] mono float32. Without laion_clap, falls back to a
    deterministic log-mel statistics embedding (mean‖std of 64 mel bands,
    projected to ``dim`` by a fixed seeded projection) — offline stand-in
    with the same [B, dim] unit-norm contract.

    With an HF ClapModel checkpoint directory, runs the in-repo flax
    towers (models/etta/clap.py) through the HF feature extractor."""
    if clap_ckpt_path is not None:
        from pathlib import Path

        if Path(clap_ckpt_path).is_dir():
            emb = _clap_embedder_cached(clap_ckpt_path)
            if emb is not None and emb.feature_extractor is not None:
                return emb.embed_audio(audio, sample_rate)
        try:
            import laion_clap  # gated: not in image

            model = laion_clap.CLAP_Module(enable_fusion=False)
            model.load_ckpt(clap_ckpt_path)
            return model.get_audio_embedding_from_data(audio, use_tensor=False)
        except ImportError:
            pass
    from audio_intelligence_tpu.ops.mel import mel_filterbank
    from audio_intelligence_tpu.ops.stft import stft

    spec = np.abs(np.asarray(jax.jit(
        lambda x: stft(x, n_fft=1024, hop_length=512)
    )(jnp.asarray(audio, jnp.float32))))
    fb = np.asarray(mel_filterbank(513, n_mels=64, sample_rate=sample_rate))
    mel = np.log(np.einsum("fm,bft->bmt", fb, spec) + 1e-5)
    stats = np.concatenate([mel.mean(-1), mel.std(-1)], axis=-1)  # [B, 128]
    proj = np.random.default_rng(0xC1A9).standard_normal(
        (stats.shape[-1], dim)
    ).astype(np.float32) / np.sqrt(stats.shape[-1])
    out = stats.astype(np.float32) @ proj
    return out / np.maximum(np.linalg.norm(out, axis=-1, keepdims=True), 1e-8)


class MultiConditioner(nn.Module):
    """Applies per-id conditioners to a metadata batch
    (conditioners.py:472-513).

    Text ids are precomputed host-side (arrays passed in metadata);
    number ids run as flax submodules.
    """

    number_ids: Sequence[str] = ("seconds_start", "seconds_total")
    number_dim: int = 768
    number_min: float = 0.0
    number_max: float = 512.0
    text_ids: Sequence[str] = ("prompt",)

    @nn.compact
    def __call__(self, metadata: dict) -> dict:
        out = {}
        for tid in self.text_ids:
            out[tid] = (metadata[f"{tid}_embed"], metadata[f"{tid}_mask"])
        for nid in self.number_ids:
            out[nid] = NumberConditioner(
                self.number_dim, self.number_min, self.number_max, name=nid
            )(metadata[nid])
        return out


def route_conditioning(
    cond: dict,
    cross_attn_ids: Sequence[str] = ("prompt", "seconds_start", "seconds_total"),
    global_ids: Sequence[str] = ("seconds_start", "seconds_total"),
):
    """get_conditioning_inputs (models/diffusion.py:135-212): returns
    (cross_attn_cond [B, ΣT, C], cross_attn_mask [B, ΣT], global_cond [B, ΣC])."""
    xs, masks = [], []
    for key in cross_attn_ids:
        t, m = cond[key]
        if t.ndim == 2:
            t, m = t[:, None, :], m[:, None]
        xs.append(t)
        masks.append(m)
    cross = jnp.concatenate(xs, axis=1) if xs else None
    cross_mask = jnp.concatenate(masks, axis=1) if masks else None

    gs = []
    for key in global_ids:
        g = cond[key][0]
        if g.ndim == 3:
            g = g[:, 0, :]
        gs.append(g)
    global_cond = jnp.concatenate(gs, axis=-1) if gs else None
    return cross, cross_mask, global_cond
