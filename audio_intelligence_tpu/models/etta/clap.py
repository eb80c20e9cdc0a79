"""From-scratch flax CLAP: RoBERTa text tower + HTSAT (Swin) audio tower
+ MLP projections, with a converter from ``transformers.ClapModel``.

The reference conditions ETTA on frozen laion_clap towers
(ETTA/stable_audio_tools/models/conditioners.py:96-240 —
``CLAPTextConditioner`` / ``CLAPAudioConditioner``, HTSAT-base audio
branch + RoBERTa text branch, 512-d joint space). laion_clap is not in
this image, but the same architecture family ships in HF transformers as
``ClapModel``; this module is an independent JAX implementation of that
architecture, structure-parity-gated on random tiny configs
(tests/test_clap_parity.py) exactly like the Xcodec / Whisper / Qwen
towers.

TPU notes: window attention runs as one batched dense attention over
``(B·nW, ws², C)`` — windows are static-shape reshapes, the relative
position bias and the shifted-window masks are compile-time constants;
the HTSAT mel→image restructure and torch's ``align_corners`` bicubic
resize are expressed as static weight-matrix contractions (MXU-friendly,
no gathers).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


# ---------------------------------------------------------------- configs


@dataclasses.dataclass(frozen=True)
class ClapTextTowerConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-12
    projection_dim: int = 512
    projection_hidden_act: str = "relu"


@dataclasses.dataclass(frozen=True)
class ClapAudioTowerConfig:
    spec_size: int = 256
    num_mel_bins: int = 64
    patch_size: int = 4
    patch_stride: tuple = (4, 4)
    patch_embeds_hidden_size: int = 96
    depths: tuple = (2, 2, 6, 2)
    num_heads: tuple = (4, 8, 16, 32)
    window_size: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layer_norm_eps: float = 1e-5
    patch_embed_input_channels: int = 1
    enable_fusion: bool = False
    aff_block_r: int = 4
    projection_dim: int = 512
    projection_hidden_act: str = "relu"

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // self.num_mel_bins


# ------------------------------------------------------------- utilities


def _cubic_weight(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """torch's cubic convolution kernel (A = −0.75)."""
    ax = np.abs(x)
    w = np.where(
        ax <= 1,
        (a + 2) * ax**3 - (a + 3) * ax**2 + 1,
        np.where(ax < 2, a * ax**3 - 5 * a * ax**2 + 8 * a * ax - 4 * a, 0.0),
    )
    return w


def bicubic_resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] weights reproducing torch ``interpolate(...,
    mode="bicubic", align_corners=True)`` along one axis (the HTSAT
    mel-length adaptation, modeling_clap.py reshape_mel2img). A
    same-length axis reduces to the identity."""
    if n_in == n_out:
        return np.eye(n_out, dtype=np.float32)
    w = np.zeros((n_out, n_in), dtype=np.float32)
    scale = (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
    for i in range(n_out):
        p = i * scale
        base = int(np.floor(p))
        frac = p - base
        for tap in range(-1, 3):
            idx = min(max(base + tap, 0), n_in - 1)
            w[i, idx] += _cubic_weight(np.array(tap - frac))
    return w


def _window_partition(x: jax.Array, ws: int) -> jax.Array:
    """[B, H, W, C] → [B·nH·nW, ws·ws, C] (modeling_clap window_partition)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_reverse(x: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(
        np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # [ws², ws²]


def _shifted_window_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """[nW, ws², ws²] additive mask for SW-MSA (−100 on cross-region
    pairs), computed exactly as modeling_clap get_attn_mask."""
    img = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for vs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, vs, :] = cnt
            cnt += 1
    mw = img.reshape(1, h // ws, ws, w // ws, ws, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    mask = mw[:, None, :] - mw[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def _eval_batchnorm(x, mean, var, weight, bias, axis, eps=1e-5):
    """Inference BatchNorm over ``axis`` with running statistics."""
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]
    inv = jax.lax.rsqrt(var.reshape(shape) + eps)
    return (x - mean.reshape(shape)) * inv * weight.reshape(shape) + bias.reshape(shape)


class MLPProjection(nn.Module):
    """linear → act → linear (modeling_clap ClapProjectionLayer:980-996)."""

    projection_dim: int
    act: str = "relu"

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.projection_dim, name="linear1")(x)
        x = jax.nn.relu(x) if self.act == "relu" else jax.nn.gelu(x)
        return nn.Dense(self.projection_dim, name="linear2")(x)


# ------------------------------------------------------------- text tower


class ClapTextLayer(nn.Module):
    cfg: ClapTextTowerConfig

    @nn.compact
    def __call__(self, x, attn_bias):
        c = self.cfg
        hd = c.hidden_size // c.num_heads
        b, t, _ = x.shape

        def heads(y):
            return y.reshape(b, t, c.num_heads, hd).transpose(0, 2, 1, 3)

        q = heads(nn.Dense(c.hidden_size, name="query")(x))
        k = heads(nn.Dense(c.hidden_size, name="key")(x))
        v = heads(nn.Dense(c.hidden_size, name="value")(x))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
        scores = scores + attn_bias
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, c.hidden_size)
        attn_out = nn.Dense(c.hidden_size, name="attn_out")(ctx)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attn_ln")(attn_out + x)
        inter = jax.nn.gelu(
            nn.Dense(c.intermediate_size, name="intermediate")(x),
            approximate=False,
        )
        out = nn.Dense(c.hidden_size, name="output")(inter)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="out_ln")(out + x)


class ClapTextTower(nn.Module):
    """RoBERTa-style encoder + first-token pooler (modeling_clap
    ClapTextModel / ClapTextPooler; position ids offset past the pad id,
    create_position_ids_from_input_ids:101-116)."""

    cfg: ClapTextTowerConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        c = self.cfg
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        mask = attention_mask.astype(jnp.int32)
        position_ids = jnp.cumsum(mask, axis=1) * mask + c.pad_token_id

        word = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings")
        pos = nn.Embed(
            c.max_position_embeddings, c.hidden_size, name="position_embeddings"
        )
        tok = nn.Embed(
            c.type_vocab_size, c.hidden_size, name="token_type_embeddings"
        )
        x = (
            word(input_ids)
            + pos(position_ids)
            + tok(jnp.zeros_like(input_ids))
        )
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="emb_ln")(x)

        attn_bias = (1.0 - attention_mask[:, None, None, :].astype(x.dtype)) * -1e9
        for i in range(c.num_layers):
            x = ClapTextLayer(c, name=f"layer_{i}")(x, attn_bias)
        pooled = jnp.tanh(nn.Dense(c.hidden_size, name="pooler")(x[:, 0]))
        return x, pooled


# ------------------------------------------------------------ audio tower


class SwinBlock(nn.Module):
    """One HTSAT/Swin layer: LN → (shifted) window MSA with relative
    position bias → LN → MLP (modeling_clap ClapAudioLayer:542-664).
    Resolution, window size, and shift are static (computed per stage as
    set_shift_and_window_size does)."""

    dim: int
    num_heads: int
    resolution: tuple
    window_size: int
    shift: int
    mlp_ratio: float
    qkv_bias: bool
    eps: float

    @nn.compact
    def __call__(self, x):
        h, w = self.resolution
        ws, shift = self.window_size, self.shift
        b, L, c = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=self.eps, name="ln1")(x)
        x = x.reshape(b, h, w, c)
        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        windows = _window_partition(x, ws)  # [B·nW, ws², C]

        hd = c // self.num_heads
        n = windows.shape[1]

        def heads(y):
            return y.reshape(-1, n, self.num_heads, hd).transpose(0, 2, 1, 3)

        q = heads(nn.Dense(c, use_bias=self.qkv_bias, name="query")(windows))
        k = heads(nn.Dense(c, use_bias=self.qkv_bias, name="key")(windows))
        v = heads(nn.Dense(c, use_bias=self.qkv_bias, name="value")(windows))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)

        table = self.param(
            "rel_bias",
            nn.initializers.zeros,
            ((2 * ws - 1) * (2 * ws - 1), self.num_heads),
        )
        idx = _relative_position_index(ws).reshape(-1)
        bias = table[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)
        scores = scores + bias[None]

        if shift > 0:
            amask = jnp.asarray(_shifted_window_mask(hp, wp, ws, shift))
            nw = amask.shape[0]
            scores = scores.reshape(-1, nw, self.num_heads, n, n)
            scores = scores + amask[None, :, None]
            scores = scores.reshape(-1, self.num_heads, n, n)

        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(-1, n, c)
        ctx = nn.Dense(c, name="proj")(ctx)

        x = _window_reverse(ctx.reshape(-1, ws, ws, c), ws, hp, wp)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :h, :w]
        x = shortcut + x.reshape(b, L, c)

        y = nn.LayerNorm(epsilon=self.eps, name="ln2")(x)
        y = jax.nn.gelu(
            nn.Dense(int(c * self.mlp_ratio), name="fc1")(y), approximate=False
        )
        return x + nn.Dense(c, name="fc2")(y)


class PatchMerging(nn.Module):
    """2×2 patch merge: concat 4 neighbours → LN → linear 4C→2C
    (modeling_clap ClapAudioPatchMerging:729-781)."""

    resolution: tuple
    eps: float

    @nn.compact
    def __call__(self, x):
        h, w = self.resolution
        b, _, c = x.shape
        x = x.reshape(b, h, w, c)
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        x = x.reshape(b, -1, 4 * c)
        x = nn.LayerNorm(epsilon=self.eps, name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, name="reduction")(x)


class AFFBlock(nn.Module):
    """Attentional feature fusion for the fused (long-audio) path
    (modeling_clap ClapAudioAFFBlock:225-262). NHWC; BatchNorms run in
    inference mode off converted running stats."""

    channels: int
    r: int

    @nn.compact
    def __call__(self, x, residual):
        ic = self.channels // self.r

        def branch(y, prefix):
            y = nn.Conv(ic, (1, 1), name=f"{prefix}_c1")(y)
            y = _eval_batchnorm(
                y,
                self.param(f"{prefix}_bn1_mean", nn.initializers.zeros, (ic,)),
                self.param(f"{prefix}_bn1_var", nn.initializers.ones, (ic,)),
                self.param(f"{prefix}_bn1_weight", nn.initializers.ones, (ic,)),
                self.param(f"{prefix}_bn1_bias", nn.initializers.zeros, (ic,)),
                axis=3,
            )
            y = jax.nn.relu(y)
            y = nn.Conv(self.channels, (1, 1), name=f"{prefix}_c2")(y)
            return _eval_batchnorm(
                y,
                self.param(f"{prefix}_bn2_mean", nn.initializers.zeros, (self.channels,)),
                self.param(f"{prefix}_bn2_var", nn.initializers.ones, (self.channels,)),
                self.param(f"{prefix}_bn2_weight", nn.initializers.ones, (self.channels,)),
                self.param(f"{prefix}_bn2_bias", nn.initializers.zeros, (self.channels,)),
                axis=3,
            )

        s = x + residual
        att = branch(s, "local") + branch(
            jnp.mean(s, axis=(1, 2), keepdims=True), "global"
        )
        gate = jax.nn.sigmoid(att)
        return 2 * x * gate + 2 * residual * (1 - gate)


class ClapAudioTower(nn.Module):
    """HTSAT encoder (modeling_clap ClapAudioEncoder:783-978): mel
    BatchNorm → mel→image restructure → patch embed (+ optional AFF
    fusion) → 4 Swin stages → LN → frequency-grouped average pool."""

    cfg: ClapAudioTowerConfig

    @nn.compact
    def __call__(self, input_features, is_longer=None):
        c = self.cfg
        fr = c.freq_ratio
        b = input_features.shape[0]
        n_ch = input_features.shape[1]

        bn_mean = self.param("bn_mean", nn.initializers.zeros, (c.num_mel_bins,))
        bn_var = self.param("bn_var", nn.initializers.ones, (c.num_mel_bins,))
        bn_w = self.param("bn_weight", nn.initializers.ones, (c.num_mel_bins,))
        bn_b = self.param("bn_bias", nn.initializers.zeros, (c.num_mel_bins,))
        x = _eval_batchnorm(input_features, bn_mean, bn_var, bn_w, bn_b, axis=3)

        # mel → image (reshape_mel2img:824-856): resize to (spec·fr,
        # n_mels) via the align-corners bicubic matrix, then interleave
        # time into frequency
        t_in, f_in = x.shape[2], x.shape[3]
        spec_w, spec_h = c.spec_size * fr, c.spec_size // fr
        if t_in > spec_w or f_in > spec_h:
            raise ValueError("input longer than the swin input size")
        if t_in < spec_w:
            wmat = jnp.asarray(bicubic_resize_matrix(t_in, spec_w))
            x = jnp.einsum("ot,bctf->bcof", wmat, x)
        if f_in < spec_h:
            wmat = jnp.asarray(bicubic_resize_matrix(f_in, spec_h))
            x = jnp.einsum("of,bctf->bcto", wmat, x)
        x = x.reshape(b, n_ch * fr, spec_w // fr, spec_h)
        x = x.transpose(0, 1, 3, 2)
        x = x.reshape(b, n_ch, spec_h * fr, spec_w // fr)  # [B, C, img, img]
        frames_num = x.shape[2]

        # patch embed (ClapAudioPatchEmbed:265-361) — NHWC convs
        ps, (st_h, st_w) = c.patch_size, tuple(c.patch_stride)
        pad_h, pad_w = (ps - st_h) // 2, (ps - st_w) // 2
        glob = x[:, 0:1].transpose(0, 2, 3, 1)  # [B, img, img, 1]
        glob = nn.Conv(
            c.patch_embeds_hidden_size,
            (ps, ps),
            strides=(st_h, st_w),
            padding=((pad_h, pad_h), (pad_w, pad_w)),
            name="patch_proj",
        )(glob)
        if c.enable_fusion:
            # local branch: 3 crops through mel_conv2d, concatenated along
            # width, zero-padded, fused via AFF; rows with is_longer=False
            # keep the global embedding (the torch index_select becomes a
            # compile-friendly where)
            loc = x[:, 1:].transpose(0, 2, 3, 1)  # [B, img, img, 3]
            n_local = loc.shape[-1]
            loc = loc.transpose(0, 3, 1, 2).reshape(
                b * n_local, x.shape[2], x.shape[3], 1
            )
            loc = nn.Conv(
                c.patch_embeds_hidden_size,
                (ps, ps * 3),
                strides=(st_h, st_w * 3),
                padding=((pad_h, pad_h), (pad_w, pad_w)),
                name="mel_conv2d",
            )(loc)
            f_dim = loc.shape[-1]
            lh, lw = loc.shape[1], loc.shape[2]
            loc = loc.reshape(b, n_local, lh, lw, f_dim)
            loc = loc.transpose(0, 2, 1, 3, 4).reshape(b, lh, n_local * lw, f_dim)
            out_w = glob.shape[2]
            loc = jnp.pad(loc, ((0, 0), (0, 0), (0, out_w - n_local * lw), (0, 0)))
            fused = AFFBlock(c.patch_embeds_hidden_size, c.aff_block_r,
                             name="fusion")(glob, loc)
            if is_longer is None:
                is_longer = jnp.zeros((b,), bool)
            sel = is_longer.reshape(b, 1, 1, 1).astype(bool)
            glob = jnp.where(sel, fused, glob)
        gh, gw = glob.shape[1], glob.shape[2]
        x = glob.reshape(b, gh * gw, c.patch_embeds_hidden_size)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="patch_norm")(x)

        n_stages = len(c.depths)
        res = (gh, gw)
        for i in range(n_stages):
            dim = c.patch_embeds_hidden_size * 2**i
            for j in range(c.depths[i]):
                # set_shift_and_window_size semantics: small resolutions
                # collapse to one unshifted full window
                if min(res) <= c.window_size:
                    ws_eff, shift = min(res), 0
                else:
                    ws_eff = c.window_size
                    shift = 0 if j % 2 == 0 else c.window_size // 2
                x = SwinBlock(
                    dim=dim,
                    num_heads=c.num_heads[i],
                    resolution=res,
                    window_size=ws_eff,
                    shift=shift,
                    mlp_ratio=c.mlp_ratio,
                    qkv_bias=c.qkv_bias,
                    eps=c.layer_norm_eps,
                    name=f"stage_{i}_block_{j}",
                )(x)
            if i < n_stages - 1:
                # HF precomputes stage resolutions as grid // 2**i (floor);
                # every shipped config has even resolutions at each merge
                assert res[0] % 2 == 0 and res[1] % 2 == 0, res
                x = PatchMerging(res, c.layer_norm_eps, name=f"stage_{i}_merge")(x)
                res = (res[0] // 2, res[1] // 2)

        nf = c.patch_embeds_hidden_size * 2 ** (n_stages - 1)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_norm")(x)

        # frequency-grouped pooling (ClapAudioEncoder.forward:941-960)
        freq_shape = frames_num // (2 ** (n_stages - 1)) // st_h
        temp_shape = frames_num // (2 ** (n_stages - 1)) // st_w
        x = x.transpose(0, 2, 1).reshape(b, nf, freq_shape, temp_shape)
        c_freq_bin = freq_shape // fr
        x = x.reshape(b, nf, freq_shape // c_freq_bin, c_freq_bin, temp_shape)
        x = x.transpose(0, 1, 3, 2, 4).reshape(b, nf, c_freq_bin, -1)
        latent = x.reshape(b, nf, -1).mean(-1)
        return x, latent


# ------------------------------------------------------------- full model


class ClapFlax(nn.Module):
    """Joint model: ``get_text_features`` / ``get_audio_features`` return
    L2-normalized embeddings in the shared space (modeling_clap
    ClapModel.get_text_features/get_audio_features)."""

    text_cfg: ClapTextTowerConfig
    audio_cfg: ClapAudioTowerConfig

    def setup(self):
        self.text_model = ClapTextTower(self.text_cfg, name="text_model")
        self.audio_model = ClapAudioTower(self.audio_cfg, name="audio_model")
        self.text_projection = MLPProjection(
            self.text_cfg.projection_dim,
            self.text_cfg.projection_hidden_act,
            name="text_projection",
        )
        self.audio_projection = MLPProjection(
            self.audio_cfg.projection_dim,
            self.audio_cfg.projection_hidden_act,
            name="audio_projection",
        )

    def get_text_features(self, input_ids, attention_mask=None):
        _, pooled = self.text_model(input_ids, attention_mask)
        feats = self.text_projection(pooled)
        return feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12
        )

    def get_text_hidden_states(self, input_ids, attention_mask=None):
        """Token-level features (CLAPTextConditioner use_text_features —
        conditioners.py:147-157 uses a hidden layer's sequence output)."""
        hidden, _ = self.text_model(input_ids, attention_mask)
        return hidden

    def get_audio_features(self, input_features, is_longer=None):
        _, latent = self.audio_model(input_features, is_longer)
        feats = self.audio_projection(latent)
        return feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12
        )

    def __call__(self, input_ids, input_features, attention_mask=None,
                 is_longer=None):
        return (
            self.get_text_features(input_ids, attention_mask),
            self.get_audio_features(input_features, is_longer),
        )


# -------------------------------------------------------------- converter


def configs_from_hf(hf_config) -> tuple[ClapTextTowerConfig, ClapAudioTowerConfig]:
    t, a = hf_config.text_config, hf_config.audio_config
    return (
        ClapTextTowerConfig(
            vocab_size=t.vocab_size,
            hidden_size=t.hidden_size,
            num_layers=t.num_hidden_layers,
            num_heads=t.num_attention_heads,
            intermediate_size=t.intermediate_size,
            max_position_embeddings=t.max_position_embeddings,
            type_vocab_size=t.type_vocab_size,
            pad_token_id=t.pad_token_id,
            layer_norm_eps=t.layer_norm_eps,
            projection_dim=hf_config.projection_dim,
            projection_hidden_act=t.projection_hidden_act,
        ),
        ClapAudioTowerConfig(
            spec_size=a.spec_size,
            num_mel_bins=a.num_mel_bins,
            patch_size=a.patch_size,
            patch_stride=tuple(a.patch_stride),
            patch_embeds_hidden_size=a.patch_embeds_hidden_size,
            depths=tuple(a.depths),
            num_heads=tuple(a.num_attention_heads),
            window_size=a.window_size,
            mlp_ratio=a.mlp_ratio,
            qkv_bias=a.qkv_bias,
            layer_norm_eps=a.layer_norm_eps,
            patch_embed_input_channels=a.patch_embed_input_channels,
            enable_fusion=a.enable_fusion,
            aff_block_r=a.aff_block_r,
            projection_dim=hf_config.projection_dim,
            projection_hidden_act=a.projection_hidden_act,
        ),
    )


def _dense(sd, key):
    return {"kernel": sd[f"{key}.weight"].T, "bias": sd[f"{key}.bias"]}


def _dense_nobias(sd, key):
    return {"kernel": sd[f"{key}.weight"].T}


def _ln(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _conv(sd, key):
    # torch OIHW → flax HWIO
    return {
        "kernel": sd[f"{key}.weight"].transpose(2, 3, 1, 0),
        "bias": sd[f"{key}.bias"],
    }


def convert_hf_clap(
    state_dict: dict, text_cfg: ClapTextTowerConfig, audio_cfg: ClapAudioTowerConfig
) -> dict:
    """transformers.ClapModel state_dict (numpy) → ClapFlax params."""
    sd = state_dict
    p: dict = {}

    # ---- text tower
    tp = "text_model"
    text: dict = {
        "word_embeddings": {"embedding": sd[f"{tp}.embeddings.word_embeddings.weight"]},
        "position_embeddings": {
            "embedding": sd[f"{tp}.embeddings.position_embeddings.weight"]
        },
        "token_type_embeddings": {
            "embedding": sd[f"{tp}.embeddings.token_type_embeddings.weight"]
        },
        "emb_ln": _ln(sd, f"{tp}.embeddings.LayerNorm"),
        "pooler": _dense(sd, f"{tp}.pooler.dense"),
    }
    for i in range(text_cfg.num_layers):
        lp = f"{tp}.encoder.layer.{i}"
        text[f"layer_{i}"] = {
            "query": _dense(sd, f"{lp}.attention.self.query"),
            "key": _dense(sd, f"{lp}.attention.self.key"),
            "value": _dense(sd, f"{lp}.attention.self.value"),
            "attn_out": _dense(sd, f"{lp}.attention.output.dense"),
            "attn_ln": _ln(sd, f"{lp}.attention.output.LayerNorm"),
            "intermediate": _dense(sd, f"{lp}.intermediate.dense"),
            "output": _dense(sd, f"{lp}.output.dense"),
            "out_ln": _ln(sd, f"{lp}.output.LayerNorm"),
        }
    p["text_model"] = text

    # ---- audio tower
    ap = "audio_model.audio_encoder"
    audio: dict = {
        "bn_mean": sd[f"{ap}.batch_norm.running_mean"],
        "bn_var": sd[f"{ap}.batch_norm.running_var"],
        "bn_weight": sd[f"{ap}.batch_norm.weight"],
        "bn_bias": sd[f"{ap}.batch_norm.bias"],
        "patch_proj": _conv(sd, f"{ap}.patch_embed.proj"),
        "patch_norm": _ln(sd, f"{ap}.patch_embed.norm"),
        "final_norm": _ln(sd, f"{ap}.norm"),
    }
    if audio_cfg.enable_fusion:
        audio["mel_conv2d"] = _conv(sd, f"{ap}.patch_embed.mel_conv2d")
        fp = f"{ap}.patch_embed.fusion_model"
        fusion: dict = {}
        for branch, prefix in (("local_att", "local"), ("global_att", "global")):
            # Sequential indices: local (0 conv, 1 bn, 3 conv, 4 bn);
            # global has a leading AdaptiveAvgPool2d (1 conv, 2 bn, 4
            # conv, 5 bn)
            idxs = (0, 1, 3, 4) if branch == "local_att" else (1, 2, 4, 5)
            fusion.update(
                {
                    f"{prefix}_c1": _conv(sd, f"{fp}.{branch}.{idxs[0]}"),
                    f"{prefix}_bn1_mean": sd[f"{fp}.{branch}.{idxs[1]}.running_mean"],
                    f"{prefix}_bn1_var": sd[f"{fp}.{branch}.{idxs[1]}.running_var"],
                    f"{prefix}_bn1_weight": sd[f"{fp}.{branch}.{idxs[1]}.weight"],
                    f"{prefix}_bn1_bias": sd[f"{fp}.{branch}.{idxs[1]}.bias"],
                    f"{prefix}_c2": _conv(sd, f"{fp}.{branch}.{idxs[2]}"),
                    f"{prefix}_bn2_mean": sd[f"{fp}.{branch}.{idxs[3]}.running_mean"],
                    f"{prefix}_bn2_var": sd[f"{fp}.{branch}.{idxs[3]}.running_var"],
                    f"{prefix}_bn2_weight": sd[f"{fp}.{branch}.{idxs[3]}.weight"],
                    f"{prefix}_bn2_bias": sd[f"{fp}.{branch}.{idxs[3]}.bias"],
                }
            )
        audio["fusion"] = fusion
    for i in range(len(audio_cfg.depths)):
        for j in range(audio_cfg.depths[i]):
            bp = f"{ap}.layers.{i}.blocks.{j}"
            audio[f"stage_{i}_block_{j}"] = {
                "ln1": _ln(sd, f"{bp}.layernorm_before"),
                "query": _dense(sd, f"{bp}.attention.self.query"),
                "key": _dense(sd, f"{bp}.attention.self.key"),
                "value": _dense(sd, f"{bp}.attention.self.value"),
                "rel_bias": sd[f"{bp}.attention.self.relative_position_bias_table"],
                "proj": _dense(sd, f"{bp}.attention.output.dense"),
                "ln2": _ln(sd, f"{bp}.layernorm_after"),
                "fc1": _dense(sd, f"{bp}.intermediate.dense"),
                "fc2": _dense(sd, f"{bp}.output.dense"),
            }
        if i < len(audio_cfg.depths) - 1:
            audio[f"stage_{i}_merge"] = {
                "norm": _ln(sd, f"{ap}.layers.{i}.downsample.norm"),
                "reduction": _dense_nobias(sd, f"{ap}.layers.{i}.downsample.reduction"),
            }
    p["audio_model"] = audio

    p["text_projection"] = {
        "linear1": _dense(sd, "text_projection.linear1"),
        "linear2": _dense(sd, "text_projection.linear2"),
    }
    p["audio_projection"] = {
        "linear1": _dense(sd, "audio_projection.linear1"),
        "linear2": _dense(sd, "audio_projection.linear2"),
    }
    return jax.tree.map(jnp.asarray, p)


# ---------------------------------------------------------- host embedder


class ClapEmbedder:
    """Host-side CLAP embedding service over the flax towers — the drop-in
    behind the reference's frozen conditioners (conditioners.py
    CLAPTextConditioner.forward:157-177 / CLAPAudioConditioner.forward:
    224-239: one unit-norm [B, 512] vector per prompt/clip).

    ``from_hf_dir`` loads a ``transformers.ClapModel`` checkpoint
    directory (plus its tokenizer / feature extractor when present) and
    converts the weights; jitted apply functions are cached per instance.
    """

    def __init__(self, model: ClapFlax, params, tokenizer=None,
                 feature_extractor=None):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.feature_extractor = feature_extractor
        self._text_fn = jax.jit(
            lambda p, ids, mask: model.apply(
                p, ids, mask, method=ClapFlax.get_text_features
            )
        )
        self._audio_fn = jax.jit(
            lambda p, feats, longer: model.apply(
                p, feats, longer, method=ClapFlax.get_audio_features
            )
        )

    @classmethod
    def from_hf_dir(cls, path: str) -> "ClapEmbedder":
        from transformers import ClapModel

        hf = ClapModel.from_pretrained(path)
        sd = {k: v.numpy() for k, v in hf.state_dict().items()}
        tcfg, acfg = configs_from_hf(hf.config)
        params = {"params": convert_hf_clap(sd, tcfg, acfg)}
        tokenizer = feature_extractor = None
        try:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(path)
        except Exception:
            pass
        try:
            from transformers import ClapFeatureExtractor

            feature_extractor = ClapFeatureExtractor.from_pretrained(path)
        except Exception:
            pass
        return cls(ClapFlax(tcfg, acfg), params, tokenizer, feature_extractor)

    def embed_text(self, texts: Sequence[str]) -> np.ndarray:
        if self.tokenizer is None:
            raise ValueError("no tokenizer available in the checkpoint dir")
        enc = self.tokenizer(list(texts), padding=True, return_tensors="np")
        out = self._text_fn(
            self.params,
            jnp.asarray(enc["input_ids"]),
            jnp.asarray(enc["attention_mask"]),
        )
        return np.asarray(out, np.float32)

    def embed_audio(self, audio: np.ndarray, sample_rate: int) -> np.ndarray:
        if self.feature_extractor is None:
            raise ValueError("no feature extractor in the checkpoint dir")
        # the HF extractor's 4-crop "fusion" truncation only fits
        # fusion-enabled towers; unfused towers take the 1-channel path
        trunc = (
            "fusion" if self.model.audio_cfg.enable_fusion else "rand_trunc"
        )
        enc = self.feature_extractor(
            list(np.asarray(audio, np.float32)),
            sampling_rate=sample_rate,
            truncation=trunc,
            return_tensors="np",
        )
        longer = enc.get("is_longer")
        longer = (
            jnp.asarray(np.asarray(longer).reshape(-1), bool)
            if longer is not None
            else jnp.zeros((len(audio),), bool)
        )
        return np.asarray(
            self._audio_fn(
                self.params, jnp.asarray(enc["input_features"]), longer
            ),
            np.float32,
        )
