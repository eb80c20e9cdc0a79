"""Local-attention transformer stack (reference local_attention.py:18-281).

ContinuousLocalTransformer + TransformerDownsample/UpsampleBlock1D +
TransformerEncoder/Decoder1D — the transformer-autoencoder variant of the
stable-audio family (selectable alongside the Oobleck conv VAE).

TPU-native local attention: instead of NATTEN's gather-based neighborhood
kernels, the sequence is blocked into windows of ``window`` tokens and
each query block attends to [previous ‖ own ‖ next] key blocks — a static
banded pattern built from two jnp.pad shifts, so XLA sees fixed shapes and
batches one [nb, w, 3w] attention einsum onto the MXU. Neighborhood
radius therefore covers ≥ natten_kernel_size for the same window size.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from audio_intelligence_tpu.ops.rotary import apply_rope_1d


def local_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    window: int,
    mask: Optional[jax.Array] = None,
    causal: bool = False,
) -> jax.Array:
    """Banded attention: q/k/v [B, H, T, D] → [B, H, T, D]; each window-
    block attends to its neighbors (prev, self, next; prev+self if causal,
    plus an in-band causal triangle)."""
    b, h, t, d = q.shape
    pad = (window - t % window) % window
    if pad:
        padcfg = ((0, 0), (0, 0), (0, pad), (0, 0))
        q, k, v = jnp.pad(q, padcfg), jnp.pad(k, padcfg), jnp.pad(v, padcfg)
    tt = t + pad
    nb = tt // window
    valid = jnp.arange(tt) < t
    if mask is not None:
        valid = valid & jnp.pad(mask, ((0, pad),) if mask.ndim == 1 else ((0, 0), (0, pad)))

    def blockify(x):
        return x.reshape(b, h, nb, window, d)

    qb = blockify(q)
    kb, vb = blockify(k), blockify(v)
    # neighbor concat [B, H, nb, 3w, D] via roll-free shifts
    padb = ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0))
    kp = jnp.pad(kb, padb)
    vp = jnp.pad(vb, padb)
    k3 = jnp.concatenate([kp[:, :, :-2], kp[:, :, 1:-1], kp[:, :, 2:]], axis=3)
    v3 = jnp.concatenate([vp[:, :, :-2], vp[:, :, 1:-1], vp[:, :, 2:]], axis=3)

    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32)).astype(q.dtype)
    logits = jnp.einsum(
        "bhnqd,bhnkd->bhnqk", qb * scale, k3,
        preferred_element_type=jnp.float32,
    )  # [B, H, nb, w, 3w]

    # key validity: absolute positions of the 3w keys per block
    block_idx = jnp.arange(nb)[:, None]  # [nb, 1]
    key_off = jnp.arange(3 * window)[None, :] - window  # [-w .. 2w)
    key_pos = block_idx * window + key_off  # [nb, 3w]
    key_ok = (key_pos >= 0) & (key_pos < t)
    logits = jnp.where(key_ok[None, None, :, None, :], logits, -1e9)
    if causal:
        q_pos = block_idx * window + jnp.arange(window)[None, :]  # [nb, w]
        causal_ok = key_pos[:, None, :] <= q_pos[:, :, None]  # [nb, w, 3w]
        logits = jnp.where(causal_ok[None, None], logits, -1e9)

    probs = jax.nn.softmax(logits, axis=-1).astype(v3.dtype)
    out = jnp.einsum(
        "bhnqk,bhnkd->bhnqd", probs, v3, preferred_element_type=jnp.float32
    ).astype(v.dtype)
    out = out.reshape(b, h, tt, d)[:, :, :t]
    return out


class AdaRMSNorm(nn.Module):
    """RMSNorm with condition-dependent gain (blocks.py AdaRMSNorm):
    y = rms(x) · linear(cond), linear initialized to 1."""

    @nn.compact
    def __call__(self, x, cond):
        dim = x.shape[-1]
        normed = x * jax.lax.rsqrt(
            jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True) + 1e-8
        ).astype(x.dtype)
        gain = nn.Dense(
            dim, use_bias=False, kernel_init=nn.initializers.zeros, name="to_gamma"
        )(cond) + 1.0
        if gain.ndim == 2:
            gain = gain[:, None, :]
        return normed * gain.astype(x.dtype)


class _FeedForward(nn.Module):
    mult: int = 2

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        uv = nn.Dense(2 * dim * self.mult, use_bias=False, name="up")(x)
        u, g = jnp.split(uv, 2, axis=-1)
        return nn.Dense(dim, use_bias=False, name="down")(u * jax.nn.silu(g))


class _LocalSelfAttention(nn.Module):
    n_heads: int
    window: int
    causal: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        b, t, c = x.shape
        d = c // self.n_heads
        qkv = nn.Dense(3 * c, use_bias=False, name="to_qkv")(x)
        qkv = qkv.reshape(b, t, 3, self.n_heads, d)
        q, k, v = [jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3)]
        rot = max(d // 2, min(32, d))
        q = apply_rope_1d(q, rot_dim=rot)
        k = apply_rope_1d(k, rot_dim=rot)
        out = local_attention(q, k, v, self.window, mask=mask, causal=self.causal)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, t, c)
        return nn.Dense(
            c, use_bias=False, kernel_init=nn.initializers.zeros, name="to_out"
        )(out)


class _CrossAttention(nn.Module):
    n_heads: int

    @nn.compact
    def __call__(self, x, context, context_mask=None):
        b, t, c = x.shape
        d = c // self.n_heads
        q = nn.Dense(c, use_bias=False, name="to_q")(x)
        kv = nn.Dense(2 * c, use_bias=False, name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)
        split = lambda z: jnp.transpose(
            z.reshape(b, -1, self.n_heads, d), (0, 2, 1, 3)
        )
        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q / jnp.sqrt(jnp.asarray(d, q.dtype)), k,
            preferred_element_type=jnp.float32,
        )
        if context_mask is not None:
            logits = jnp.where(context_mask[:, None, None, :], logits, -1e9)
        probs = jax.nn.softmax(logits, -1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v).astype(v.dtype)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, t, c)
        return nn.Dense(
            c, use_bias=False, kernel_init=nn.initializers.zeros, name="to_out"
        )(out)


class ContinuousLocalTransformer(nn.Module):
    """local_attention.py:18-105. dim_in/dim_out project at the edges;
    cond enables AdaRMSNorm, cross_attn_cond enables interleaved
    cross-attention; prepend_cond is concatenated on the sequence."""

    dim: int
    depth: int
    dim_in: Optional[int] = None
    dim_out: Optional[int] = None
    causal: bool = False
    local_attn_window_size: int = 64
    heads: int = 8
    ff_mult: int = 2
    cond_dim: int = 0
    cross_attn_cond_dim: int = 0

    @nn.compact
    def __call__(
        self, x, mask=None, cond=None, cross_attn_cond=None,
        cross_attn_cond_mask=None, prepend_cond=None,
    ):
        if self.dim_in is not None:
            x = nn.Dense(self.dim, name="project_in")(x)
        if prepend_cond is not None:
            x = jnp.concatenate([prepend_cond, x], axis=1)
            if mask is not None:
                mask = jnp.concatenate(
                    [jnp.ones(prepend_cond.shape[:2], bool), mask], axis=1
                )
        for i in range(self.depth):
            res = x
            if self.cond_dim > 0 and cond is not None:
                h = AdaRMSNorm(name=f"attn_norm{i}")(x, cond)
            else:
                h = nn.LayerNorm(use_bias=False, name=f"attn_norm{i}")(x)
            x = res + _LocalSelfAttention(
                self.heads, self.local_attn_window_size, self.causal,
                name=f"attn{i}",
            )(h, mask)
            if self.cross_attn_cond_dim > 0 and cross_attn_cond is not None:
                x = x + _CrossAttention(self.heads, name=f"xattn{i}")(
                    x, cross_attn_cond, cross_attn_cond_mask
                )
            res = x
            if self.cond_dim > 0 and cond is not None:
                h = AdaRMSNorm(name=f"ff_norm{i}")(x, cond)
            else:
                h = nn.LayerNorm(use_bias=False, name=f"ff_norm{i}")(x)
            x = res + _FeedForward(self.ff_mult, name=f"ff{i}")(h)
        if self.dim_out is not None:
            x = nn.Dense(self.dim_out, name="project_out")(x)
        return x


class TransformerDownsampleBlock1D(nn.Module):
    """local_attention.py:106-147: transform, then trade sequence length
    for channels (r tokens → 1) and project back to embed_dim."""

    embed_dim: int = 768
    depth: int = 3
    heads: int = 12
    downsample_ratio: int = 2
    local_attn_window_size: int = 64

    @nn.compact
    def __call__(self, x):
        if x.shape[-1] != self.embed_dim:
            x = nn.Dense(self.embed_dim, use_bias=False, name="project_in")(x)
        x = ContinuousLocalTransformer(
            dim=self.embed_dim, depth=self.depth, heads=self.heads,
            local_attn_window_size=self.local_attn_window_size,
            name="transformer",
        )(x)
        b, t, c = x.shape
        r = self.downsample_ratio
        x = x.reshape(b, t // r, c * r)
        return nn.Dense(self.embed_dim, use_bias=False, name="project_down")(x)


class TransformerUpsampleBlock1D(nn.Module):
    """local_attention.py:148-190: project up, trade channels for length,
    then transform."""

    embed_dim: int = 768
    depth: int = 3
    heads: int = 12
    upsample_ratio: int = 2
    local_attn_window_size: int = 64

    @nn.compact
    def __call__(self, x):
        if x.shape[-1] != self.embed_dim:
            x = nn.Dense(self.embed_dim, use_bias=False, name="project_in")(x)
        x = nn.Dense(
            self.embed_dim * self.upsample_ratio, use_bias=False, name="project_up"
        )(x)
        b, t, c = x.shape
        r = self.upsample_ratio
        x = x.reshape(b, t * r, c // r)
        return ContinuousLocalTransformer(
            dim=self.embed_dim, depth=self.depth, heads=self.heads,
            local_attn_window_size=self.local_attn_window_size,
            name="transformer",
        )(x)


class TransformerEncoder1D(nn.Module):
    """local_attention.py:193-232; NWC in/out ([B, T, C_in] → [B, T/Πr, out])."""

    out_channels: int
    embed_dims: Sequence[int] = (96, 192, 384, 768)
    heads: Sequence[int] = (12, 12, 12, 12)
    depths: Sequence[int] = (3, 3, 3, 3)
    ratios: Sequence[int] = (2, 2, 2, 2)
    local_attn_window_size: int = 64

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.embed_dims[0], use_bias=False, name="project_in")(x)
        for i, (dim, h, dep, r) in enumerate(
            zip(self.embed_dims, self.heads, self.depths, self.ratios)
        ):
            x = TransformerDownsampleBlock1D(
                embed_dim=dim, depth=dep, heads=h, downsample_ratio=r,
                local_attn_window_size=self.local_attn_window_size,
                name=f"layer{i}",
            )(x)
        return nn.Dense(self.out_channels, use_bias=False, name="project_out")(x)


class TransformerDecoder1D(nn.Module):
    """local_attention.py:235-281; NWC in/out."""

    out_channels: int
    embed_dims: Sequence[int] = (768, 384, 192, 96)
    heads: Sequence[int] = (12, 12, 12, 12)
    depths: Sequence[int] = (3, 3, 3, 3)
    ratios: Sequence[int] = (2, 2, 2, 2)
    local_attn_window_size: int = 64

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.embed_dims[0], use_bias=False, name="project_in")(x)
        for i, (dim, h, dep, r) in enumerate(
            zip(self.embed_dims, self.heads, self.depths, self.ratios)
        ):
            x = TransformerUpsampleBlock1D(
                embed_dim=dim, depth=dep, heads=h, upsample_ratio=r,
                local_attn_window_size=self.local_attn_window_size,
                name=f"layer{i}",
            )(x)
        return nn.Dense(self.out_channels, use_bias=False, name="project_out")(x)
