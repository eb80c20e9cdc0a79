"""Fused GroupNorm(+modulation+SiLU) as Pallas TPU kernels.

The A2SB UNet (reference A2SB/networks.py GroupNorm32:25-27 + the
scale-shift-norm ResBlock :79-123) spends most of its step time in
GroupNorm statistics + normalize + modulate + SiLU chains. XLA's fusions
for these run ~5× off HBM speed-of-light on the conv-chosen layouts
(see PERF.md), so this module implements the chain as two streaming
Pallas passes:

1. stats pass  — per-(batch, channel) Σx and Σx² in fp32, accumulated
   across H-tiles (sequential TPU grid), one read of the map.
2. apply pass  — y = silu((x·eff_scale + eff_bias)·(1+mod_scale) +
   mod_shift), everything folded to the input dtype, one read + one
   write. The group statistics → per-channel affine folding happens in
   plain jnp between the two kernels (tiny [B, C] math).

Total ≈ 3 passes of HBM traffic vs ~10+ for the unfused chain.

Use via ``fused_group_norm`` (drop-in GroupNorm32 semantics) with
optional ``mod_scale/mod_shift [B, H, C]`` (the ResBlock conditioning)
and ``silu=True``. ``interpret=True`` runs on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _pick_h_tile(h: int, w: int, c: int, budget_elems: int = 1 << 20) -> int:
    """Largest power-of-two H tile keeping a [ht, W, C] block ≤ ~2 MB."""
    ht = max(1, min(h, budget_elems // max(1, w * c)))
    while h % ht:
        ht //= 2
    return max(1, ht)


def _stats_kernel(x_ref, s_ref, s2_ref):
    """Accumulate per-channel Σx, Σx² over sequential H-tiles of one batch.
    Stats refs are [1, 1, C] (TPU tiling needs ≥2 trailing dims aligned)."""
    ht = pl.program_id(1)
    x32 = x_ref[...].astype(jnp.float32)
    s = jnp.sum(x32, axis=(0, 1, 2))
    s2 = jnp.sum(x32 * x32, axis=(0, 1, 2))

    @pl.when(ht == 0)
    def _init():
        s_ref[...] = jnp.zeros_like(s_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    s_ref[...] += s[None, None, :]
    s2_ref[...] += s2[None, None, :]


def _silu(y, dtype):
    # mosaic can't lower bf16 logistic (f32 broadcast into bf16 vector);
    # compute in f32 in-register, cast back — VMEM-only, no HBM cost
    y32 = y.astype(jnp.float32)
    return (y32 * jax.nn.sigmoid(y32)).astype(dtype)


def _apply_kernel(x_ref, es_ref, eb_ref, o_ref, *, silu: bool):
    x = x_ref[...]
    y = x * es_ref[0, 0][None, None, None, :] + eb_ref[0, 0][None, None, None, :]
    if silu:
        y = _silu(y, x.dtype)
    o_ref[...] = y


def _apply_mod_kernel(x_ref, es_ref, eb_ref, ms_ref, sh_ref, o_ref, *, silu: bool):
    x = x_ref[...]
    y = x * es_ref[0, 0][None, None, None, :] + eb_ref[0, 0][None, None, None, :]
    y = y * (1 + ms_ref[...]) + sh_ref[...]  # [1, ht, 1, C] broadcasts over W
    if silu:
        y = _silu(y, x.dtype)
    o_ref[...] = y


def fused_group_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    mod_scale: jax.Array | None = None,
    mod_shift: jax.Array | None = None,
    silu: bool = False,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """GroupNorm32 (+ optional [B, H, C] scale-shift modulation, + optional
    SiLU) on NHWC maps. fp32 statistics, input-dtype elementwise."""
    b, h, w, c = x.shape
    groups = min(num_groups, c)
    cg = c // groups
    ht = _pick_h_tile(h, w, c)
    grid = (b, h // ht)

    sums, sumsq = pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, ht, w, c), lambda i, j: (i, j, 0, 0))],
        out_specs=[
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        interpret=interpret,
    )(x)

    n = h * w * cg
    mean = sums.reshape(b, groups, cg).sum(-1) / n  # [B, groups]
    mean_sq = sumsq.reshape(b, groups, cg).sum(-1) / n  # (sums are [B,1,C])
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    inv_c = jnp.repeat(inv, cg, axis=-1)  # [B, C]
    mean_c = jnp.repeat(mean, cg, axis=-1)
    scale32 = scale.astype(jnp.float32)[None, :]
    eff_scale = (inv_c * scale32).astype(x.dtype)
    eff_bias = (
        bias.astype(jnp.float32)[None, :] - mean_c * inv_c * scale32
    ).astype(x.dtype)

    eff_scale = eff_scale[:, None, :]  # [B, 1, C] for tiling
    eff_bias = eff_bias[:, None, :]
    if mod_scale is None:
        kernel = functools.partial(_apply_kernel, silu=silu)
        operands = (x, eff_scale, eff_bias)
        in_specs = [
            pl.BlockSpec((1, ht, w, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
        ]
    else:
        kernel = functools.partial(_apply_mod_kernel, silu=silu)
        operands = (
            x, eff_scale, eff_bias,
            mod_scale.astype(x.dtype)[:, :, None, :],  # [B, H, 1, C]
            mod_shift.astype(x.dtype)[:, :, None, :],
        )
        in_specs = [
            pl.BlockSpec((1, ht, w, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, ht, 1, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, ht, 1, c), lambda i, j: (i, j, 0, 0)),
        ]

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ht, w, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(*operands)
