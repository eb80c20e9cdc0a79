"""int8 implicit-GEMM 3×3 conv with a fused stats epilogue (Pallas TPU).

The A2SB UNet's fused int8 ResBlock chain is GN→SiLU→quant→conv, so every
conv's OUTPUT immediately needs per-channel Σ/Σ² for the next GroupNorm.
XLA computes those statistics as a separate full-map read (profiled at
~0.7 ms per L0 instance, ~9 ms/step total on the restore bench). This
kernel produces them in the conv's epilogue while the output tile is
still in VMEM:

    y, (Σ, Σ²) = conv3x3_int8_stats(x_q, s_x, w, bias[, residual])

- implicit GEMM: 9 shifted [bh·W, C]×[C, Cout] int8 MXU dots per H-tile,
  weights VMEM-resident; int32 accumulation, fp32 rescale by
  (s_x·s_w[c]), optional residual add (the ResBlock skip), bf16 output.
- halo handling: the H-tile is passed three times (prev/this/next block)
  and the kernel assembles [bh+2] rows in VMEM; W halos come from an
  in-VMEM pad. Global edges are zero-masked — SAME padding semantics.
- stats: per-(batch, channel) sums accumulate across sequential H-tiles
  into [B, 1, C] fp32 outputs (one grid pass, no extra HBM traffic).

Matches ``quant_conv2d(..., strides=(1,1), padding=1)`` + the GN stats
contract of ``GroupNorm32`` (unet.py) to fp32 tolerance; gated in
tests/test_pallas_conv.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(
    xm_ref, xc_ref, xp_ref, w_ref, sc_ref, bias_ref, res_ref,
    o_ref, s_ref, s2_ref, *, bh: int, n_h: int, with_residual: bool,
):
    j = pl.program_id(1)
    # assemble [bh+2, W, C] with zeroed halo rows at the global edges
    top = xm_ref[-1:, :, :]
    bot = xp_ref[:1, :, :]
    top = jnp.where(j == 0, jnp.zeros_like(top), top)
    bot = jnp.where(j == n_h - 1, jnp.zeros_like(bot), bot)
    xv = jnp.concatenate([top, xc_ref[...], bot], axis=0)
    # W halo via an in-VMEM pad → [bh+2, W+2, C]
    xv = jnp.pad(xv, ((0, 0), (1, 1), (0, 0)))

    w = xv.shape[1] - 2
    c_out = w_ref.shape[2]
    acc = jnp.zeros((bh * w, c_out), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            a = xv[dy : dy + bh, dx : dx + w, :].reshape(bh * w, -1)
            acc = acc + jax.lax.dot_general(
                a, w_ref[dy * 3 + dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

    y = acc.astype(jnp.float32) * sc_ref[0][None, :] + bias_ref[0][None, :]
    y = y.reshape(bh, w, c_out)
    if with_residual:
        y = y + res_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)

    s = jnp.sum(y, axis=(0, 1))
    s2 = jnp.sum(y * y, axis=(0, 1))

    @pl.when(j == 0)
    def _init():
        s_ref[...] = jnp.zeros_like(s_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    s_ref[...] += s[None, :]
    s2_ref[...] += s2[None, :]


def _pick_bh(h: int, w: int, c_out: int, budget: int = 2 << 20) -> int:
    """Largest power-of-two H tile with a ≤2 MB int32 accumulator (the
    full working set — 3 double-buffered input blocks, accumulator, f32
    epilogue, bf16 output — must fit the 16 MB VMEM)."""
    bh = max(8, min(h, budget // max(1, w * c_out * 4)))
    while h % bh:
        bh //= 2
    return max(1, bh)


def conv3x3_int8_stats(
    x_q: jax.Array,
    s_x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    residual: jax.Array | None = None,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """3×3 stride-1 SAME int8 conv + per-channel output stats.

    x_q    int8 [B, H, W, C] (pre-quantized activations)
    s_x    fp32 scalar activation scale
    kernel bf16/f32 [3, 3, C, Cout] (quantized per-output-channel here)
    bias   [Cout] or None
    residual [B, H, W, Cout] added before stats (the ResBlock skip)

    Returns (y [B, H, W, Cout] out_dtype, sums [B, Cout] f32,
    sums_sq [B, Cout] f32).
    """
    from audio_intelligence_tpu.ops.quant import quantize_int8, symmetric_scales

    b, h, w, c = x_q.shape
    c_out = kernel.shape[3]
    s_w = symmetric_scales(kernel, axis=3)
    w_q = quantize_int8(kernel, s_w[None, None, None, :])
    w_cols = w_q.reshape(9, c, c_out)
    scale = (s_x * s_w).astype(jnp.float32)[None, :]  # [1, Cout]
    bias_op = (
        bias.astype(jnp.float32)[None, :]
        if bias is not None
        else jnp.zeros((1, c_out), jnp.float32)
    )

    bh = _pick_bh(h, w, c_out)
    n_h = h // bh
    grid = (b, n_h)

    x_spec_m = pl.BlockSpec(
        (None, bh, w, c), lambda i, j: (i, jnp.maximum(j - 1, 0), 0, 0)
    )
    x_spec_c = pl.BlockSpec((None, bh, w, c), lambda i, j: (i, j, 0, 0))
    x_spec_p = pl.BlockSpec(
        (None, bh, w, c), lambda i, j: (i, jnp.minimum(j + 1, n_h - 1), 0, 0)
    )
    res_spec = pl.BlockSpec((None, bh, w, c_out), lambda i, j: (i, j, 0, 0))
    if residual is None:
        residual = jnp.zeros((b, 1, 1, 1), out_dtype)
        res_spec = pl.BlockSpec((None, 1, 1, 1), lambda i, j: (i, 0, 0, 0))

    y, sums, sums_sq = pl.pallas_call(
        functools.partial(
            _kernel, bh=bh, n_h=n_h,
            with_residual=residual.ndim == 4 and residual.shape[1] == h,
        ),
        grid=grid,
        in_specs=[
            x_spec_m,
            x_spec_c,
            x_spec_p,
            pl.BlockSpec((9, c, c_out), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, c_out), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c_out), lambda i, j: (0, 0)),
            res_spec,
        ],
        out_specs=[
            pl.BlockSpec((None, bh, w, c_out), lambda i, j: (i, j, 0, 0)),
            # stats as [B, 1, C]: TPU blocks need the trailing dims aligned
            pl.BlockSpec((None, 1, c_out), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, 1, c_out), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c_out), out_dtype),
            jax.ShapeDtypeStruct((b, 1, c_out), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c_out), jnp.float32),
        ],
        interpret=interpret,
    )(x_q, x_q, x_q, w_cols, scale, bias_op, residual)
    return y, sums[:, 0], sums_sq[:, 0]
