"""int8 symmetric quantization for conv/dense hot paths.

v5e's MXU doubles throughput at int8 (394 TOPS vs 197 bf16 TFLOPS) — the
A2SB restore UNet is MXU-bound at bf16 (24 TFLOP/8-window forward ≈
122 ms minimum per step at peak, PERF.md), so int8 convolution is the
only route past ~3.9× real-time on a single chip.

Scheme (standard post-training symmetric quantization):
- weights: per-output-channel scales s_w[c] = max|w[..., c]| / 127,
  computed at apply time from the bf16 params (checkpoints stay bf16 and
  fully interchangeable with the bf16 path);
- activations: dynamic per-tensor scale s_x = max|x| / 127 (one fused
  reduce over the conv input — the producer fusion already streams it);
- y = conv_int8(x_q, w_q) · (s_x · s_w[c]) + b, accumulated in int32,
  rescaled in fp32, returned in the input dtype.

Zero-size guards make zero-initialized kernels (the ResBlock out_conv)
exact: scale 0 → quantized zeros → exact zero output.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QTensor(NamedTuple):
    """A pre-quantized activation: int8 values + the fp32 per-tensor scale.

    Produced by fused producer epilogues (e.g. the UNet's GN+SiLU+quant
    chain) so the consuming conv skips its own dynamic-quantization passes
    over HBM — the whole normalize→activate→quantize chain fuses into one
    elementwise kernel whose OUTPUT is already int8 (¼ the write traffic)."""

    q: jax.Array  # int8
    scale: jax.Array  # f32 scalar


def symmetric_scales(w: jax.Array, axis) -> jax.Array:
    """max|w| / 127 over all axes except ``axis`` (kept). Zero-max guards
    to 1 so x/s is well-defined (the values are all zero anyway)."""
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis)
    m = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes)
    return jnp.where(m > 0, m / 127.0, 1.0)


def quantize_int8(x: jax.Array, scale: jax.Array) -> jax.Array:
    """round(x / scale) clipped to int8; scale broadcasts."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def quant_conv2d(
    x: jax.Array | QTensor,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    strides=(1, 1),
    padding="SAME",
    out_dtype=None,
    in_layout: str = "NHWC",
    out_layout: str = "NHWC",
    w_q: jax.Array | None = None,
    s_w: jax.Array | None = None,
    algo: str = "conv",
) -> jax.Array:
    """int8×int8 convolution (HWIO kernel) with fp32 rescale.

    Drop-in for the bf16 ``nn.Conv`` apply: same operands, same output
    dtype as ``x``; quantization error ~0.5% relative (gated in
    tests/test_quant.py and by the int8-vs-bf16 restore LSD in PERF.md).
    ``x`` may be a :class:`QTensor` from a fused producer epilogue, in
    which case the dynamic-quantization passes are skipped entirely.

    ``in_layout``/``out_layout`` let boundary convs read/write
    channels-first directly — the A2SB UNet's 3-channel input/output in
    NHWC puts C=3 on the 128-lane axis and TPU tiling pads it ~42×; the
    NCHW spec makes XLA produce the exactly-tiled layout instead.
    """
    if isinstance(x, QTensor):
        x_q, s_x = x.q, x.scale
        in_dtype = out_dtype or jnp.bfloat16
    else:
        in_dtype = out_dtype or x.dtype
        s_x = jnp.max(jnp.abs(x.astype(jnp.float32)))
        s_x = jnp.where(s_x > 0, s_x / 127.0, 1.0)
        x_q = quantize_int8(x, s_x)

    if w_q is None:
        # dynamic weight quantization. NOTE: when the params are jit
        # ARGUMENTS (not compile-time constants) this re-runs per model
        # call — XLA does not hoist it out of the sampling scan past the
        # layout barriers (measured 6% of the restore step). Production
        # inference pre-quantizes at load time via
        # ``models.a2sb.unet.prequantize_unet`` (one mutable forward that
        # materializes the ``qweights`` collection, including the derived
        # UpsampleConv2x/SmallCoutConv3x3 forms) and QConv reads
        # (w_q, s_w) from that collection instead of reaching this branch.
        s_w = symmetric_scales(kernel, axis=3)  # per output channel [Cout]
        w_q = quantize_int8(kernel, s_w[None, None, None, :])

    if algo == "tap_gemm":
        # nine shifted [M, C]×[C, O] GEMMs accumulated in int32 — exactly
        # the conv's math (the int32 tap sum commutes with the per-channel
        # rescale), but lowered as plain dots. Measured 1.48× faster than
        # XLA's int8 conv at the UNet's level-4 ResBlock shape
        # ([8, 64, 16, 1024]: 83 → 123 TFLOP/s); SLOWER at the mid/L3
        # shapes, so selection is per-level (AttnUNetF.tap_gemm_levels).
        assert in_layout == out_layout == "NHWC"
        assert strides == (1, 1) and kernel.shape[:2] == (3, 3)
        # the shifted-slice accumulation below hardcodes pad=1 on both
        # spatial axes; any other padding request must not be silently
        # remapped to it.
        assert padding in ("SAME", ((1, 1), (1, 1))), padding
        b, h, w, c = x_q.shape
        o = w_q.shape[-1]
        xp = jnp.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for dy in range(3):
            for dx in range(3):
                sl = jax.lax.slice(
                    xp, (0, dy, dx, 0), (b, dy + h, dx + w, c)
                )
                d = jax.lax.dot_general(
                    sl.reshape(-1, c), w_q[dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                acc = d if acc is None else acc + d
        y = acc.reshape(b, h, w, o)
        c_axis = 3
    else:
        dn = jax.lax.conv_dimension_numbers(
            x_q.shape, kernel.shape, (in_layout, "HWIO", out_layout)
        )
        y = jax.lax.conv_general_dilated(
            x_q,
            w_q,
            strides,
            padding,
            dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        c_axis = out_layout.index("C")
    bshape = [1] * 4
    bshape[c_axis] = s_w.shape[0]
    y = y.astype(jnp.float32) * (s_x * s_w.reshape(bshape))
    if bias is not None:
        y = y + bias.astype(jnp.float32).reshape(bshape)
    return y.astype(in_dtype)


