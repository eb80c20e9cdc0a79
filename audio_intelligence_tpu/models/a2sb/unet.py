"""AttnUNetF — the A2SB restoration UNet, TPU-native flax implementation.

Capability parity with the reference network (A2SB/networks.py:188-322):
5-level 2-D UNet over (mag, cosθ, sinθ) spectrograms with scale-shift
GroupNorm conditioning on the timestep embedding + sinusoidal frequency-band
embeddings, and full self-attention with 2-D axial 'pixel' rotary position
embeddings at the deep levels + middle. Flagship config:
hidden [128, 256, 512, 768, 1024, 2048], attention at levels {3, 4},
band_embedding_dim 16, 8 heads (A2SB/configs/pretrain.yaml:47-61).

TPU-first design choices (not a translation):

- NHWC layout (XLA's native conv layout on TPU; the reference is NCHW).
- The reference materializes the conditioning as a B×E×H×W map (timestep
  embedding broadcast per-pixel, band embeddings concatenated) and runs a
  1×1 conv per ResBlock. Because that conv is linear and the map is the
  concatenation of an H-only-varying part and a batch-only-varying part,
  we compute the two matmuls separately and broadcast-add:
  scale_shift[b, h, c] = silu(t_emb[b]) · W_t + silu(band_emb[h]) · W_band
  + bias — algebraically identical, but O(B·E + H·E) instead of O(B·E·H·W)
  memory traffic.
- Attention is one fused dot-product attention over H·W tokens (einsum →
  MXU); axial rotary angle tables are computed host-side per static shape.
- GroupNorm statistics in fp32 regardless of activation dtype
  (GroupNorm32 semantics, A2SB/networks.py:25-27).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from audio_intelligence_tpu.ops.rotary import axial_pixel_freqs_np, apply_rotary
from audio_intelligence_tpu.ops.quant import quant_conv2d


def _maybe_prequant(mod: nn.Module, make):
    """Read-or-create this module's load-time-quantized weights.

    Inference passes a ``qweights`` collection (see ``prequantize_unet``)
    so the per-call dynamic weight quantization — a full pass over all
    conv weights per sampling step once params are jit arguments rather
    than baked constants — happens ONCE at load time. Returns the entry
    dict, or None on the plain dynamic path (training / no collection).
    """
    if mod.is_initializing():
        return None
    if mod.has_variable("qweights", "q") or mod.is_mutable_collection("qweights"):
        return mod.variable("qweights", "q", make).value
    return None


def prequantize_unet(model, variables, example_x, example_t_emb):
    """Materialize the ``qweights`` collection with one mutable forward
    (cheap example shapes are fine — only weight shapes matter). Returns
    variables extended with the collection; pass them to ``apply`` on the
    int8 path to skip per-step weight quantization."""
    _, mut = model.apply(
        variables, example_x, example_t_emb, mutable=["qweights"]
    )
    return {**variables, "qweights": mut["qweights"]}


class QConv(nn.Module):
    """nn.Conv-compatible 2-D conv with an int8 fast path.

    Parameter names/shapes ("kernel" HWIO, "bias") match ``nn.Conv`` so
    bf16 checkpoints are interchangeable between impls. impl="int8" runs
    the symmetric-quantized MXU path (ops/quant.py) — v5e executes int8
    at 2× bf16 throughput, which is the difference between the ~3.9×
    real-time bf16 roofline and the ≥5× target on the restore bench.
    """

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: int | str | tuple = 1
    use_bias: bool = True
    kernel_init: any = nn.initializers.lecun_normal()
    bias_init: any = nn.initializers.zeros
    impl: str = "bf16"
    # conv I/O layouts ("NHWC"/"NCHW"): boundary convs with C=3 read/write
    # channels-first to avoid the ~42× lane padding of a 3-wide minor axis
    in_layout: str = "NHWC"
    out_layout: str = "NHWC"
    # int8 3×3 stride-1 only: run the pallas conv whose epilogue also
    # emits the NEXT GroupNorm's (Σ, Σ²) — returns (y, (sums, sums_sq));
    # an optional ``residual`` call arg is added before the stats (the
    # ResBlock skip), see ops/pallas_conv.py
    with_stats: bool = False
    # int8 only: lower the 3×3 conv as nine shifted GEMMs (exact same
    # int32 math; faster than XLA's conv lowering at small-spatial /
    # large-channel shapes — see ops/quant.py tap_gemm)
    algo: str = "conv"

    @nn.compact
    def __call__(self, x, residual=None):
        from audio_intelligence_tpu.ops.quant import QTensor

        values = x.q if isinstance(x, QTensor) else x
        kh, kw = self.kernel_size
        c_in = values.shape[self.in_layout.index("C")]
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, c_in, self.features)
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,))
            if self.use_bias
            else None
        )
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        if self.with_stats:
            from audio_intelligence_tpu.ops.pallas_conv import (
                conv3x3_int8_stats,
            )
            from audio_intelligence_tpu.ops.quant import quantize_int8

            assert self.impl == "int8" and (kh, kw) == (3, 3)
            assert self.strides == (1, 1) and pad == ((1, 1), (1, 1))
            if isinstance(x, QTensor):
                x_q, s_x = x.q, x.scale
            else:
                s_x = jnp.max(jnp.abs(values.astype(jnp.float32)))
                s_x = jnp.where(s_x > 0, s_x / 127.0, 1.0)
                x_q = quantize_int8(values, s_x)
            y, sums, sums_sq = conv3x3_int8_stats(
                x_q, s_x, kernel.astype(jnp.bfloat16), bias,
                residual=residual,
                interpret=jax.default_backend() == "cpu",
            )
            return y, (sums, sums_sq)
        assert residual is None
        if self.impl == "int8":
            from audio_intelligence_tpu.ops.quant import (
                quantize_int8,
                symmetric_scales,
            )

            def _make_q():
                s = symmetric_scales(kernel, axis=3)
                return {
                    "w_q": quantize_int8(kernel, s[None, None, None, :]),
                    "s_w": s,
                }

            q = _maybe_prequant(self, _make_q)
            wdtype = jnp.bfloat16 if isinstance(x, QTensor) else x.dtype
            return quant_conv2d(
                x, kernel.astype(wdtype), bias, self.strides, pad,
                in_layout=self.in_layout, out_layout=self.out_layout,
                w_q=None if q is None else q["w_q"],
                s_w=None if q is None else q["s_w"],
                algo=self.algo,
            )
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, (self.in_layout, "HWIO", self.out_layout)
        )
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), self.strides, pad, dimension_numbers=dn
        )
        if bias is not None:
            bshape = [1] * 4
            bshape[self.out_layout.index("C")] = self.features
            y = y + bias.astype(y.dtype).reshape(bshape)
        return y


class UpsampleConv2x(nn.Module):
    """Nearest-×2 upsample + 3×3 conv, computed as 4 phase convs on the
    LOW-RES input (the sub-pixel identity).

    For nearest-repeat upsampling, out[2i+p] = Σ_t w[t]·x_up[2i+p+t-1]
    touches only two source pixels per axis with phase-summed weights:
        phase 0: x[i-1]·w0 + x[i]·(w1+w2)
        phase 1: x[i]·(w0+w1) + x[i+1]·w2
    so the 3×3-over-upsampled conv is exactly 4 convs with 2×2 combined
    kernels over the original map — 4/9 the MACs and no ×4-upsampled
    activation in HBM (the A2SB decoder's up convs are ~4.2 TFLOP/step of
    the restore bench; this reorganization saves ~2.3 TFLOP + ~1 GB of
    int8 traffic per step). Parameter names/shapes match the plain
    upsample+``QConv`` ("kernel" [3,3,Cin,Cout] HWIO, "bias") so
    checkpoints interchange; bf16 output is bit-identical to
    repeat→conv, int8 within quantization tolerance.
    """

    features: int
    impl: str = "bf16"
    kernel_init: any = nn.initializers.lecun_normal()
    bias_init: any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        from audio_intelligence_tpu.ops.quant import (
            QTensor,
            quantize_int8,
            symmetric_scales,
        )

        values = x.q if isinstance(x, QTensor) else x
        c = values.shape[-1]
        o = self.features
        kernel = self.param("kernel", self.kernel_init, (3, 3, c, o))
        bias = self.param("bias", self.bias_init, (o,))

        # single input-dilated conv: nearest-×2 = zero-insert ⊛ [1,1], so
        # upsample→conv(w) ≡ conv(lhs_dilation=2, w ⊛ [1,1]) with the 4-tap
        # per-axis kernel [w0, w0+w1, w1+w2, w2] and SAME padding (2,2).
        # XLA phase-decomposes the dilation internally (no zero math) and
        # writes the interleaved output directly — numerically identical
        # to repeat→conv (verified to 2e-6) with no explicit interleave.
        def axis_eff(k, axis):
            w0, w1, w2 = jnp.split(k, 3, axis=axis)
            return jnp.concatenate([w0, w0 + w1, w1 + w2, w2], axis=axis)

        w_eff = axis_eff(axis_eff(kernel, 0), 1)  # [4, 4, C, O]
        pad = ((2, 2), (2, 2))

        if self.impl == "int8":
            if isinstance(x, QTensor):
                x_q, s_x = x.q, x.scale
            else:
                s_x = jnp.max(jnp.abs(values.astype(jnp.float32)))
                s_x = jnp.where(s_x > 0, s_x / 127.0, 1.0)
                x_q = quantize_int8(values, s_x)

            def _make_q():
                s = symmetric_scales(w_eff, axis=3)
                return {
                    "w_q": quantize_int8(w_eff, s[None, None, None, :]),
                    "s_w": s,
                }

            q = _maybe_prequant(self, _make_q)
            if q is None:
                q = _make_q()
            w_q, s_w = q["w_q"], q["s_w"]
            dn = jax.lax.conv_dimension_numbers(
                x_q.shape, w_q.shape, ("NHWC", "HWIO", "NHWC")
            )
            y = jax.lax.conv_general_dilated(
                x_q, w_q, (1, 1), pad, lhs_dilation=(2, 2),
                dimension_numbers=dn, preferred_element_type=jnp.int32,
            )
            y = y.astype(jnp.float32) * (s_x * s_w)[None, None, None, :]
            return (y + bias.astype(jnp.float32)).astype(jnp.bfloat16)

        dn = jax.lax.conv_dimension_numbers(
            values.shape, w_eff.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            values, w_eff.astype(values.dtype), (1, 1), pad,
            lhs_dilation=(2, 2), dimension_numbers=dn,
        )
        return y + bias.astype(y.dtype)


class SmallCoutConv3x3(nn.Module):
    """3×3 conv with a TINY output-channel count (the UNet's 3-channel
    output projection), computed as one tap-factored matmul + 9 shifted
    adds instead of a conv.

    A direct conv with C_out=3 pads the MXU's 128-wide N dimension ~43×
    (profiled at 6.6 ms/step on the restore bench). Factoring per tap:
        partial[b, (tap, o), y, x] = Σ_c x[b, y, x, c] · W[tap, c, o]
        out[b, o, y, x] = Σ_{dy,dx} partial[b, (dy·3+dx, o), y+dy-1, x+dx-1]
    makes the contraction a [·, C]×[C, 9·O] matmul (N = 27 for O = 3 —
    ~5× better MXU packing) and turns the taps into cheap shifted slices.
    Parameter names/shapes match ``QConv``/``nn.Conv`` ("kernel" HWIO,
    "bias") so checkpoints interchange. Input NHWC (plain or QTensor),
    output CHANNELS-FIRST [B, O, H, W].
    """

    features: int
    impl: str = "bf16"
    kernel_init: any = nn.initializers.lecun_normal()
    bias_init: any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        from audio_intelligence_tpu.ops.quant import (
            QTensor,
            quantize_int8,
            symmetric_scales,
        )

        values = x.q if isinstance(x, QTensor) else x
        b, hh, ww, c = values.shape
        o = self.features
        kernel = self.param("kernel", self.kernel_init, (3, 3, c, o))
        bias = self.param("bias", self.bias_init, (o,))

        # [3, 3, C, O] → [C, 9·O], tap-major columns t = (dy·3+dx)·O + o
        w_cols = jnp.transpose(kernel, (2, 0, 1, 3)).reshape(c, 9 * o)

        if self.impl == "int8":
            if isinstance(x, QTensor):
                x_q, s_x = x.q, x.scale
            else:
                s_x = jnp.max(jnp.abs(values.astype(jnp.float32)))
                s_x = jnp.where(s_x > 0, s_x / 127.0, 1.0)
                x_q = quantize_int8(values, s_x)

            def _make_q():
                s9 = jnp.tile(symmetric_scales(kernel, axis=3), 9)  # per o
                return {"w_q": quantize_int8(w_cols, s9[None, :]), "s_w9": s9}

            q = _maybe_prequant(self, _make_q)
            if q is None:
                q = _make_q()
            w_q, s_w9 = q["w_q"], q["s_w9"]
            partial = jnp.einsum(
                "bhwc,ct->bthw", x_q, w_q,
                preferred_element_type=jnp.int32,
            )
            partial = (
                partial.astype(jnp.float32)
                * (s_x * s_w9)[None, :, None, None]
            ).astype(jnp.bfloat16)
        else:
            partial = jnp.einsum(
                "bhwc,ct->bthw", values, w_cols.astype(values.dtype)
            )

        padded = jnp.pad(partial, ((0, 0), (0, 0), (1, 1), (1, 1)))
        out = None
        for dy in range(3):
            for dx in range(3):
                t0 = (dy * 3 + dx) * o
                piece = jax.lax.slice(
                    padded,
                    (0, t0, dy, dx),
                    (b, t0 + o, dy + hh, dx + ww),
                )
                out = piece if out is None else out + piece
        out = out.astype(jnp.float32) + bias.astype(jnp.float32)[None, :, None, None]
        dtype = jnp.bfloat16 if isinstance(x, QTensor) else values.dtype
        return out.astype(dtype)


def sinusoidal_temporal_embedding(
    t: jax.Array, n_channels: int = 128, min_freq: float = 0.5, max_freq: float = 16.0
) -> jax.Array:
    """t [B] in [0,1] → [B, n_channels] (sin‖cos over linspaced multipliers).

    Matches ``SinusoidalTemporalEmbedding(n_bands=n_channels//2, min_freq=0.5)``
    (A2SB/networks.py:455-471, A2SB_lightning_module.py:223).
    """
    n_bands = n_channels // 2
    mult = jnp.linspace(min_freq, max_freq, n_bands, dtype=t.dtype)
    angles = t[:, None] * mult[None, :]
    return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)


def band_embedding(n_bands: int, dim: int) -> jax.Array:
    """Sinusoidal frequency-band embeddings [n_bands, dim].

    Matches ``AttnUNetF.get_band_embeddings`` (A2SB/networks.py:275-286):
    angle(f, h) = (f+1)·h·2·3.14/(3·n_bands), cos rows then sin rows.
    (The reference uses the literal 3.14 — kept for checkpoint parity.)
    """
    coords = np.arange(n_bands, dtype=np.float32)
    freqs = np.arange(dim // 2, dtype=np.float32) + 1.0
    ang = freqs[:, None] * coords[None, :] * 2.0 * 3.14 / (3.0 * n_bands)
    emb = np.concatenate([np.cos(ang), np.sin(ang)], axis=0)  # [dim, n_bands]
    return jnp.asarray(emb.T)  # [n_bands, dim]


class GroupNorm32(nn.Module):
    """GroupNorm(32 groups) with fp32 statistics (GroupNorm32 semantics,
    A2SB/networks.py:25-27).

    TPU note: statistics are accumulated in fp32 (the converts fuse into
    the reductions), then the whole normalize+affine folds into ONE
    input-dtype multiply-add ``x·eff_scale + eff_bias`` with per-(batch,
    group/channel) coefficients. A naive ``(x.astype(f32)−mean)·inv``
    makes XLA materialize full fp32 copies of the feature map in HBM
    (profiled at ~60 % of the A2SB UNet step, PERF.md); the folded form
    keeps every full-size tensor in the input dtype. Variance uses the
    one-pass E[x²]−E[x]² form — fp32 accumulation keeps the cancellation
    error far below bf16 resolution."""

    num_groups: int = 32
    # analytic |standardized x| bound for the fused silu_quant epilogue:
    # E[max of ~16M gaussians] ≈ 4.1σ, so 5σ clips ~nothing while keeping
    # the int8 grid ~1.6× finer than a worst-case 8σ bound
    k_sigma: float = 5.0

    @nn.compact
    def __call__(self, x, cond=None, silu_quant: bool = False, stats=None,
                 quant_only: bool = False):
        """Normalize; optionally apply conditioning ``cond=(scale, shift)``
        (the ResBlock's scale-shift, broadcastable to x) and, with
        ``silu_quant=True``, fuse SiLU + int8 quantization into the same
        elementwise pass and return a ``QTensor``. ``quant_only=True``
        quantizes WITHOUT the SiLU (the attention input norm feeding int8
        q/k/v projections) — same analytic scale bound, no activation.

        ``stats=(Σx, Σx²)`` ([B, C] fp32 each) skips the statistics
        reduction entirely — the producing conv's epilogue already
        computed them (QConv ``with_stats``/ops.pallas_conv), saving a
        full-map read per GroupNorm.

        The quantization scale is ANALYTIC — from (γ, β, cond) only, never
        from the data: post-GN activations are standardized, so
        |y| ≤ k_sigma·|γ·(1+s_c)| + |β·(1+s_c) + t_c| elementwise. That
        removes the dynamic-absmax pass over the full feature map that a
        data-dependent scale forces (ops/quant.py quant_conv2d), leaving
        one fused kernel that reads x in bf16 and writes int8 (¼ traffic).

        ``x`` may itself be a :class:`QTensor` (the int8 residual stream,
        ``AttnUNetF(residual_int8=True)``): the input scale folds into the
        per-(batch, channel) normalize coefficients, so the pass reads
        int8 — half the bytes of the bf16 stream.
        """
        from audio_intelligence_tpu.ops.quant import QTensor

        is_q = isinstance(x, QTensor)
        if is_q:
            vals, s_in = x.q, x.scale
            dtype = jnp.bfloat16
        else:
            vals, s_in = x, None
            dtype = x.dtype
        c = vals.shape[-1]
        b = vals.shape[0]
        groups = min(self.num_groups, c)
        cg = c // groups
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        # Σx / Σx² per (batch, channel) as plain reductions: these fuse
        # into the producing conv's epilogue (one shared read), unlike the
        # round-1 MXU-dot formulation, which forced a reshape + a
        # layout-converted copy of the whole map on the conv-chosen
        # {3,0,2,1} layouts (profiled at ~22 ms/step total, round 2).
        n_rows = 1
        for d in vals.shape[1:-1]:
            n_rows *= d
        if stats is not None:
            sums, sums_sq = stats
        else:
            x32 = vals.astype(jnp.float32)
            spatial_axes = tuple(range(1, vals.ndim - 1))
            sums = jnp.sum(x32, axis=spatial_axes)  # [B, C]
            sums_sq = jnp.sum(x32 * x32, axis=spatial_axes)
            if is_q:
                sums = sums * s_in
                sums_sq = sums_sq * (s_in * s_in)
        n = n_rows * cg
        mean = sums.reshape(b, groups, cg).sum(-1) / n  # [B, groups]
        mean_sq = sums_sq.reshape(b, groups, cg).sum(-1) / n
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + 1e-5)

        inv_c = jnp.repeat(inv, cg, axis=-1)  # [B, C]
        mean_c = jnp.repeat(mean, cg, axis=-1)
        scale32 = scale.astype(jnp.float32)[None, :]
        eff_scale32 = inv_c * scale32
        eff_bias = (
            bias.astype(jnp.float32)[None, :] - mean_c * eff_scale32
        ).astype(dtype)
        if is_q:
            # fold the int8 stream's scale into the normalize coefficient:
            # y = q·(s_in·eff_scale) + eff_bias — still one multiply-add,
            # but the map read is int8
            eff_scale = (eff_scale32 * s_in).astype(dtype)
        else:
            eff_scale = eff_scale32.astype(dtype)
        bshape = (b,) + (1,) * (vals.ndim - 2) + (c,)
        y = (
            vals.astype(dtype) * eff_scale.reshape(bshape)
            + eff_bias.reshape(bshape)
        )

        if cond is not None:
            c_scale, c_shift = cond
            y = y * (1 + c_scale).astype(dtype) + c_shift.astype(dtype)
        if not (silu_quant or quant_only):
            return y

        from audio_intelligence_tpu.ops.quant import QTensor

        # analytic per-tensor scale from params + conditioning (tiny
        # reductions; never touches the feature map)
        g32 = scale.astype(jnp.float32)
        b32 = bias.astype(jnp.float32)
        if cond is not None:
            cs = c_scale.astype(jnp.float32)
            ct = c_shift.astype(jnp.float32)
            a_mag = jnp.abs(g32 * (1 + cs))
            b_mag = jnp.abs(b32 * (1 + cs) + ct)
            amax = jnp.max(self.k_sigma * a_mag + b_mag)
        else:
            amax = jnp.max(self.k_sigma * jnp.abs(g32) + jnp.abs(b32))
        # silu's negative lobe bottoms out at −0.2785; amax 0 (zero γ, β)
        # still quantizes exactly because silu(0) = 0
        s_x = jnp.maximum(amax, 0.2785) / 127.0
        act = y.astype(jnp.float32)
        if not quant_only:
            act = jax.nn.silu(act)
        q = jnp.clip(jnp.round(act / s_x), -127, 127).astype(jnp.int8)
        return QTensor(q, s_x)


class ScaleShiftEmbed(nn.Module):
    """The ResBlock conditioning projection, computed separably.

    Produces scale/shift [B, H, 1, 2·out_channels] from the timestep
    embedding [B, E_t] and band embeddings [H, E_b]. Parameter layout is one
    (E_b + E_t) → 2C kernel (band rows first, matching the reference's
    concat order ``cat((band_emb, emb), 1)`` at A2SB/networks.py:292-295)
    so reference 1×1-conv weights convert directly.
    """

    out_channels: int
    band_dim: int

    @nn.compact
    def __call__(self, t_emb: jax.Array, band_emb: jax.Array | None):
        e_b = self.band_dim
        e_t = t_emb.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (e_b + e_t, 2 * self.out_channels),
        )
        bias = self.param("bias", nn.initializers.zeros, (2 * self.out_channels,))
        out = jax.nn.silu(t_emb) @ kernel[e_b:] + bias  # [B, 2C]
        out = out[:, None, None, :]  # [B, 1, 1, 2C]
        if e_b > 0:
            band_part = jax.nn.silu(band_emb) @ kernel[:e_b]  # [H, 2C]
            out = out + band_part[None, :, None, :]  # [B, H, 1, 2C]
        return out


class ResBlock(nn.Module):
    """Scale-shift-norm residual block (A2SB/networks.py:79-123), NHWC."""

    channels: int
    band_dim: int
    p_dropout: float = 0.1
    conv_impl: str = "bf16"
    conv_algo: str = "conv"

    @nn.compact
    def __call__(self, x, t_emb, band_emb, deterministic: bool = True,
                 stats_in=None, stats_mode: bool = False,
                 plain_out_conv: bool = False, qres_mode: bool = False,
                 emit_q_out: bool = False):
        # int8 + no dropout (inference): fuse GN→SiLU→quantize into one
        # pass with the analytic scale, feeding QTensors straight into the
        # convs (the restore bench path). Training/bf16 keeps the exact
        # reference dataflow.
        #
        # stats_mode (int8 only): the convs run the pallas stats-epilogue
        # kernel, the GroupNorms consume producer-computed (Σ, Σ²), and
        # the call returns ``(out, stats_of_out)`` so the NEXT ResBlock's
        # first GroupNorm also skips its statistics read. The LAST block
        # before a non-elementwise consumer (down conv) sets
        # ``plain_out_conv`` to avoid a pallas/XLA layout seam.
        #
        # qres_mode (int8 only): the RESIDUAL STREAM carries int8 with a
        # tracked per-tensor scale — x may be a QTensor, and the block
        # returns ``(QTensor x_next, (Σ, Σ²) of x_next)``. The residual
        # add reads int8 + bf16 and writes int8 (the bf16 stream's
        # biggest bandwidth item on L0-L2, PERF.md round 3), its scale
        # bound is ``amax(x) + amax(h)`` with both absmax reductions
        # fused into the producing convs' epilogues (no extra passes),
        # and the emitted stats let the NEXT GroupNorm skip its
        # statistics read. Accuracy is gated in tests/test_quant.py
        # (whole-UNet rel err vs bf16) and the e2e LSD gate.
        fused = self.conv_impl == "int8" and (
            deterministic or self.p_dropout == 0.0
        )
        in_norm = GroupNorm32()
        in_conv = QConv(self.channels, (3, 3), padding=1, impl=self.conv_impl,
                        with_stats=stats_mode and fused,
                        algo=self.conv_algo, name="in_conv")
        ss = ScaleShiftEmbed(self.channels, self.band_dim, name="emb_proj")(
            t_emb, band_emb
        )
        scale, shift = jnp.split(ss, 2, axis=-1)
        out_norm = GroupNorm32(name="out_norm")
        out_conv = QConv(
            self.channels,
            (3, 3),
            padding=1,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            impl=self.conv_impl,
            with_stats=stats_mode and fused and not plain_out_conv,
            algo=self.conv_algo,
            name="out_conv",
        )
        if fused and qres_mode:
            from audio_intelligence_tpu.ops.quant import QTensor

            h = in_conv(in_norm(x, silu_quant=True, stats=stats_in))
            h_q = out_norm(h, cond=(scale, shift), silu_quant=True)
            hp = out_conv(h_q)  # bf16 conv output (pre-residual)
            # amax(h) fuses into out_conv's output fusion (the same
            # multi-output pattern XLA uses for the GN stats); amax(x)
            # comes from the carried scale — no map read
            amax_h = jnp.max(jnp.abs(hp.astype(jnp.float32)))
            if isinstance(x, QTensor):
                amax_x = x.scale * 127.0
                x32 = x.q.astype(jnp.float32) * x.scale
            else:
                amax_x = jnp.max(jnp.abs(x.astype(jnp.float32)))
                x32 = x.astype(jnp.float32)
            bound = amax_x + amax_h  # ≥ max|x + h| (≤1 bit loose)
            s_next = jnp.where(bound > 0, bound / 127.0, 1.0)
            xn = x32 + hp.astype(jnp.float32)
            q_next = jnp.clip(jnp.round(xn / s_next), -127, 127).astype(jnp.int8)
            # the NEXT GroupNorm's statistics, taken over the QUANTIZED
            # stream (exactly the values it will normalize — and the
            # reduce reads int8, not a recomputed f32 x+h: asking for
            # stats of xn here made XLA materialize standalone
            # multiply_reduce passes re-reading both operands, ~10 ms/step)
            q32 = q_next.astype(jnp.float32)
            spatial = tuple(range(1, q32.ndim - 1))
            st_out = (
                jnp.sum(q32, axis=spatial) * s_next,
                jnp.sum(q32 * q32, axis=spatial) * (s_next * s_next),
            )
            return QTensor(q_next, s_next), st_out
        if fused and stats_mode:
            h, st_h = in_conv(in_norm(x, silu_quant=True, stats=stats_in))
            h_q = out_norm(h, cond=(scale, shift), silu_quant=True, stats=st_h)
            if plain_out_conv:
                return x + out_conv(h_q), None
            out, st_out = out_conv(h_q, residual=x)
            return out, st_out
        if fused:
            h = in_conv(in_norm(x, silu_quant=True))
            hp = out_conv(out_norm(h, cond=(scale, shift), silu_quant=True))
            if emit_q_out:
                # level-edge int8 emission: the residual add writes int8
                # DIRECTLY for the consuming down/up conv, deleting that
                # conv's separate absmax + quantize passes over the full
                # map. Scale bound = amax(x) + amax(h) (≤1 bit loose);
                # both absmax reductions fuse into the producing fusions.
                from audio_intelligence_tpu.ops.quant import QTensor

                amax_h = jnp.max(jnp.abs(hp.astype(jnp.float32)))
                amax_x = jnp.max(jnp.abs(x.astype(jnp.float32)))
                bound = amax_x + amax_h
                s = jnp.where(bound > 0, bound / 127.0, 1.0)
                xn = x.astype(jnp.float32) + hp.astype(jnp.float32)
                q = jnp.clip(jnp.round(xn / s), -127, 127).astype(jnp.int8)
                return QTensor(q, s)
            return x + hp
        h = in_conv(jax.nn.silu(in_norm(x)))
        h = out_norm(h, cond=(scale, shift))
        h = jax.nn.silu(h)
        h = nn.Dropout(self.p_dropout, deterministic=deterministic)(h)
        return x + out_conv(h)


class RotaryAttention2d(nn.Module):
    """Full self-attention over H×W tokens with 2-D axial pixel rotary.

    Matches ``RotaryAttentionPool2d`` (A2SB/networks.py:394-452): optional
    GroupNorm32 on the input, 1×1 q/k/v projections, rotary over the first
    2·rotary_dim head features, *no* output projection, output replaces the
    input (non-residual; the caller's sequential applies it after a
    ResBlock).
    """

    num_heads: int = 8
    rotary_dim: int = 32
    max_freq: float = 64.0
    use_input_norm: bool = True
    use_flash: bool = False
    # int8 QK/PV dots (2× MXU rate; ~1% rel error) — the quantized path
    qk_int8: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        if self.qk_int8:
            # int8 projections (2× MXU rate): the input norm quantizes in
            # its own epilogue (analytic scale, no SiLU) so all three
            # projections share one int8 input read. Error budget ~0.5%
            # on top of the kernel's ~1% logit quantization (LSD-gated
            # e2e). Parameter trees match nn.Conv, so checkpoints and the
            # bf16 path interchange.
            if self.use_input_norm:
                x = GroupNorm32(name="gnorm")(x, quant_only=True)
            proj = lambda name: QConv(
                c, (1, 1), padding=0, impl="int8", name=name
            )
            q = proj("q_proj")(x)
            k = proj("k_proj")(x)
            v = proj("v_proj")(x)
        else:
            if self.use_input_norm:
                x = GroupNorm32(name="gnorm")(x)
            q = nn.Conv(c, (1, 1), name="q_proj")(x)
            k = nn.Conv(c, (1, 1), name="k_proj")(x)
            v = nn.Conv(c, (1, 1), name="v_proj")(x)

        head_dim = c // self.num_heads
        # (A flat-map rotary via full-channel cos/sin masks feeding a
        # channel-major-head kernel was tried in r4 and measured SLOWER
        # (4.63× vs 4.78× headline) — Mosaic rejects head-sliced blocks
        # (lane blocks must be 128-divisible; mid-dim vector reshapes are
        # "unsupported shape cast"), so the transposes remain and the
        # full-width rotary costs more than this per-head form.)
        # [B, H, W, heads, hd] — note the reference splits channels as
        # (heads, head_dim) in channel-major order.
        def split_heads(t):
            t = t.reshape(b, h, w, self.num_heads, head_dim)
            return jnp.transpose(t, (0, 3, 1, 2, 4))  # [B, heads, H, W, hd]

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        angles = jnp.asarray(
            axial_pixel_freqs_np(h, w, self.rotary_dim, self.max_freq), dtype=q.dtype
        )
        q = apply_rotary(q, angles)
        k = apply_rotary(k, angles)

        q = q.reshape(b, self.num_heads, h * w, head_dim)
        k = k.reshape(b, self.num_heads, h * w, head_dim)
        v = v.reshape(b, self.num_heads, h * w, head_dim)

        if self.use_flash and (h * w) % 256 == 0 and head_dim % 32 == 0:
            # full-K-in-VMEM pallas kernel: 7.2 ms vs XLA's 10.1 ms at the
            # level-3 [8·8, 4096, 96] blocks (PERF.md round 2); falls back
            # to the streaming flash kernel for longer sequences
            from audio_intelligence_tpu.ops.pallas_attention import (
                fullkv_attention,
                fullkv_attention_q8,
            )

            attn = fullkv_attention_q8 if self.qk_int8 else fullkv_attention
            out = attn(q, k, v, block_q=256)
        else:
            scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, q.dtype))
            # keep bf16 operands on the MXU, accumulate fp32
            logits = jnp.einsum(
                "bnqd,bnkd->bnqk", q * scale, k,
                preferred_element_type=jnp.float32,
            )
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            # AV in the value dtype: the MXU still accumulates fp32
            # internally and only rounds the OUTPUT — an f32 output would
            # double the HBM write of the [B, H, T, D] result for nothing
            # (profiled at 2×6.8 ms/step on the level-3 4096-token blocks)
            out = jnp.einsum("bnqk,bnkd->bnqd", probs, v)
        out = out.reshape(b, self.num_heads, h, w, head_dim)
        out = jnp.transpose(out, (0, 2, 3, 1, 4)).reshape(b, h, w, c)
        return out


class AttnUNetF(nn.Module):
    """The A2SB restoration UNet (see module docstring).

    Input  x: [B, H, W, C_in]  (H = freq bands, W = frames, C = 3)
    Input  t_emb: [B, emb_channels]
    Output [B, H, W, C_out]
    """

    n_updown_levels: int = 5
    in_channels: int = 3
    hidden_channels: Sequence[int] = (128, 256, 512, 768, 1024, 2048)
    out_channels: int = 3
    emb_channels: int = 128
    band_embedding_dim: int = 16
    attention_levels: Sequence[int] = (3, 4)
    n_attn_heads: int = 8
    num_res_blocks: int = 2
    use_attn_input_norm: bool = True
    p_dropout: float = 0.1
    rotary_dim: int = 32
    use_flash: bool = False
    # "bf16" (exact) or "int8" (2× MXU rate, ~0.5% relative quantization
    # error — the restore-bench fast path; attention stays bf16)
    conv_impl: str = "bf16"
    # "nhwc" (public default) or "nchw": accept [B, C, H, W] in/out via the
    # boundary convs' dimension_numbers. The bridge sampler carries its
    # state channels-first (C=3 on the lane axis pads ~42×); nchw IO lets
    # the model consume/produce that layout directly, deleting the padded
    # boundary transposes (profiled at ~7 ms/step total, PERF.md round 2)
    io_layout: str = "nhwc"
    # int8 only: ResBlock convs at attention-free levels run the pallas
    # stats-epilogue kernel so the GroupNorms skip their statistics reads
    stats_epilogue: bool = False
    # int8 only: carry the residual stream as int8 with tracked scales at
    # the attention-free levels (L0-L2, where the bf16 stream's
    # bandwidth dominates the restore step — PERF.md round 3/4). The
    # residual adds read int8+bf16, write int8, and emit the next
    # GroupNorm's (Σ, Σ²); scale bounds fuse into the conv epilogues.
    # Measured NET-NEGATIVE on v5e (+4 ms/step: the int8 elementwise
    # passes go VPU-compute-bound on (4,1) pack/unpack) — kept opt-in as
    # a documented negative result; see q_level_edges for the variant
    # that pays.
    residual_int8: bool = False
    # int8 only: the LAST residual add of each attention-free level
    # writes int8 directly (amax-bound scale fused into the producers),
    # so the consuming down/up conv skips its separate absmax + quantize
    # passes over the full map. GN reads stay bf16 (the part of
    # residual_int8 that measured as a loss).
    q_level_edges: bool = False
    # int8 only: levels whose ResBlock 3×3 convs lower as nine shifted
    # GEMMs instead of XLA's conv (exact same int32 math; 1.48× at the
    # level-4 small-spatial/large-channel shape — ops/quant.py tap_gemm)
    tap_gemm_levels: Sequence[int] = ()

    def _level_band_emb(self, n_bands, dtype):
        if self.band_embedding_dim == 0:
            return None
        # cast to the compute dtype: the fp32 table would otherwise promote
        # the scale/shift — and through it every ResBlock feature map — to
        # fp32, doubling HBM traffic (profiled, PERF.md)
        return band_embedding(n_bands, self.band_embedding_dim).astype(dtype)

    @nn.compact
    def __call__(self, x, t_emb, deterministic: bool = True):
        t_emb = t_emb.astype(x.dtype)
        hc = list(self.hidden_channels)
        if isinstance(self.hidden_channels, int):
            hc = [self.hidden_channels] * (self.n_updown_levels + 1)
        n = self.n_updown_levels
        attn = set(self.attention_levels)
        dec_attn = {n - 1 - a for a in attn}

        fused_inf = self.conv_impl == "int8" and (
            deterministic or self.p_dropout == 0.0
        )

        def block_stack(h, ch, use_attn, name, tap_gemm=False):
            """Returns h — an array, or a QTensor on the qres chain (its
            consumers QConv/UpsampleConv2x take QTensors directly)."""
            band_src = h.q if hasattr(h, "q") else h
            band = self._level_band_emb(band_src.shape[1], jnp.bfloat16
                                        if hasattr(h, "q") else h.dtype)
            # stats-epilogue chain: within an attention-free level the
            # ResBlock convs emit the next GroupNorm's (Σ, Σ²) from their
            # pallas epilogues, so no GN re-reads the map for statistics;
            # the level's last out_conv stays XLA (its consumer is the
            # down/up conv, which wants its own operand layout)
            stats_chain = (
                self.stats_epilogue
                and self.conv_impl == "int8"
                and not use_attn
            )
            # int8 residual stream: attention-free levels only (the
            # attention blocks' q/k/v projections and gnorm read bf16)
            qres_chain = (
                self.residual_int8 and fused_inf and not use_attn
                and not stats_chain
            )
            stats = None
            for i in range(self.num_res_blocks):
                rb = ResBlock(
                    ch, self.band_embedding_dim, self.p_dropout,
                    conv_impl=self.conv_impl,
                    conv_algo="tap_gemm" if tap_gemm else "conv",
                    name=f"{name}_res{i}"
                )
                edge_q = (
                    self.q_level_edges and fused_inf and not use_attn
                    and not qres_chain and not stats_chain
                    and i == self.num_res_blocks - 1
                )
                if edge_q:
                    h = rb(h, t_emb, band, deterministic, emit_q_out=True)
                elif qres_chain:
                    h, stats = rb(
                        h, t_emb, band, deterministic, stats_in=stats,
                        qres_mode=True,
                    )
                elif stats_chain:
                    h, stats = rb(
                        h, t_emb, band, deterministic, stats_in=stats,
                        stats_mode=True,
                        plain_out_conv=i == self.num_res_blocks - 1,
                    )
                else:
                    h = rb(h, t_emb, band, deterministic)
                if use_attn:
                    h = RotaryAttention2d(
                        num_heads=self.n_attn_heads,
                        rotary_dim=self.rotary_dim,
                        use_input_norm=self.use_attn_input_norm,
                        use_flash=self.use_flash,
                        qk_int8=self.conv_impl == "int8",
                        name=f"{name}_attn{i}",
                    )(h)
            return h

        in_spec = "NCHW" if self.io_layout == "nchw" else "NHWC"
        h = QConv(hc[0], (3, 3), padding=1, impl=self.conv_impl,
                  in_layout=in_spec, name="input_projection")(x)

        tap_set = set(self.tap_gemm_levels)
        skips = []
        for level in range(n):
            h = block_stack(h, hc[level], level in attn, f"enc{level}",
                            tap_gemm=level in tap_set)
            h = QConv(
                hc[level + 1], (3, 3), strides=(2, 2), padding=1,
                impl=self.conv_impl, name=f"down{level}"
            )(h)
            skips.append(h)

        # middle: res → attn → res at the deepest resolution
        band = self._level_band_emb(h.shape[1], h.dtype)
        h = ResBlock(hc[-1], self.band_embedding_dim, self.p_dropout,
                     conv_impl=self.conv_impl, name="mid_res0")(
            h, t_emb, band, deterministic
        )
        h = RotaryAttention2d(
            num_heads=self.n_attn_heads,
            rotary_dim=self.rotary_dim,
            use_input_norm=self.use_attn_input_norm,
            use_flash=self.use_flash,
            qk_int8=self.conv_impl == "int8",
            name="mid_attn",
        )(h)
        h = ResBlock(hc[-1], self.band_embedding_dim, self.p_dropout,
                     conv_impl=self.conv_impl, name="mid_res1")(
            h, t_emb, band, deterministic
        )

        for level in range(n):
            h = h + skips.pop()
            ch = hc[n - level]
            # dec level L runs at enc level (n − L)'s shape/channels
            h = block_stack(h, ch, level in dec_attn, f"dec{level}",
                            tap_gemm=(n - level) in tap_set)
            # nearest ×2 upsample + conv (A2SB/networks.py:126-155),
            # computed as 4 phase convs on the LOW-RES map (sub-pixel
            # identity, see UpsampleConv2x: 4/9 the MACs, no upsampled
            # activation in HBM). The barrier pins the producer's bf16
            # convert so XLA can't hoist f32 into the phase interleave.
            (h,) = jax.lax.optimization_barrier((h,))
            h = UpsampleConv2x(hc[n - level - 1], impl=self.conv_impl,
                               name=f"up{level}")(h)

        out_norm = GroupNorm32(name="out_norm")
        if self.io_layout == "nchw":
            # tap-factored matmul projection (see SmallCoutConv3x3):
            # channels-first output without the ~43× MXU N-padding of a
            # C_out=3 conv
            out_proj = SmallCoutConv3x3(self.out_channels,
                                        impl=self.conv_impl,
                                        name="output_projection")
        else:
            out_proj = QConv(self.out_channels, (3, 3), padding=1,
                             impl=self.conv_impl, name="output_projection")
        if self.conv_impl == "int8":
            return out_proj(out_norm(h, silu_quant=True))
        return out_proj(jax.nn.silu(out_norm(h)))
