"""Whole-level fused int8 ResBlock conv (Pallas TPU, HWBC layout).

The A2SB restore bench's attention-free levels spend most of their time in
the chain  GN-apply → SiLU → quantize → 3×3 int8 conv (→ +residual)
→ stats.  XLA lowers that as TWO full-map passes per conv: a standalone
elementwise pass that reads the bf16 map and writes the int8 map
(~1.2 ms per L0 instance on the restore bench), then the conv fusion that
re-reads the int8 map.  This kernel does the whole chain in ONE pass:

    y[, stats] = fused_gnq_conv3x3(x_bf16, eff_s, eff_b, inv_s, w, bias
                                   [, residual])

- the GN normalize/affine coefficients (eff_s, eff_b — per (batch,
  channel), computed OUTSIDE from producer-emitted Σ/Σ², see
  ``GroupNorm32``) and the analytic quantization scale ``inv_s = 1/s_x``
  are applied to each input tile in VMEM; the int8 map never touches HBM.
- implicit GEMM: 9 shifted [bh·wc·B, C]×[C, Cout] int8 MXU dots per
  (H-tile, W-chunk) grid step, weights VMEM-resident, int32
  accumulation, fp32 rescale by (s_x·s_w[c]), optional residual add (the
  ResBlock skip), bf16 output + per-(batch, channel) Σ/Σ² for the NEXT
  GroupNorm.
- halos by 9-spec halo exchange (center + 4 edges + 4 corners): a block
  spec whose block extent is 1 in a dim addresses an arbitrary
  element row/col there, so each grid step fetches exactly its
  (bh+2)×(wc+2) input footprint — reads are (1+2/bh)(1+2/wc)·map, and
  no full-W assembly buffer lives in VMEM (what capped the H-tile at 2
  rows in the earlier designs).

Layout: arrays are LOGICALLY [H, W, B, C] ("HWBC") so the default
{3,2,1,0} layout has the same byte order as the {3,0,2,1} physical layout
XLA picks for NHWC convs — pallas custom-calls (which only speak default
layouts) interleave with XLA convs with NO relayout copies, the seam that
killed every NHWC-side fusion attempt (PERF.md rounds 2-4).  With B = 8,
C a multiple of 128, each (b, c) slab is exactly one (8, 128) vreg tile.

Gated against the unfused reference chain in tests/test_pallas_conv.py;
driven e2e by ``AttnUNetF(level_layout="hwbc")`` (models/a2sb/unet.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(
    ctl_ref, xt_ref, ctr_ref, xl_ref, xc_ref, xr_ref, cbl_ref, xb_ref,
    cbr_ref, es_ref, eb_ref, inv_ref, w_ref, sc_ref, bias_ref, res_ref,
    o_ref, s_ref, s2_ref,
    *, bh: int, n_h: int, wc: int, n_wc: int, with_residual: bool,
    with_stats: bool, apply_silu: bool,
):
    j = pl.program_id(0)
    t = pl.program_id(1)
    # assemble the (bh+2, wc+2, B, C) halo footprint
    top = jnp.concatenate([ctl_ref[...], xt_ref[...], ctr_ref[...]], axis=1)
    mid = jnp.concatenate([xl_ref[...], xc_ref[...], xr_ref[...]], axis=1)
    bot = jnp.concatenate([cbl_ref[...], xb_ref[...], cbr_ref[...]], axis=1)
    xv = jnp.concatenate([top, mid, bot], axis=0)

    es = es_ref[...].astype(jnp.float32)[None, None]  # [1,1,B,C]
    eb = eb_ref[...].astype(jnp.float32)[None, None]
    b = xv.shape[2]
    c_out = w_ref.shape[2]

    # GN apply + SiLU + int8 quantize (halo ring recomputed:
    # (1+2/bh)(1+2/wc) VPU redundancy, no HBM traffic); int8 stays VMEM
    y = xv.astype(jnp.float32) * es + eb
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    q = jnp.clip(jnp.round(y * inv_ref[0, 0]), -127, 127).astype(jnp.int8)

    # SAME-padding semantics belong in q space: zeroing x instead would
    # be wrong — GN+SiLU map 0 → silu(eff_bias) ≠ 0
    row = jax.lax.broadcasted_iota(jnp.int32, (bh + 2, 1, 1, 1), 0)
    edge_row = jnp.logical_or(
        jnp.logical_and(row == 0, j == 0),
        jnp.logical_and(row == bh + 1, j == n_h - 1),
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (1, wc + 2, 1, 1), 1)
    edge_col = jnp.logical_or(
        jnp.logical_and(col == 0, t == 0),
        jnp.logical_and(col == wc + 1, t == n_wc - 1),
    )
    q = jnp.where(jnp.logical_or(edge_row, edge_col), 0, q)

    acc = jnp.zeros((bh * wc * b, c_out), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            a = q[dy : dy + bh, dx : dx + wc].reshape(bh * wc * b, -1)
            acc = acc + jax.lax.dot_general(
                a, w_ref[dy * 3 + dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    yt = acc.astype(jnp.float32) * sc_ref[0][None, :] + bias_ref[0][None, :]
    yt = yt.reshape(bh, wc, b, c_out)
    if with_residual:
        yt = yt + res_ref[...].astype(jnp.float32)
    o_ref[...] = yt.astype(o_ref.dtype)
    if with_stats:
        s = jnp.sum(yt, axis=(0, 1))
        s2 = jnp.sum(yt * yt, axis=(0, 1))

        @pl.when(jnp.logical_and(j == 0, t == 0))
        def _init():
            s_ref[...] = jnp.zeros_like(s_ref)
            s2_ref[...] = jnp.zeros_like(s2_ref)

        s_ref[...] += s
        s2_ref[...] += s2


def _pick_tiles(h: int, w: int, b: int, c: int, c_out: int,
                in_budget: int = 1 << 20, acc_budget: int = 1 << 20):
    """(bh, wc) — H-tile rows and W grid chunk: bf16 center block ≤
    ``in_budget`` (double-buffered) and int32 accumulator ≤
    ``acc_budget``; the f32 GN intermediate and int8 tile scale with the
    same footprint. Keeps the working set well under the 16 MB
    scoped-vmem limit."""
    # favor tall tiles (fewer halo refetches) with wc ≥ 8 for alignment
    best = (1, w)
    for bh in (64, 32, 16, 8, 4, 2, 1):
        if h % bh:
            continue
        wc = max(1, min(w, acc_budget // max(1, bh * b * c_out * 4)))
        while wc & (wc - 1):
            wc &= wc - 1
        while w % wc:
            wc //= 2
        if bh * wc * b * c * 2 > in_budget:
            continue
        if wc < 8 and wc < w:
            continue
        best = (bh, wc)
        break
    return best


def fused_gnq_conv3x3(
    x: jax.Array,
    eff_s: jax.Array,
    eff_b: jax.Array,
    s_x: jax.Array,
    w_q: jax.Array,
    s_w: jax.Array,
    bias: jax.Array | None = None,
    residual: jax.Array | None = None,
    with_stats: bool = True,
    apply_silu: bool = True,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    tiles: tuple | None = None,
):
    """GN-apply → SiLU → int8-quantize → 3×3 SAME conv (→ +residual) in
    one pallas pass over logically-[H, W, B, C] arrays.

    x        bf16/f32 [H, W, B, C] — the pre-norm feature map
    eff_s/b  fp32 [B, C] — folded GroupNorm coefficients (see GroupNorm32:
             eff_scale = inv·γ·(1+cond_scale) etc.). fp32 matters: bf16
             coefficients shift quantization decisions vs the unfused
             reference chain (measured ±2 int8 steps)
    s_x      fp32 scalar — the ANALYTIC activation quantization scale
    w_q      int8 [3, 3, C, Cout] pre-quantized weights
    s_w      fp32 [Cout] weight scales
    residual [H, W, B, Cout] added before stats (the ResBlock skip)

    Returns y [H, W, B, Cout] (+ (Σ, Σ²) [B, Cout] fp32 when
    ``with_stats`` — statistics of the RETURNED map for the next
    GroupNorm).  Bit-identical to the unfused
    GN→SiLU→quantize→conv→(+residual) XLA chain (tests/test_pallas_conv).
    """
    h, w, b, c = x.shape
    c_out = w_q.shape[3]
    w_cols = w_q.reshape(9, c, c_out)
    scale = (s_x * s_w).astype(jnp.float32)[None, :]
    bias_op = (
        bias.astype(jnp.float32)[None, :]
        if bias is not None
        else jnp.zeros((1, c_out), jnp.float32)
    )
    inv_s = (1.0 / s_x).astype(jnp.float32).reshape(1, 1)

    bh, wch = tiles if tiles is not None else _pick_tiles(h, w, b, c, c_out)
    n_h = h // bh
    n_wc = w // wch
    grid = (n_h, n_wc)

    # 9-spec halo exchange. A block extent of 1 makes that dim's block
    # index an ELEMENT index, so the four edges and four corners address
    # the exact halo rows/cols. Out-of-range indices clamp to a valid
    # block (its values are masked to zero in q space in the kernel).
    def rm(j):  # halo row above, element units
        return jnp.maximum(j * bh - 1, 0)

    def rp(j):  # halo row below
        return jnp.minimum(j * bh + bh, h - 1)

    def cm(t):  # halo col left
        return jnp.maximum(t * wch - 1, 0)

    def cp(t):  # halo col right
        return jnp.minimum(t * wch + wch, w - 1)

    x_specs = [
        pl.BlockSpec((1, 1, b, c), lambda j, t: (rm(j), cm(t), 0, 0)),
        pl.BlockSpec((1, wch, b, c), lambda j, t: (rm(j), t, 0, 0)),
        pl.BlockSpec((1, 1, b, c), lambda j, t: (rm(j), cp(t), 0, 0)),
        pl.BlockSpec((bh, 1, b, c), lambda j, t: (j, cm(t), 0, 0)),
        pl.BlockSpec((bh, wch, b, c), lambda j, t: (j, t, 0, 0)),
        pl.BlockSpec((bh, 1, b, c), lambda j, t: (j, cp(t), 0, 0)),
        pl.BlockSpec((1, 1, b, c), lambda j, t: (rp(j), cm(t), 0, 0)),
        pl.BlockSpec((1, wch, b, c), lambda j, t: (rp(j), t, 0, 0)),
        pl.BlockSpec((1, 1, b, c), lambda j, t: (rp(j), cp(t), 0, 0)),
    ]
    res_spec = pl.BlockSpec((bh, wch, b, c_out), lambda j, t: (j, t, 0, 0))
    if residual is None:
        residual = jnp.zeros((1, 1, b, c_out), out_dtype)
        res_spec = pl.BlockSpec((1, 1, b, c_out), lambda j, t: (0, 0, 0, 0))

    outs = pl.pallas_call(
        functools.partial(
            _kernel, bh=bh, n_h=n_h, wc=wch, n_wc=n_wc,
            with_residual=residual.shape[0] == h,
            with_stats=with_stats, apply_silu=apply_silu,
        ),
        grid=grid,
        in_specs=x_specs + [
            pl.BlockSpec((b, c), lambda j, t: (0, 0)),
            pl.BlockSpec((b, c), lambda j, t: (0, 0)),
            pl.BlockSpec((1, 1), lambda j, t: (0, 0)),
            pl.BlockSpec((9, c, c_out), lambda j, t: (0, 0, 0)),
            pl.BlockSpec((1, c_out), lambda j, t: (0, 0)),
            pl.BlockSpec((1, c_out), lambda j, t: (0, 0)),
            res_spec,
        ],
        out_specs=[
            pl.BlockSpec((bh, wch, b, c_out), lambda j, t: (j, t, 0, 0)),
            pl.BlockSpec((b, c_out), lambda j, t: (0, 0)),
            pl.BlockSpec((b, c_out), lambda j, t: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, w, b, c_out), out_dtype),
            jax.ShapeDtypeStruct((b, c_out), jnp.float32),
            jax.ShapeDtypeStruct((b, c_out), jnp.float32),
        ],
        interpret=interpret,
    )(x, x, x, x, x, x, x, x, x,
      eff_s.astype(jnp.float32), eff_b.astype(jnp.float32),
      inv_s, w_cols, scale, bias_op, residual)
    y, sums, sums_sq = outs
    if with_stats:
        return y, sums, sums_sq
    return y
