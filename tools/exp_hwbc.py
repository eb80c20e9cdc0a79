#!/usr/bin/env python
"""Round-5 layout experiment: logical [H, W, B, C] vs [B, H, W, C] for the
A2SB L0-class ResBlock chain, and pallas GN→SiLU→quant passes in each.

Hypothesis (PERF.md round-4 "levers not yet tried" #2): XLA's conv-chosen
physical layout on NHWC logical arrays is {3,0,2,1} — i.e. bytes ordered
(H, W, B, C). If arrays are LOGICALLY [H, W, B, C], the default layout
{3,2,1,0} has the same byte order, so pallas kernels (which only speak
default layouts) become seam-free and elementwise passes can be hand-fused
without the relayout copies that killed every round-2/3/4 attempt.

Variants (identical math, model dataflow of 2 fused int8 ResBlocks):
  nhwc          — the production path's layout (baseline)
  hwbc          — same ops on [H,W,B,C] logical arrays, XLA end to end
  nhwc_pallas   — GN-apply+SiLU+quant as a pallas kernel on NHWC (seam demo)
  hwbc_pallas   — the same pallas kernel on [H,W,B,C] (seam-free claim)

Usage: python tools/exp_hwbc.py --variant hwbc [--iters 20]
Prints per-ResBlock ms (best of 5, scalar-checksum timed).
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="nhwc",
                    choices=["nhwc", "hwbc", "nhwc_pallas", "hwbc_pallas"])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--h", type=int, default=1024)
    ap.add_argument("--w", type=int, default=256)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--c", type=int, default=128)
    ap.add_argument("--check", action="store_true",
                    help="CPU numerics check vs the nhwc variant")
    ap.add_argument("--ht", type=int, default=4,
                    help="pallas block height (H rows per grid step); "
                         "8 exceeds the 16M scoped-vmem limit at "
                         "W=256 B=8 C=128")
    args = ap.parse_args(argv)

    import bench as B

    jax = B._jax_setup()
    import jax.numpy as jnp
    import numpy as np

    if args.check:
        jax.config.update("jax_platforms", "cpu")

    from audio_intelligence_tpu.ops.quant import (
        quantize_int8,
        symmetric_scales,
    )

    H, W, Bn, C = args.h, args.w, args.b, args.c
    groups = 32
    cg = C // groups
    hwbc = args.variant.startswith("hwbc")
    use_pallas = args.variant.endswith("pallas")

    if hwbc:
        shape = (H, W, Bn, C)
        spatial = (0, 1)
        dn_str = ("HWNC", "HWIO", "HWNC")
        bmap = (1, 1, Bn, C)   # broadcast [B, C] maps over pixels
    else:
        shape = (Bn, H, W, C)
        spatial = (1, 2)
        dn_str = ("NHWC", "HWIO", "NHWC")
        bmap = (Bn, 1, 1, C)
    cvec = (1, 1, 1, C)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 20)
    f32 = jnp.float32

    def mk_conv(k):
        w = jax.random.normal(k, (3, 3, C, C), f32) * 0.05
        s_w = symmetric_scales(w, axis=3)
        return quantize_int8(w, s_w[None, None, None, :]), s_w, jnp.zeros((C,), f32)

    convs = [mk_conv(ks[i]) for i in range(4)]
    gns = [
        (
            (1 + 0.1 * jax.random.normal(ks[4 + i], (C,), f32)),
            0.1 * jax.random.normal(ks[8 + i], (C,), f32),
        )
        for i in range(4)
    ]
    conds = [
        (
            0.1 * jax.random.normal(ks[12 + i], (Bn, C), f32),
            0.1 * jax.random.normal(ks[16 + i], (Bn, C), f32),
        )
        for i in range(4)
    ]

    dn = None  # resolved lazily (needs array shapes)

    def stats(x):
        x32 = x.astype(f32)
        return jnp.sum(x32, axis=spatial), jnp.sum(x32 * x32, axis=spatial)

    def gn_coeffs(st, gamma, beta, cond):
        sums, sums_sq = st
        n = H * W * cg
        mean = sums.reshape(Bn, groups, cg).sum(-1) / n
        mean_sq = sums_sq.reshape(Bn, groups, cg).sum(-1) / n
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + 1e-5)
        inv_c = jnp.repeat(inv, cg, axis=-1)
        mean_c = jnp.repeat(mean, cg, axis=-1)
        eff_s = inv_c * gamma[None, :]
        eff_b = beta[None, :] - mean_c * eff_s
        if cond is not None:
            cs, ct = cond
            eff_s = eff_s * (1 + cs)
            eff_b = eff_b * (1 + cs) + ct
            a_mag = jnp.abs(gamma[None, :] * (1 + cs))
            b_mag = jnp.abs(beta[None, :] * (1 + cs) + ct)
            amax = jnp.max(5.0 * a_mag + b_mag)
        else:
            amax = jnp.max(5.0 * jnp.abs(gamma) + jnp.abs(beta))
        s_x = jnp.maximum(amax, 0.2785) / 127.0
        return eff_s, eff_b, s_x  # [B,C], [B,C], scalar

    def gnq_xla(x, st, gamma, beta, cond):
        eff_s, eff_b, s_x = gn_coeffs(st, gamma, beta, cond)
        y = (
            x.astype(jnp.bfloat16) * eff_s.astype(jnp.bfloat16).reshape(bmap)
            + eff_b.astype(jnp.bfloat16).reshape(bmap)
        )
        act = y.astype(f32)
        act = jax.nn.silu(act)
        q = jnp.clip(jnp.round(act / s_x), -127, 127).astype(jnp.int8)
        return q, s_x

    def gnq_pallas(x, st, gamma, beta, cond):
        from jax.experimental import pallas as pl

        eff_s, eff_b, s_x = gn_coeffs(st, gamma, beta, cond)
        inv_s = (1.0 / s_x).reshape(1, 1)
        es = eff_s.astype(jnp.bfloat16)
        eb = eff_b.astype(jnp.bfloat16)

        def kernel(x_ref, es_ref, eb_ref, inv_ref, o_ref):
            xx = x_ref[...].astype(f32)
            if hwbc:
                esb = es_ref[...].astype(f32)[None, None]
                ebb = eb_ref[...].astype(f32)[None, None]
            else:
                esb = es_ref[...].astype(f32)[:, None, None, :]
                ebb = eb_ref[...].astype(f32)[:, None, None, :]
            y = xx * esb + ebb
            act = y * jax.nn.sigmoid(y)
            q = jnp.clip(jnp.round(act * inv_ref[0, 0]), -127, 127)
            o_ref[...] = q.astype(jnp.int8)

        ht = args.ht
        if hwbc:
            grid = (H // ht,)
            xspec = pl.BlockSpec((ht, W, Bn, C), lambda i: (i, 0, 0, 0))
        else:
            grid = (H // ht,)
            xspec = pl.BlockSpec((Bn, ht, W, C), lambda i: (0, i, 0, 0))
        q = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                xspec,
                pl.BlockSpec((Bn, C), lambda i: (0, 0)),
                pl.BlockSpec((Bn, C), lambda i: (0, 0)),
                pl.BlockSpec(memory_space=pl.ANY)
                if False
                else pl.BlockSpec((1, 1), lambda i: (0, 0)),
            ],
            out_specs=xspec,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int8),
            interpret=jax.default_backend() == "cpu",
        )(x, es, eb, inv_s.astype(f32))
        return q, s_x

    gnq = gnq_pallas if use_pallas else gnq_xla

    def qconv(x_q, s_x, conv):
        nonlocal dn
        w_q, s_w, bias = conv
        if dn is None:
            dn = jax.lax.conv_dimension_numbers(x_q.shape, w_q.shape, dn_str)
        y = jax.lax.conv_general_dilated(
            x_q, w_q, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        y = y.astype(f32) * (s_x * s_w.reshape(cvec)) + bias.reshape(cvec)
        return y.astype(jnp.bfloat16)

    def chain(x, _):
        for rb in range(2):
            st_x = stats(x)
            q1, s1 = gnq(x, st_x, gns[2 * rb][0], gns[2 * rb][1], None)
            h = qconv(q1, s1, convs[2 * rb])
            st_h = stats(h)
            q2, s2 = gnq(
                h, st_h, gns[2 * rb + 1][0], gns[2 * rb + 1][1], conds[rb]
            )
            hp = qconv(q2, s2, convs[2 * rb + 1])
            x = x + hp
        return x, ()

    def run(x0):
        out, _ = jax.lax.scan(chain, x0, (), length=args.iters)
        return jnp.sum(out.astype(f32))

    x0 = (jax.random.normal(ks[19], shape, f32) * 0.5).astype(jnp.bfloat16)

    if args.check:
        # single-iteration numerics: hwbc must match nhwc transposed
        out, _ = chain(x0, ())
        print("check output:", float(jnp.sum(out.astype(f32))),
              "shape", out.shape)
        return

    jitted = jax.jit(run)
    t0 = time.time()
    chk = float(jitted(x0))
    print(f"compile+first: {time.time()-t0:.1f}s  checksum={chk:.1f}")
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        _ = float(jitted(x0))
        best = min(best, time.time() - t0)
    per_rb = best / (args.iters * 2) * 1e3
    print(
        f"variant={args.variant}  total={best*1e3:.2f} ms  "
        f"per-ResBlock={per_rb:.3f} ms  (iters={args.iters}, "
        f"shape={'HWBC' if hwbc else 'NHWC'} {shape})"
    )


if __name__ == "__main__":
    main()
