"""Bridge posterior sampling: one ``lax.scan``, fully on-device.

Re-designs the reference's sampling loops
(A2SB/A2SB_lightning_module.py:102-180 ``ddpm_sample`` /
``fast_inpaint_ddpm_sample``, A2SB/diffusion.py:27-87 MultiDiffusion):

- The reference runs a Python loop with a per-step ``pred_x0.cpu()`` host
  round-trip; here the entire trajectory is a single compiled scan.
- MultiDiffusion (sliding-window UNet evaluation for hour-long audio) is a
  batched window gather → ``lax.map``-chunked model evaluation →
  scatter-add overlap averaging. Same win=256/hop=128 semantics.
- The time-partitioned expert ensemble (2 checkpoints split at t=0.5)
  becomes a ``lax.switch`` over apply closures — only the active expert's
  weights are touched per step.

Array layout: NHWC ([B, bands, frames, 3]), matching the UNet.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def pad_for_multidiffusion(
    x: jax.Array, win_length: int, hop_length: int, padding_constant: float | None = None
) -> tuple[jax.Array, int]:
    """Pad the frame axis (axis -2) so windows tile exactly.

    Mirrors ``multidiffusion_pad_inputs`` (A2SB/diffusion.py:67-83): pad with
    a copy of the leading frames (or a constant). Returns (padded, original_width).
    """
    width = x.shape[-2]
    if width <= win_length:
        to_pad = win_length - width
    else:
        to_pad = int(math.ceil((width - win_length) / hop_length)) * hop_length + win_length - width
    if to_pad == 0:
        return x, width
    pad = x[..., :to_pad, :]
    if padding_constant is not None:
        pad = jnp.full_like(pad, padding_constant)
    return jnp.concatenate([x, pad], axis=-2), width


def unpad_multidiffusion(x: jax.Array, original_width: int) -> jax.Array:
    return x[..., :original_width, :]


def multidiffusion_vf(
    vf_fn: Callable[[jax.Array, jax.Array], jax.Array],
    x_t: jax.Array,
    t: jax.Array,
    win_length: int = 256,
    hop_length: int = 128,
    chunk_size: int = 16,
    layout: str = "nhwc",
) -> jax.Array:
    """Overlap-averaged vector field over sliding windows of the frame axis.

    ``vf_fn(windows [N, H, win, C], t) -> [N, H, win, C]`` is evaluated in
    chunks of ``chunk_size`` windows via ``lax.map`` to bound activation
    memory (mirroring the reference's batched chunking at
    A2SB/diffusion.py:44-51). x_t must already be padded to full hops.

    ``layout="nchw"``: x_t and vf_fn windows are channels-first
    [B/N, C, H, frames] (frames on the minor axis — the padded-lane-free
    layout the bridge scan carries; see bridge_sample).
    """
    cf = layout == "nchw"
    f_ax = 3 if cf else 2  # frame axis
    if cf:
        b, c, h, w = x_t.shape
    else:
        b, h, w, c = x_t.shape
    num_hops = (w - (win_length - hop_length)) // hop_length

    def eval_windows(wins):
        """Run the model over [N, ...] windows in plain batched calls
        of ≤chunk_size (static unrolled chunks — a vmapped lax.map lowers
        the convs noticeably worse on TPU)."""
        n = wins.shape[0]
        outs = []
        for s in range(0, n, chunk_size):
            outs.append(vf_fn(wins[s : min(s + chunk_size, n)], t))
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    win_shape = (
        (b, c, h, num_hops, win_length) if cf else (b, h, num_hops, win_length, c)
    )
    hop_ax = 3 if cf else 2

    if hop_length == win_length:
        # non-overlapping windows: pure reshape, no gather/scatter traffic
        wins = x_t.reshape(win_shape)
        wins = jnp.moveaxis(wins, hop_ax, 0)
        wins = wins.reshape((num_hops * b,) + wins.shape[2:])
        vf = eval_windows(wins)
        vf = jnp.moveaxis(vf.reshape((num_hops, b) + vf.shape[1:]), 0, hop_ax)
        return vf.reshape(x_t.shape)

    starts = jnp.arange(num_hops) * hop_length
    idx = starts[:, None] + jnp.arange(win_length)[None, :]  # [hops, win]

    wins = jnp.take(x_t, idx.reshape(-1), axis=f_ax)
    wins = wins.reshape(win_shape)
    wins = jnp.moveaxis(wins, hop_ax, 0)
    wins = wins.reshape((num_hops * b,) + wins.shape[2:])

    vf = eval_windows(wins)
    vf = jnp.moveaxis(vf.reshape((num_hops, b) + vf.shape[1:]), 0, hop_ax)

    out = jnp.zeros_like(x_t)
    flat_idx = idx.reshape(-1)
    if cf:
        out = out.at[:, :, :, flat_idx].add(
            vf.reshape(b, c, h, num_hops * win_length)
        )
        counts = jnp.zeros((w,), x_t.dtype).at[flat_idx].add(1.0)
        return out / counts[None, None, None, :]
    out = out.at[:, :, flat_idx, :].add(
        vf.reshape(b, h, num_hops * win_length, c)
    )
    counts = jnp.zeros((w,), x_t.dtype).at[flat_idx].add(1.0)
    return out / counts[None, None, :, None]


def find_middle_of_zero_segments(mask_1d) -> list[int]:
    """Centers of contiguous zero runs in a 1-D 0/1 array
    (A2SB/utils.py:54-81). Host-side helper for fast-inpaint."""
    import numpy as np

    m = np.asarray(mask_1d).astype(np.int64)
    padded = np.concatenate([[1], m, [1]])
    starts = np.flatnonzero((padded[:-1] == 1) & (padded[1:] == 0))
    ends = np.flatnonzero((padded[:-1] == 0) & (padded[1:] == 1))
    return [int((s + e) // 2) for s, e in zip(starts, ends)]


def fast_inpaint_sample(
    vf_fn: Callable,
    schedule,
    key: jax.Array,
    x_1: jax.Array,
    t_steps: jax.Array,
    mask: jax.Array,
    win_length: int = 256,
    hop_length: int = 256,
    chunk_size: int = 16,
) -> jax.Array:
    """Per-gap local inpainting (``fast_inpaint_ddpm_sample``,
    A2SB/A2SB_lightning_module.py:148-180): assumes every masked segment is
    shorter than one window and well separated; samples a win_length window
    centered on each gap and pastes the result back. The gap schedule runs
    on host (data-dependent segmentation); each window's sampling is the
    compiled bridge scan — one compile, reused across gaps.

    mask: 1 = generate (gap), 0 = known. Returns the inpainted x_1.
    """
    import numpy as np

    original_width = x_1.shape[-2]
    x_1, _ = pad_for_multidiffusion(x_1, win_length, hop_length)
    mask, _ = pad_for_multidiffusion(mask, win_length, hop_length, padding_constant=0.0)

    centers = find_middle_of_zero_segments(1.0 - np.asarray(mask[0, 0, :, 0]))
    width = x_1.shape[-2]

    sample_window = jax.jit(
        lambda key, xw, mw: bridge_sample(
            vf_fn, schedule, key, xw, t_steps, mask=mw,
            win_length=win_length, hop_length=hop_length, chunk_size=chunk_size,
        )
    )

    for center in centers:
        l_idx = int(center - win_length / 2)
        r_idx = l_idx + win_length
        if l_idx < 0:
            r_idx -= l_idx
            l_idx = 0
        if r_idx > width:
            l_idx -= r_idx - width
            r_idx = width
        key, sub = jax.random.split(key)
        xw = x_1[:, :, l_idx:r_idx, :]
        mw = mask[:, :, l_idx:r_idx, :]
        new_x0 = sample_window(sub, xw, mw)
        x_1 = x_1.at[:, :, l_idx:r_idx, :].set(new_x0)

    return unpad_multidiffusion(x_1, original_width)


def select_expert_vf(
    apply_fns: Sequence[Callable], t_cutoffs: Sequence[float]
) -> Callable:
    """Time-partitioned mixture-of-experts vector field.

    ``apply_fns[i]`` handles t in [cutoff_{i-1}, cutoff_i); selection follows
    ``get_vf_model`` (A2SB/A2SB_lightning_module.py:80-86): expert idx =
    #cutoffs ≤ t. Returns vf(x, t) usable inside scan (lax.switch —
    only the active expert executes).
    """
    cutoffs = jnp.asarray(list(t_cutoffs))

    def vf(x, t):
        idx = jnp.sum(t >= cutoffs).astype(jnp.int32)
        return jax.lax.switch(idx, list(apply_fns), x, t)

    return vf


def bridge_sample(
    vf_fn: Callable[[jax.Array, jax.Array], jax.Array],
    schedule,
    key: jax.Array,
    x_1: jax.Array,
    t_steps: jax.Array,
    mask: jax.Array | None = None,
    mask_pred_x0: bool = True,
    ot_ode: bool = False,
    win_length: int | None = None,
    hop_length: int | None = None,
    chunk_size: int = 16,
    return_all: bool = False,
    vf_layout: str = "nhwc",
    window_shift: int = 0,
) -> jax.Array:
    """Sample x₀ from the bridge posterior, starting at the corrupted x₁.

    Matches ``ddpm_sample`` (A2SB/A2SB_lightning_module.py:102-146):
    per step — vector field (optionally MultiDiffusion-windowed) → x̂₀ →
    mask-merge with the known region → posterior step → re-noise the known
    region. ``t_steps`` is a descending [n_steps+1] vector (e.g.
    ``linspace(1, 0.05, 50)``). Returns the final x̂₀ (same width as x_1),
    or the whole x̂₀ trajectory when ``return_all`` (the reference keeps
    all of them; carrying only the last saves n_steps× the state writes).

    Overlapped MultiDiffusion (hop < win — the reference predict default
    is win 256 / hop 128, A2SB_lightning_module.py:43-44) runs on the
    fast channels-first path when ``win % hop == 0``: the scan carries
    hop-sized tiles [n_tiles·B, C·H, hop]; windows are r=win/hop
    adjacent tiles (pure slice+concat — no gather), and the overlap
    average is r shifted slice-adds (no scatter). The per-step relayout
    moves only the ~13 MB state (~0.1 ms); the window evaluations
    dominate exactly as in the reference semantics.

    ``window_shift=s`` (requires hop == win, win % s == 0) is the
    TPU-cheap alternative to overlap: per step the non-overlapping
    window grid is cyclically shifted by ``s·step`` frames, so window
    boundaries land in different places across the 50 steps and no
    persistent seam forms — at 1/r the UNet evaluations of hop=s
    overlap. Quality-gated against true overlap in
    tests/test_a2sb_overlap.py.

    ``mask`` is assumed BINARY (0 = known region, 1 = to restore), as
    every reference corruption produces (corruptions.py masks are 0/1):
    the posterior noise and the known-region re-noise share one normal
    draw, which is distribution-identical only because the two uses
    compose on disjoint {mask==0}/{mask==1} regions. A soft mask
    (0 < m < 1) would compose the stds linearly instead of in
    quadrature — pass separate draws if that is ever needed.

    The whole loop is one ``lax.scan``; nothing leaves the device.
    """
    original_width = x_1.shape[-2]
    # MultiDiffusion windowing applies whenever a window size is given
    # (hop == win → non-overlapping tiles, the ddpm_sample default; the
    # model must always see win_length-frame windows, ref diffusion.py:27).
    use_md = win_length is not None and hop_length is not None and hop_length <= win_length
    if use_md:
        x_1, _ = pad_for_multidiffusion(x_1, win_length, hop_length)
        if mask is not None:
            mask, _ = pad_for_multidiffusion(mask, win_length, hop_length)

    # Carry the scan state CHANNELS-FIRST. The bridge math is ~10
    # elementwise passes per step over the full spectrogram; with the
    # public NHWC layout the 3-wide channel axis is minor-most and TPU
    # tiling pads it to the 128 lanes (~40× the real bytes — profiled at
    # 6.6 ms for ONE such pass). In [B, C, H, W] the minor dims tile
    # exactly; only the UNet call transposes to NHWC (once per step, and
    # that write doubles as the window batch).
    to_cf = lambda a: jnp.transpose(a, (0, 3, 1, 2))  # NHWC → NCHW
    to_cl = lambda a: jnp.transpose(a, (0, 2, 3, 1))  # NCHW → NHWC
    x_1 = to_cf(x_1)
    if mask is not None:
        mask = to_cf(mask)

    # Non-overlapping windows + channels-first model: carry the scan state
    # in WINDOW layout [hops·B, C, H, win]. Every bridge op is elementwise,
    # so the per-step split→model→reassemble transposes (profiled at
    # ~7 ms/step: XLA fuses the reassembly into the output conv and the
    # fusion runs at ~40 GB/s) collapse to ONE fold before the scan and one
    # unfold after it.
    shifted = (
        use_md and window_shift > 0 and hop_length == win_length
        and win_length % window_shift == 0 and vf_layout == "nchw"
    )
    window_scan = (
        use_md and hop_length == win_length and vf_layout == "nchw"
        and not shifted
    )
    # Overlapped windows (or shifted grids), channels-first: carry
    # tile-layout state instead (see docstring)
    tile_scan = shifted or (
        use_md and vf_layout == "nchw" and hop_length < win_length
        and win_length % hop_length == 0
    )
    orig_b = x_1.shape[0]

    def to_windows(a):  # [B, C, H, W] → [hops·B, C, H, win]
        b, c, h, w = a.shape
        nh = w // win_length
        a = a.reshape(b, c, h, nh, win_length)
        return jnp.moveaxis(a, 3, 0).reshape(nh * b, c, h, win_length)

    def from_windows(a):  # inverse of to_windows
        nhb, c, h, win = a.shape
        nh = nhb // orig_b
        a = a.reshape(nh, orig_b, c, h, win)
        return jnp.moveaxis(a, 0, 3).reshape(orig_b, c, h, nh * win)

    if window_scan:
        x_1 = to_windows(x_1)
        if mask is not None:
            mask = to_windows(mask)
        # fold C into H: the carry lives as [N, C·H, win] (bitcast-identical
        # memory order) so XLA's layout assignment can't propagate the input
        # conv's exotic (batch,channel)-minor operand layout into every
        # elementwise step op (profiled at 8.3 ms/step when it did); the
        # barriers below keep the model's boundary layouts local to it
        _, w_c, w_h, _ = x_1.shape
        fold = lambda a: a.reshape(a.shape[0], w_c * w_h, a.shape[3])
        unfold = lambda a: a.reshape(a.shape[0], w_c, w_h, a.shape[2])
        x_1 = fold(x_1)
        if mask is not None:
            mask = fold(mask)

    if tile_scan:
        tile = window_shift if shifted else hop_length
        r = win_length // tile
        _, w_c, w_h, w_w = x_1.shape
        n_tiles = w_w // tile
        ch = w_c * w_h
        fold = lambda a: a.reshape(a.shape[0], ch, a.shape[3])
        unfold = lambda a: a.reshape(a.shape[0], w_c, w_h, a.shape[2])

        def to_tiles(a):  # [B, C, H, W] → folded [n_tiles·B, C·H, tile]
            b = a.shape[0]
            a = a.reshape(b, w_c, w_h, n_tiles, tile)
            a = jnp.moveaxis(a, 3, 0).reshape(n_tiles * b, w_c, w_h, tile)
            return fold(a)

        def from_tiles(a):  # inverse of to_tiles
            a = unfold(a)
            a = a.reshape(n_tiles, orig_b, w_c, w_h, tile)
            return jnp.moveaxis(a, 0, 3).reshape(
                orig_b, w_c, w_h, n_tiles * tile
            )

        x_1 = to_tiles(x_1)
        if mask is not None:
            mask = to_tiles(mask)
        if shifted:
            assert n_tiles % r == 0, (n_tiles, r)
            nw = n_tiles // r
        else:
            nw = n_tiles - r + 1
            # tile k is covered by windows j ∈ [k-r+1, k] ∩ [0, nw)
            counts = [
                min(k, n_tiles - 1 - k, r - 1, nw - 1) + 1
                for k in range(n_tiles)
            ]
            inv_counts = jnp.asarray(
                [1.0 / c for c in counts], x_1.dtype
            )[:, None, None, None]

    def eval_chunks(wins, t):
        """Chunked model evaluation over folded [N, C·H, win] windows,
        with barriers keeping the model's boundary layouts local."""
        n = wins.shape[0]
        outs = []
        for s in range(0, n, chunk_size):
            (xw,) = jax.lax.optimization_barrier(
                (unfold(wins[s : min(s + chunk_size, n)]),)
            )
            (ow,) = jax.lax.optimization_barrier((vf_fn(xw, t),))
            outs.append(fold(ow))
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    def eval_vf_tiled(x_f, t, off):
        """Windowed vf on tile-layout state [n_tiles·B, C·H, tile]."""
        T = x_f.reshape(n_tiles, orig_b, ch, tile)
        if shifted:
            # cyclic grid shift by `off` tiles (traced per step), then the
            # non-overlapping r-tile grouping — boundaries move per step.
            # The traced roll costs one pass over the ~13 MB state
            # (~0.1 ms) — cheaper than compiling r static-grid variants
            # of the whole window evaluation under a lax.switch.
            T = jnp.roll(T, -off, axis=0)
            w = T.reshape(nw, r, orig_b, ch, tile)
            w = jnp.moveaxis(w, 1, 3).reshape(nw * orig_b, ch, win_length)
            o = eval_chunks(w, t)
            o = o.reshape(nw, orig_b, ch, r, tile)
            o = jnp.moveaxis(o, 3, 1).reshape(n_tiles, orig_b, ch, tile)
            o = jnp.roll(o, off, axis=0)
            return o.reshape(n_tiles * orig_b, ch, tile)
        # true overlap: window j = tiles [j, j+r) — r shifted slices, then
        # the overlap average as r shifted slice-adds (no gather/scatter)
        w = jnp.concatenate([T[i : i + nw] for i in range(r)], axis=-1)
        o = eval_chunks(w.reshape(nw * orig_b, ch, win_length), t)
        o = o.reshape(nw, orig_b, ch, r, tile)
        acc = jnp.zeros((n_tiles, orig_b, ch, tile), jnp.float32)
        for i in range(r):
            acc = acc.at[i : i + nw].add(o[:, :, :, i, :].astype(jnp.float32))
        acc = (acc * inv_counts.astype(jnp.float32)).astype(x_f.dtype)
        return acc.reshape(n_tiles * orig_b, ch, tile)

    def eval_vf(x_t_cf, t, off=None):
        if tile_scan:
            return eval_vf_tiled(x_t_cf, t, off)
        if window_scan:
            return eval_chunks(x_t_cf, t)
        if vf_layout == "nchw":
            # the model consumes/produces channels-first directly (UNet
            # io_layout="nchw") — no boundary transposes at all
            if use_md:
                return multidiffusion_vf(
                    vf_fn, x_t_cf, t, win_length, hop_length, chunk_size,
                    layout="nchw",
                )
            return vf_fn(x_t_cf, t)
        x_t = to_cl(x_t_cf)
        if use_md:
            return to_cf(
                multidiffusion_vf(vf_fn, x_t, t, win_length, hop_length, chunk_size)
            )
        return to_cf(vf_fn(x_t, t))


    def step(carry, xs):
        x_t, key = carry
        (t, t_prev), off, c = xs
        key, k_noise = jax.random.split(key)

        vf = eval_vf(x_t, t, off)
        # bridge coefficients come PRE-COMPUTED per step (see ts_pairs
        # below): computing them inside the scan left ~36 scalar
        # sqrt/pow kernels per step on the device — pure launch latency
        pred_x0 = x_t - c[0] * vf  # schedule.pred_x0 semantics
        if mask is not None and mask_pred_x0:
            pred_x0 = pred_x0 * mask + (1.0 - mask) * x_1

        # ONE standard-normal draw per step, shared by the posterior and
        # the known-region re-noise: the two compose on disjoint mask
        # regions ((1-mask)·xt_true + mask·x_prev), so sharing the draw is
        # distribution-identical and halves the full-tensor RNG traffic
        noise = (
            None if ot_ode
            else jax.random.normal(k_noise, x_t.shape, x_t.dtype)
        )
        # schedule.p_posterior semantics with precomputed (μ_x0, μ_xt, σ)
        x_prev = c[1] * pred_x0 + c[2] * x_t
        if not ot_ode:
            x_prev = x_prev + c[3] * noise
        if mask is not None:
            xt_true = x_1
            if not ot_ode:
                xt_true = xt_true + c[4] * noise  # std_t(t_prev)
            x_prev = (1.0 - mask) * xt_true + mask * x_prev
        # pin the carry dtype (bf16 inputs must not drift to f32 mid-scan)
        carry = (x_prev.astype(x_1.dtype), key, pred_x0.astype(x_1.dtype))
        return carry, (pred_x0 if return_all else None)

    ts_pairs = jnp.stack([t_steps[:-1], t_steps[1:]], axis=-1)
    n_steps = ts_pairs.shape[0]
    # per-step bridge coefficients, vectorized over the whole schedule
    # OUTSIDE the scan (same dtype/ops as the in-step scalar path they
    # replace, so results are bit-identical): [n, 5] =
    # (σ_fwd(t), μ_x0, μ_xt, posterior noise std, std_t(t_prev))
    from audio_intelligence_tpu.models.a2sb.bridge import (
        gaussian_product_coef,
    )

    sf_t = schedule.std_fwd(ts_pairs[:, 0])
    sf_p = schedule.std_fwd(ts_pairs[:, 1])
    std_delta = jnp.sqrt(sf_t**2 - sf_p**2)
    mu_x0, mu_xt, var = gaussian_product_coef(sf_p, std_delta)
    noise_std = jnp.where(ts_pairs[:, 1] > 0, jnp.sqrt(var), 0.0)
    std_sb = schedule.std_t(ts_pairs[:, 1])
    coefs = jnp.stack([sf_t, mu_x0, mu_xt, noise_std, std_sb], axis=-1)
    if shifted:
        # grid offset rotates through the r phases across steps
        offsets = (jnp.arange(n_steps, dtype=jnp.int32) % r)
    else:
        offsets = jnp.zeros((n_steps,), jnp.int32)
    init = (x_1, key, jnp.zeros_like(x_1))

    def step_adapter(carry, xs):
        x_t, key, _ = carry
        return step((x_t, key), xs)

    (_, _, last_pred), pred_x0s = jax.lax.scan(
        step_adapter, init, (ts_pairs, offsets, coefs)
    )
    if return_all:
        if window_scan:
            pred_x0s = jax.vmap(lambda a: from_windows(unfold(a)))(pred_x0s)
        elif tile_scan:
            pred_x0s = jax.vmap(from_tiles)(pred_x0s)
        # [steps, B, C, H, W] → [steps, B, H, W, C]
        pred_x0s = jnp.transpose(pred_x0s, (0, 1, 3, 4, 2))
        return unpad_multidiffusion(pred_x0s, original_width)
    if window_scan:
        last_pred = from_windows(unfold(last_pred))
    elif tile_scan:
        last_pred = from_tiles(last_pred)
    return unpad_multidiffusion(to_cl(last_pred), original_width)
