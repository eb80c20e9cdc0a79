"""GAN critics for VAE training.

The ETTA-VAE flagship uses the EnCodec multi-scale STFT discriminator
(filters 64, 5 scales n_fft 2048/1024/512/256/128 — etta_vae.json:86-99;
reference wrapper: ETTA/stable_audio_tools/models/discriminators.py
EncodecDiscriminator:20-59 around encodec.msstftd.MultiScaleSTFTDiscriminator)
with hinge losses and L1 feature matching.

Each scale: complex STFT → (re ‖ im per audio channel) 2-D feature map
[B, T, F, C] → weight-norm conv stack (k 3×9, dilations 1/2/4 in time,
stride 2 in freq) → logits. All scales share the loss:
dis = Σ relu(1−D(x)) + relu(1+D(x̂)), adv = −Σ D(x̂),
fm = Σ_scales mean_layers |f(x) − f(x̂)| / n_layers.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from audio_intelligence_tpu.ops.stft import stft


class WNConv2d(nn.Module):
    """Weight-normalized 2-D conv (NHWC), torch weight_norm(dim=0) semantics."""

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    dilation: tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        v = self.param(
            "v", nn.initializers.he_uniform(), (kh, kw, in_ch, self.features)
        )
        g = self.param(
            "g",
            lambda key, shape: jnp.linalg.norm(v.reshape(-1, self.features), axis=0),
            (self.features,),
        )
        norm = jnp.linalg.norm(v.reshape(-1, self.features), axis=0)
        kernel = (v * (g / jnp.maximum(norm, 1e-12))).astype(x.dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dh, dw = self.dilation
        pad = [((kh - 1) * dh // 2,) * 2, ((kw - 1) * dw // 2,) * 2]
        out = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=self.strides,
            padding=pad,
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias


class STFTDiscriminator(nn.Module):
    """One scale of the EnCodec MS-STFT discriminator."""

    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    filters: int = 64
    max_filters: int = 1024
    dilations: Sequence[int] = (1, 2, 4)
    in_channels: int = 2

    @nn.compact
    def __call__(self, x):
        """x: waveform [B, T, C] → (logits map, feature list)."""
        b, t, c = x.shape
        spec = stft(
            jnp.moveaxis(x, -1, 1).reshape(b * c, t),
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
        )  # [B*C, F, frames]
        # normalized=True in encodec's Spectrogram
        spec = spec / jnp.sqrt(jnp.sum(jnp.hanning(self.win_length).astype(jnp.float32) ** 2))
        z = jnp.stack([spec.real, spec.imag], axis=1)  # [B*C, 2, F, T]
        z = z.reshape(b, c * 2, z.shape[-2], z.shape[-1])
        z = jnp.transpose(z, (0, 3, 2, 1))  # [B, T, F, 2C] (time, freq as H, W)

        feats = []
        h = WNConv2d(self.filters, (3, 9), name="conv0")(z)
        h = jax.nn.leaky_relu(h, 0.2)
        feats.append(h)
        in_ch = self.filters
        for i, d in enumerate(self.dilations):
            out_ch = min(self.filters * 2 ** (i + 1), self.max_filters)
            h = WNConv2d(
                out_ch, (3, 9), strides=(1, 2), dilation=(d, 1), name=f"conv{i+1}"
            )(h)
            h = jax.nn.leaky_relu(h, 0.2)
            feats.append(h)
            in_ch = out_ch
        out_ch = min(self.filters * 2 ** (len(self.dilations) + 1), self.max_filters)
        h = WNConv2d(out_ch, (3, 3), name="conv_pre_post")(h)
        h = jax.nn.leaky_relu(h, 0.2)
        feats.append(h)
        logits = WNConv2d(1, (3, 3), name="conv_post")(h)
        return logits, feats


class MultiScaleSTFTDiscriminator(nn.Module):
    """All scales; flagship 5 scales (etta_vae.json)."""

    filters: int = 64
    n_ffts: Sequence[int] = (2048, 1024, 512, 256, 128)
    hop_lengths: Sequence[int] = (512, 256, 128, 64, 32)
    win_lengths: Sequence[int] = (2048, 1024, 512, 256, 128)
    in_channels: int = 2

    @nn.compact
    def __call__(self, x):
        logits, features = [], []
        for i, (nf, hl, wl) in enumerate(
            zip(self.n_ffts, self.hop_lengths, self.win_lengths)
        ):
            l, f = STFTDiscriminator(
                n_fft=nf,
                hop_length=hl,
                win_length=wl,
                filters=self.filters,
                in_channels=self.in_channels,
                name=f"disc{i}",
            )(x)
            logits.append(l)
            features.append(f)
        return logits, features


class SharedDiscriminatorConvNet(nn.Module):
    """Weight-norm conv stack critic (discriminators.py:66-118) — the
    building block of the Oobleck discriminator. 1-D variant (NWC)."""

    capacity: int = 32
    n_layers: int = 4
    kernel_size: int = 15
    stride: int = 4

    @nn.compact
    def __call__(self, x):
        """x [B, T, C] → (score [B], features list)."""
        from audio_intelligence_tpu.models.etta.vae import WNConv

        feats = []
        channels = [self.capacity * 2**i for i in range(self.n_layers)]
        h = x
        for i, ch in enumerate(channels):
            h = WNConv(
                ch, self.kernel_size, stride=self.stride,
                padding=self.kernel_size // 2, name=f"conv{i}",
            )(h)
            feats.append(h)
            h = jax.nn.silu(h)
        h = WNConv(1, 1, name="conv_out")(h)
        feats.append(h)
        score = jnp.mean(h.reshape(h.shape[0], -1), axis=-1)
        return score, feats


class OobleckDiscriminator(nn.Module):
    """Multi-scale 1-D critic ensemble (discriminators.py:121-167):
    the waveform at {1×, ½, ¼} rates through shared-architecture convnets."""

    capacity: int = 32
    n_scales: int = 3

    @nn.compact
    def __call__(self, x):
        logits, features = [], []
        h = x
        for i in range(self.n_scales):
            score, feats = SharedDiscriminatorConvNet(
                capacity=self.capacity, name=f"scale{i}"
            )(h)
            logits.append(score[:, None, None, None])  # broadcastable like MS-STFT
            features.append(feats)
            # ×2 average-pool downsample between scales
            t2 = (h.shape[1] // 2) * 2
            h = h[:, :t2].reshape(h.shape[0], t2 // 2, 2, h.shape[-1]).mean(axis=2)
        return logits, features


# ---------------------------------------------------------------------------
# DAC critics (reference discriminators.py:306-556, Descript Audio Codec):
# multi-period waveform critics + multi-band complex-STFT critics with
# least-squares GAN losses. TPU-native notes: period folding is a reshape to
# [B, T/p, p, C] (NHWC) so each period critic is one dense conv2d; the STFT
# band split is static slicing so XLA sees fixed shapes per band.
# ---------------------------------------------------------------------------


class MPD(nn.Module):
    """Multi-period critic (discriminators.py:308-345): fold time by
    ``period``, then a (5,1)-kernel stride-(3,1) weight-norm conv tower."""

    period: int

    @nn.compact
    def __call__(self, x):
        """x: waveform [B, T, C] → feature-map list (last = logits)."""
        b, t, c = x.shape
        pad = (self.period - t % self.period) % self.period
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="reflect")
        h = x.reshape(b, (t + pad) // self.period, self.period, c)  # [B,L,p,C]
        fmap = []
        for i, ch in enumerate((32, 128, 512, 1024)):
            h = WNConv2d(ch, (5, 1), strides=(3, 1), name=f"conv{i}")(h)
            h = jax.nn.leaky_relu(h, 0.1)
            fmap.append(h)
        h = WNConv2d(1024, (5, 1), name="conv4")(h)
        h = jax.nn.leaky_relu(h, 0.1)
        fmap.append(h)
        h = WNConv2d(1, (3, 1), name="conv_post")(h)
        fmap.append(h)
        return fmap


DAC_BANDS = ((0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0))


class MRD(nn.Module):
    """Multi-band complex-spectrogram critic (discriminators.py:403-458):
    per-band (3,9) weight-norm conv stacks over [T, F_band, (re,im)] maps,
    concatenated along frequency for the final logits conv."""

    window_length: int
    hop_factor: float = 0.25
    bands: tuple = DAC_BANDS

    @nn.compact
    def __call__(self, x):
        b, t, c = x.shape
        spec = stft(
            jnp.moveaxis(x, -1, 1).reshape(b * c, t),
            n_fft=self.window_length,
            hop_length=int(self.window_length * self.hop_factor),
            win_length=self.window_length,
        )  # [B*C, F, frames]
        z = jnp.stack([spec.real, spec.imag], axis=-1)  # [B*C, F, T, 2]
        z = jnp.transpose(z, (0, 2, 1, 3))  # [B*C, T, F, 2] (NHWC)
        n_fft_bins = self.window_length // 2 + 1
        fmap, band_outs = [], []
        for bi, (lo, hi) in enumerate(self.bands):
            h = z[:, :, int(lo * n_fft_bins) : int(hi * n_fft_bins), :]
            h = WNConv2d(32, (3, 9), name=f"band{bi}_conv0")(h)
            fmap.append(h)
            for li in range(1, 4):
                h = jax.nn.leaky_relu(h, 0.1)
                h = WNConv2d(32, (3, 9), strides=(1, 2), name=f"band{bi}_conv{li}")(h)
                fmap.append(h)
            h = jax.nn.leaky_relu(h, 0.1)
            h = WNConv2d(32, (3, 3), name=f"band{bi}_conv4")(h)
            fmap.append(h)
            band_outs.append(h)
        h = jnp.concatenate(band_outs, axis=2)
        h = WNConv2d(1, (3, 3), name="conv_post")(jax.nn.leaky_relu(h, 0.1))
        fmap.append(h)
        return fmap


class DACDiscriminator(nn.Module):
    """MPD×periods + MRD×fft_sizes ensemble (discriminators.py:461-506).

    MSD rates default to () like the reference. Input is DC-removed and
    peak-normalized to 0.8 before every critic (preprocess:495-500).
    """

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    fft_sizes: Sequence[int] = (2048, 1024, 512)
    bands: tuple = DAC_BANDS

    @nn.compact
    def __call__(self, x):
        x = x - jnp.mean(x, axis=1, keepdims=True)
        peak = jnp.max(jnp.abs(x), axis=(1, 2), keepdims=True)
        x = 0.8 * x / (peak + 1e-9)
        fmaps = [MPD(p, name=f"mpd_{p}")(x) for p in self.periods]
        fmaps += [
            MRD(f, bands=self.bands, name=f"mrd_{f}")(x) for f in self.fft_sizes
        ]
        return fmaps


def dac_gan_losses(fmaps_real, fmaps_fake):
    """Least-squares GAN losses (DACGANLoss, discriminators.py:508-556):
    dis = Σ mean((1−D(x))²) + mean(D(x̂)²); gen = Σ mean((1−D(x̂))²);
    fm = Σ_{layers<last} L1(f_real, f_fake). Sum-reduced like the reference
    (weight magnitudes differ from the EnCodec-tuned stack by design).

    The reference detaches the *fake waveform* for the dis term; here the
    alternating train step differentiates wrt only one param subset at a
    time (training.py make_vae_train_steps), so no stop_gradient is needed
    inside the loss."""
    dis = 0.0
    gen = 0.0
    fm = 0.0
    for fr, ff in zip(fmaps_real, fmaps_fake):
        dis += jnp.mean((1.0 - fr[-1]) ** 2) + jnp.mean(ff[-1] ** 2)
        gen += jnp.mean((1.0 - ff[-1]) ** 2)
        for a, b in zip(fr[:-1], ff[:-1]):
            fm += jnp.mean(jnp.abs(a - b))
    return dis, gen, fm


def encodec_gan_losses(logits_true, feats_true, logits_fake, feats_fake):
    """Hinge + feature-matching losses (discriminators.py:16-59)."""
    dis_loss = 0.0
    adv_loss = 0.0
    fm = 0.0
    for lt, lf, ft, ff in zip(logits_true, logits_fake, feats_true, feats_fake):
        dis_loss += jnp.mean(jax.nn.relu(1.0 - lt)) + jnp.mean(jax.nn.relu(1.0 + lf))
        adv_loss += -jnp.mean(lf)
        fm += sum(jnp.mean(jnp.abs(a - b)) for a, b in zip(ft, ff)) / len(ft)
    return dis_loss, adv_loss, fm
