"""Golden tests: STFT/iSTFT/mel/phase ops vs core torch (CPU).

torchaudio is not in the image, but ``torchaudio.transforms.Spectrogram``
is a thin wrapper over ``torch.stft`` — we golden-test against torch.stft /
torch.istft directly with matching arguments.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from audio_intelligence_tpu.ops import (
    stft,
    istft,
    spectrogram,
    inverse_spectrogram,
    hann_window,
    complex_to_mag_inst_phase,
    mag_inst_phase_to_complex,
    svd_fix_mag_inst_phase,
    power_scale_spectrogram,
    drop_dc_term,
    add_dc_term,
    melspectrogram,
    resample,
    griffin_lim,
)


def _rand_wave(t=13000, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(t).astype(np.float32) * 0.3


def torch_stft(x, n_fft, hop, win):
    return torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        win_length=win,
        window=torch.hann_window(win),
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    ).numpy()


@pytest.mark.parametrize("n_fft,hop,win", [(1024, 256, 1024), (2048, 512, 2048), (400, 160, 400)])
def test_stft_matches_torch(n_fft, hop, win):
    x = _rand_wave()
    ours = np.asarray(stft(jnp.asarray(x), n_fft=n_fft, hop_length=hop, win_length=win))
    ref = torch_stft(x, n_fft, hop, win)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)


def test_stft_hann_window_matches_torch():
    np.testing.assert_allclose(
        np.asarray(hann_window(1024)), torch.hann_window(1024).numpy(), atol=1e-6
    )


@pytest.mark.parametrize("n_fft,hop", [(1024, 256), (2048, 512)])
def test_istft_roundtrip_matches_torch(n_fft, hop):
    x = _rand_wave()
    spec = torch_stft(x, n_fft, hop, n_fft)
    ref = torch.istft(
        torch.from_numpy(spec),
        n_fft=n_fft,
        hop_length=hop,
        win_length=n_fft,
        window=torch.hann_window(n_fft),
        center=True,
        length=len(x),
    ).numpy()
    ours = np.asarray(
        istft(jnp.asarray(spec), n_fft=n_fft, hop_length=hop, length=len(x))
    )
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)
    # and the round trip actually reconstructs the signal
    np.testing.assert_allclose(ours, x, atol=5e-3)


def test_stft_batched():
    x = np.stack([_rand_wave(seed=i) for i in range(3)])
    batched = np.asarray(stft(jnp.asarray(x), n_fft=512, hop_length=128))
    single = np.stack(
        [np.asarray(stft(jnp.asarray(x[i]), n_fft=512, hop_length=128)) for i in range(3)]
    )
    np.testing.assert_allclose(batched, single, atol=1e-5)


def test_complex_spectrogram_channel_layout():
    """A2SB ComplexSpectrogram: [2, F, T] with (real, imag) channels."""
    x = _rand_wave()
    spec2 = np.asarray(spectrogram(jnp.asarray(x), n_fft=1024, hop_length=256))
    ref = torch_stft(x, 1024, 256, 1024)
    assert spec2.shape == (2,) + ref.shape
    np.testing.assert_allclose(spec2[0], ref.real, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(spec2[1], ref.imag, atol=2e-3, rtol=1e-4)


def test_inverse_spectrogram_roundtrip():
    x = _rand_wave(t=8192)
    spec2 = spectrogram(jnp.asarray(x), n_fft=1024, hop_length=256)
    back = np.asarray(
        inverse_spectrogram(spec2, n_fft=1024, hop_length=256, length=len(x))
    )
    np.testing.assert_allclose(back, x, atol=5e-3)


def test_mag_inst_phase_roundtrip():
    x = _rand_wave(t=8192)
    spec2 = spectrogram(jnp.asarray(x), n_fft=1024, hop_length=256)
    msp = complex_to_mag_inst_phase(spec2)
    assert msp.shape[0] == 3
    # cos² + sin² == 1
    np.testing.assert_allclose(
        np.asarray(msp[1] ** 2 + msp[2] ** 2), 1.0, atol=1e-5
    )
    back = mag_inst_phase_to_complex(msp)
    np.testing.assert_allclose(np.asarray(back), np.asarray(spec2), atol=1e-4)


def test_svd_fix_projects_to_so2():
    rng = np.random.default_rng(0)
    msp = rng.standard_normal((3, 64, 32)).astype(np.float32)
    fixed = np.asarray(svd_fix_mag_inst_phase(jnp.asarray(msp)))
    # magnitudes untouched
    np.testing.assert_allclose(fixed[0], msp[0], atol=1e-6)
    # (cos, sin) now unit norm
    np.testing.assert_allclose(fixed[1] ** 2 + fixed[2] ** 2, 1.0, atol=1e-5)
    # direction preserved
    dots = fixed[1] * msp[1] + fixed[2] * msp[2]
    assert (dots > 0).all()


def test_svd_fix_matches_reference_torch_svd():
    """The closed form must equal the reference's batched-SVD projection."""
    rng = np.random.default_rng(1)
    msp = rng.standard_normal((3, 16, 8)).astype(np.float32)
    cos_t, sin_t = torch.from_numpy(msp[1]), torch.from_numpy(msp[2])
    top = torch.stack([cos_t, -sin_t], 0)
    bottom = torch.stack([sin_t, cos_t], 0)
    rot = torch.stack([top, bottom], 0).permute(2, 3, 0, 1)
    U, S, Vh = torch.linalg.svd(rot)
    new_s = S.clone()
    new_s[..., 0] = 1
    new_s[..., 1] = torch.det(U @ Vh)
    new_rot = U @ torch.diag_embed(new_s) @ Vh
    ref_cos = new_rot[..., 0, 0].numpy()
    ref_sin = new_rot[..., 1, 0].numpy()
    fixed = np.asarray(svd_fix_mag_inst_phase(jnp.asarray(msp)))
    np.testing.assert_allclose(fixed[1], ref_cos, atol=1e-4)
    np.testing.assert_allclose(fixed[2], ref_sin, atol=1e-4)


def test_power_scale_forward_inverse():
    rng = np.random.default_rng(0)
    spec = np.abs(rng.standard_normal((3, 32, 16))).astype(np.float32) + 0.1
    fwd = power_scale_spectrogram(jnp.asarray(spec), power=0.25, channels=(0,))
    inv = power_scale_spectrogram(fwd, power=4.0, channels=(0,))
    np.testing.assert_allclose(np.asarray(inv[0]), spec[0], rtol=2e-3, atol=1e-3)
    # non-selected channels untouched
    np.testing.assert_allclose(np.asarray(fwd[1:]), spec[1:], atol=1e-6)


def test_dc_term_ops():
    rng = np.random.default_rng(0)
    spec = rng.standard_normal((3, 513, 16)).astype(np.float32)
    dropped = drop_dc_term(jnp.asarray(spec))
    assert dropped.shape == (3, 512, 16)
    restored = np.asarray(add_dc_term(dropped))
    assert restored.shape == spec.shape
    np.testing.assert_allclose(restored[:, 1:], spec[:, 1:], atol=1e-6)
    np.testing.assert_allclose(restored[:, 0], 0.0, atol=1e-6)


def test_melspectrogram_shape_and_energy():
    x = _rand_wave(t=44100)
    mel = np.asarray(
        melspectrogram(jnp.asarray(x), sample_rate=44100, n_fft=2048, hop_length=512, n_mels=128)
    )
    assert mel.shape[0] == 128
    assert np.isfinite(mel).all() and (mel >= 0).all()


def test_resample_sine_preserved():
    """Resampling a band-limited sine keeps frequency and amplitude."""
    sr_in, sr_out, f0 = 44100, 16000, 440.0
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x), sr_in, sr_out))
    assert abs(y.shape[-1] - sr_out) <= 1
    t2 = np.arange(y.shape[-1]) / sr_out
    ref = np.sin(2 * np.pi * f0 * t2)
    # ignore filter edge transients
    sl = slice(200, -200)
    np.testing.assert_allclose(y[sl], ref[sl], atol=5e-3)


def test_resample_matches_scipy_upfirdn_shape():
    x = _rand_wave(t=32000)
    y = np.asarray(resample(jnp.asarray(x), 16000, 44100))
    assert y.shape[-1] == int(np.ceil(44100 * 32000 / 16000))


def test_griffin_lim_reconstructs_sine():
    sr = 16000
    t = np.arange(sr // 2) / sr
    x = (0.7 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    spec = stft(jnp.asarray(x), n_fft=512, hop_length=128)
    mag = jnp.abs(spec)
    msp = complex_to_mag_inst_phase(spectrogram(jnp.asarray(x), n_fft=512, hop_length=128))
    y = np.asarray(
        griffin_lim(
            mag,
            init_phase_cos=msp[1],
            init_phase_sin=msp[2],
            n_fft=512,
            hop_length=128,
            n_iter=8,
            momentum=0.99,
            length=len(x),
        )
    )
    # with true phase init, GL should reproduce the signal nearly exactly
    np.testing.assert_allclose(y[500:-500], x[500:-500], atol=2e-2)
