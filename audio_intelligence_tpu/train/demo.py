"""Demo callbacks: periodic audio/spectrogram logging.

The reference logs generated audio + spectrograms to TensorBoard every
``demo_every`` steps from every training wrapper
(ETTA training/diffusion.py:711-897, training/autoencoders.py:391-478,
A2SB A2SB_lightning_module.py:479-531). This is the framework-free
equivalent: a callable that renders demos and writes TB events (when
tensorboard is importable) plus wav files on disk either way.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

from audio_intelligence_tpu.data.audio_io import write_wav


def spectrogram_image(wav: np.ndarray, sr: int, n_fft: int = 1024, hop: int = 256):
    """Log-magnitude spectrogram as a [H, W, 3] uint8 image
    (plotting_utils.plot_spec_to_numpy analogue, matplotlib-free)."""
    import jax.numpy as jnp

    from audio_intelligence_tpu.ops.stft import stft

    mag = np.abs(np.asarray(stft(jnp.asarray(wav), n_fft=n_fft, hop_length=hop)))
    db = 20 * np.log10(np.maximum(mag, 1e-6))
    db = np.clip((db - db.max() + 80) / 80, 0, 1)[::-1]
    img = (db * 255).astype(np.uint8)
    return np.stack([img, img, img], axis=-1)


@dataclass
class DemoCallback:
    """Render + log demos every ``demo_every`` steps."""

    demo_fn: Callable[[int], dict]  # step -> {name: (wav [T] or [C,T], sr)}
    demo_every: int = 10000
    out_dir: str = "demos"
    tb_logdir: Optional[str] = None

    def __post_init__(self):
        self._writer = None
        if self.tb_logdir is not None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._writer = SummaryWriter(self.tb_logdir)
            except Exception:
                self._writer = None

    def maybe_run(self, step: int):
        if step % self.demo_every != 0 or step == 0:
            return
        os.makedirs(self.out_dir, exist_ok=True)
        demos = self.demo_fn(step)
        for name, (wav, sr) in demos.items():
            wav = np.asarray(wav)
            path = os.path.join(self.out_dir, f"{name}_step{step}.wav")
            write_wav(path, sr, wav)
            if self._writer is not None:
                mono = wav if wav.ndim == 1 else wav.mean(axis=0)
                self._writer.add_audio(name, mono[None, :], step, sample_rate=sr)
                self._writer.add_image(
                    f"{name}_spec",
                    spectrogram_image(mono, sr),
                    step,
                    dataformats="HWC",
                )
        if self._writer is not None:
            self._writer.flush()
