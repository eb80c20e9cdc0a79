"""WAV read/write without external deps.

The image has no soundfile/librosa/torchaudio; restoration and generation
CLIs need wav in/out, so this implements PCM16/24/32 + float32 WAV via the
stdlib ``wave``/``struct`` modules (soundfile is used when available).
"""

from __future__ import annotations

import struct
import wave

import numpy as np


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Returns (audio [channels, samples] float32 in [-1, 1], sample_rate)."""
    try:
        import soundfile as sf  # pragma: no cover - not in this image

        data, sr = sf.read(path, always_2d=True, dtype="float32")
        return data.T, sr
    except ImportError:
        pass

    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        audio = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif width == 4:
        audio = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    elif width == 3:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
        vals = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        vals = np.where(vals >= 2**23, vals - 2**24, vals)
        audio = vals.astype(np.float32) / float(2**23)
    elif width == 1:
        audio = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    return audio.reshape(-1, ch).T, sr


def write_wav(path: str, sample_rate: int, audio: np.ndarray) -> None:
    """audio: [samples] or [channels, samples] float in [-1, 1] → PCM16."""
    audio = np.asarray(audio, np.float32)
    if audio.ndim == 1:
        audio = audio[None]
    pcm = np.clip(audio.T * 32767.0, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(audio.shape[0])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
