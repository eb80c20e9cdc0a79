"""a2sb restore CLI smoke: wav in → wav out on both precision paths.

Covers the argparse surface + transform chain + bridge scan + inverse
chain end-to-end (A2SB_upsample_api.py parity), including the int8 fast
path (channels-first IO, pallas attention in interpret mode on CPU).
"""

import wave

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # two full CLI runs with jit compiles


def _write_tone(path, seconds=0.6, sr=44100):
    t = np.arange(int(seconds * sr)) / sr
    wav = (
        0.3 * np.sin(2 * np.pi * 440 * t) + 0.1 * np.sin(2 * np.pi * 6000 * t)
    ).astype(np.float32)
    pcm = (wav * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


@pytest.mark.parametrize(
    "precision,hop,shift",
    [
        ("fp32", "16", "0"),
        ("int8", "16", "0"),
        # reference predict semantics: overlapped windows (hop = win/2,
        # A2SB_lightning_module.py:43-44) — now allowed on the int8 tile
        # path — and the per-step shifted-grid mode
        ("int8", "8", "0"),
        ("int8", "16", "8"),
    ],
)
def test_restore_cli_smoke(tmp_path, precision, hop, shift):
    from cli.a2sb_restore import main

    inp = tmp_path / "in.wav"
    out = tmp_path / "out.wav"
    _write_tone(inp)
    main([
        "-f", str(inp), "-o", str(out),
        "--task", "upsample", "--n_steps", "2",
        "--win_length", "16", "--hop_length", hop, "--chunk_size", "4",
        "--cutoff_freq", "4000", "--precision", precision,
        "--window_shift", shift,
    ])
    assert out.exists()
    with wave.open(str(out), "rb") as f:
        assert f.getframerate() == 44100
        n = f.getnframes()
        raw = np.frombuffer(f.readframes(n), "<i2")
    assert n > 0 and np.isfinite(raw.astype(np.float32)).all()
