"""Bridge to the C++ data-loader extension (native/ait_native.cpp).

Falls back to numpy when the extension isn't built; both paths share the
same kernel bank (ops/resample.py) so numerics match.
Build once with: ``cd native && python setup.py build_ext --inplace``.
"""

from __future__ import annotations

import math

import numpy as np

try:  # built in-tree (native/) or installed
    import ait_native as _native
except ImportError:
    try:
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "native"))
        import ait_native as _native
    except ImportError:
        _native = None

from audio_intelligence_tpu.ops.resample import _resample_kernel_np

HAVE_NATIVE = _native is not None


def decode_pcm16(raw: bytes, channels: int) -> np.ndarray:
    """Interleaved PCM16 bytes → float32 [channels, samples]."""
    if _native is not None:
        return _native.decode_pcm16(raw, channels)
    audio = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    return audio.reshape(-1, channels).T.copy()


def resample(x: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """Host polyphase resample of [C, T] float32, matching ops.resample."""
    if orig_freq == new_freq:
        return x
    g = math.gcd(int(orig_freq), int(new_freq))
    orig, new = orig_freq // g, new_freq // g
    kernels, width = _resample_kernel_np(orig, new, 6, 0.99, None, "hann")
    target_len = int(math.ceil(new * x.shape[-1] / orig))
    if _native is not None:
        return _native.resample_poly(
            np.ascontiguousarray(x, np.float32),
            np.ascontiguousarray(kernels, np.float32),
            orig,
            width,
            target_len,
        )
    # numpy fallback: same math, vectorized
    c, t = x.shape
    kw = kernels.shape[1]
    xp = np.pad(x, ((0, 0), (width, width + orig)))
    n_blocks = (t + orig - 1) // orig + 1
    out = np.zeros((c, n_blocks * new), np.float32)
    for b in range(n_blocks):
        seg = xp[:, b * orig : b * orig + kw]
        if seg.shape[1] < kw:
            seg = np.pad(seg, ((0, 0), (0, kw - seg.shape[1])))
        out[:, b * new : (b + 1) * new] = seg @ kernels.T
    return out[:, :target_len]


def peak_normalize(x: np.ndarray, peak: float = 0.95) -> np.ndarray:
    if _native is not None and x.dtype == np.float32 and x.flags.c_contiguous:
        return _native.peak_normalize(x, peak)
    m = np.abs(x).max()
    return x * (peak / m) if m > 0 else x


class WavPrefetcher:
    """Threaded in-order WAV prefetch over (path, offset, size) byte ranges
    — the C++ equivalent of the reference's DataLoader workers
    (UALM tarball_reader.py + torch DataLoader num_workers): file IO and
    PCM16 decode run in native threads with the GIL released; iteration
    yields ``(sample_rate, float32 [C, T])`` in submission order with a
    bounded lookahead window.

    Pure-Python fallback (extension not built): a ThreadPoolExecutor with
    the same ordering contract.
    """

    def __init__(self, jobs, workers: int = 4, depth: int = 16):
        self._jobs = [(str(p), int(o), int(s)) for (p, o, s) in jobs]
        self._n = len(self._jobs)
        self._i = 0
        if _native is not None and hasattr(_native, "prefetch_start"):
            self._handle = _native.prefetch_start(self._jobs, workers, depth)
            self._pool = None
        else:
            import concurrent.futures as cf

            self._handle = None
            self._pool = cf.ThreadPoolExecutor(max_workers=workers)
            self._futures = [
                self._pool.submit(self._read_one, j) for j in self._jobs
            ]

    @staticmethod
    def _read_one(job):
        import io
        import wave

        path, offset, size = job
        with open(path, "rb") as f:
            f.seek(offset)
            buf = f.read(size)
        with wave.open(io.BytesIO(buf), "rb") as w:
            sr = w.getframerate()
            ch = w.getnchannels()
            raw = w.readframes(w.getnframes())
        audio = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
        return sr, audio.reshape(-1, ch).T.copy()

    def __iter__(self):
        return self

    def __next__(self):
        if self._i >= self._n:
            raise StopIteration
        self._i += 1
        if self._handle is not None:
            out = _native.prefetch_next(self._handle)
            if out is None:
                raise StopIteration
            return out
        return self._futures[self._i - 1].result()

    def close(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
        self._handle = None
