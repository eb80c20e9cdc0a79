"""Audio IO implementations for UALM.

- DiscreteAudioIO: multi-stream codec tokens via the JAX RVQ codec
  (UALM/models/ualm/multimodal_io/audio.py:68-871 semantics — per-stream
  vocab with a leading per-stream pad token, +offset+1 when mapping codec
  ids into the IO vocab, delay interleaving, placeholder preprocess with
  raw audio as a continuous feature, GPU/TPU-side encode_batch).
- ContinuousAudioIO: dense features from the Whisper-style tower
  (:873-1263 — resample→mono→truncate, fixed-frame mel, 2-conv + pool
  length math), projected into the LM by its adaptor.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from audio_intelligence_tpu.models.ualm.abs_io import AbsIO
from audio_intelligence_tpu.models.ualm.interleave import (
    delay_interleave,
    delay_deinterleave,
)
from audio_intelligence_tpu.models.ualm.codec import RVQCodec
from audio_intelligence_tpu.models.ualm.whisper_tower import (
    WhisperTower,
    WhisperTowerConfig,
    feat_extract_output_length,
)
from audio_intelligence_tpu.ops.mel import log_mel_whisper
from audio_intelligence_tpu.ops.resample import resample


class KmeansQuantizer:
    """Nearest-centroid SSL token quantizer (audio.py KmeansModel:28-66):
    ids = argmin ‖x − C‖² computed as x² − 2xC + C² on device. Centroids
    load from .npy/.npz ([K, D]) or, gated, a joblib sklearn KMeans."""

    def __init__(self, centroids):
        c = jnp.asarray(centroids, jnp.float32)  # [K, D]
        self._ct = c.T  # [D, K]
        self._cnorm = jnp.sum(c * c, axis=-1)[None, None, :]  # [1, 1, K]
        self.n_clusters = c.shape[0]

    @classmethod
    def from_file(cls, km_path: str) -> "KmeansQuantizer":
        if km_path.endswith((".npy", ".npz")):
            arr = np.load(km_path)
            if hasattr(arr, "files"):
                arr = arr[arr.files[0]]
            return cls(arr)
        import joblib  # gated: sklearn pickles (reference km_path format)

        return cls(joblib.load(km_path).cluster_centers_)

    def __call__(self, feats: jax.Array) -> jax.Array:
        """[B, T, D] → [B, T] cluster ids."""
        dist = (
            jnp.sum(feats * feats, -1, keepdims=True)
            - 2.0 * (feats @ self._ct.astype(feats.dtype))
            + self._cnorm
        )
        return jnp.argmin(dist, axis=-1)


def mel_ssl_features(wav: jax.Array, frame_shift: int, n_mels: int = 80):
    """Offline stand-in for the XEUS SSL encoder (espnet2 is not in this
    image): log-mel features at the codec frame rate. Same contract as the
    gated XEUS path ([B, frames, D] aligned to codec frames)."""
    from audio_intelligence_tpu.ops.mel import mel_filterbank
    from audio_intelligence_tpu.ops.stft import stft

    b, t = wav.shape
    n_fft = max(512, 2 * frame_shift)
    spec = jnp.abs(
        stft(wav.reshape(b, t), n_fft=n_fft, hop_length=frame_shift)
    )  # [B, F, frames+1]
    fb = mel_filterbank(n_fft // 2 + 1, n_mels=n_mels, sample_rate=16000)
    mel = jnp.log(jnp.einsum("fm,bft->btm", fb.astype(spec.dtype), spec) + 1e-5)
    return mel[:, : t // frame_shift]


class DiscreteAudioIO(AbsIO):
    modality = "audio"
    is_discrete = True

    def __init__(
        self,
        codec: RVQCodec | None = None,
        codec_variables=None,
        n_streams: int = 8,
        codebook_size: int = 1024,
        sample_rate: int = 16000,
        frame_shift: int = 320,
        stream_weights: Optional[List[float]] = None,
        use_delay_interleave: bool = True,
        ssl_quantizer: "KmeansQuantizer | None" = None,
        ssl_feature_fn=None,
    ):
        """ssl_quantizer + ssl_feature_fn enable the SSL branch
        (audio.py:257-296): one extra token stream, quantized SSL features
        concatenated BEFORE the codec streams at the same frame rate
        (fps-match sanity check, audio.py:301). ssl_feature_fn defaults to
        ``mel_ssl_features`` when only a quantizer is given; the XEUS tower
        itself is gated (espnet2 not in image)."""
        self.codec = codec
        self.codec_variables = codec_variables
        self.n_codec_streams = n_streams
        self.codebook_size = codebook_size
        self.sample_rate = sample_rate
        self.frame_shift = frame_shift
        self.delay_interleave = use_delay_interleave
        self.ssl_quantizer = ssl_quantizer
        if ssl_quantizer is not None and ssl_feature_fn is None:
            ssl_feature_fn = lambda w: mel_ssl_features(w, frame_shift)
        self.ssl_feature_fn = ssl_feature_fn
        self.n_ssl_streams = 1 if ssl_quantizer is not None else 0
        self.n_streams = self.n_ssl_streams + n_streams
        self.stream_weights = stream_weights or [1.0 / self.n_streams] * self.n_streams

        # per-stream vocab: leading pad + entries; SSL streams first
        # (audio.py:416-492 SSL‖codec concat order)
        self._stream_intervals = []
        offset = 0
        self.vocabulary: List[str] = []
        if self.n_ssl_streams:
            k = ssl_quantizer.n_clusters
            self._stream_intervals.append((offset, offset + k + 1))
            offset += k + 1
            self.vocabulary.append("<ssl_pad>")
            self.vocabulary.extend(f"<ssl_{i}>" for i in range(k))
        for s in range(n_streams):
            self._stream_intervals.append((offset, offset + codebook_size + 1))
            offset += codebook_size + 1
            self.vocabulary.append(f"<codec_layer{s}_pad>")
            self.vocabulary.extend(
                f"<codec_layer{s}_{i}>" for i in range(codebook_size)
            )

    # -- contract --

    def num_stream(self) -> int:
        return self.n_streams

    def get_vocabulary(self):
        return self.vocabulary

    def get_stream_interval(self):
        return self._stream_intervals

    def get_stream_weight(self):
        return self.stream_weights

    def find_length(self, data) -> int:
        wav, sr = data
        n = wav.shape[-1]
        if sr != self.sample_rate:
            n = int(np.ceil(n * self.sample_rate / sr))
        frames = n // self.frame_shift
        if self.delay_interleave:
            frames += self.n_streams - 1
        return frames

    def preprocess(self, data):
        """(wav [C, T], sr) → pad placeholders + raw audio conti_feat
        (audio.py:688-720)."""
        wav, sr = data
        wav = np.asarray(wav, np.float32)
        if wav.ndim > 1:
            wav = wav[0:1]
        else:
            wav = wav[None]
        if sr != self.sample_rate:
            wav = np.asarray(resample(jnp.asarray(wav), sr, self.sample_rate))
        length = self.find_length((wav, self.sample_rate))
        paddings = np.zeros((length, self.n_streams), np.int64)
        loss_mask = np.ones((length, self.n_streams), np.float32) * np.asarray(
            self.stream_weights, np.float32
        ).reshape(1, -1)
        return paddings, (length, wav.T), loss_mask

    def copy_for_worker(self):
        """Worker copies skip device weights (audio.py:810-871)."""
        worker = DiscreteAudioIO(
            codec=None,
            codec_variables=None,
            n_streams=self.n_codec_streams,
            codebook_size=self.codebook_size,
            sample_rate=self.sample_rate,
            frame_shift=self.frame_shift,
            stream_weights=self.stream_weights,
            use_delay_interleave=self.delay_interleave,
        )
        # preserve the SSL vocabulary layout without device weights
        worker.n_ssl_streams = self.n_ssl_streams
        worker.n_streams = self.n_streams
        worker._stream_intervals = self._stream_intervals
        worker.vocabulary = self.vocabulary
        return worker

    # -- device side --

    def encode_batch(self, feats: jax.Array, lengths: jax.Array) -> jax.Array:
        """[B, T, 1] waveforms → interleaved IO-local codes [B, frames(+S−1), S].

        Matches audio.py:416-492: frame-align lengths, codec encode, per-
        stream +offset+1 (slot 0 is the stream pad), delay interleave.
        """
        assert self.codec is not None, "worker copy cannot encode"
        wav = feats[..., 0]
        frame_lengths = lengths // self.frame_shift
        max_frames = wav.shape[1] // self.frame_shift

        codes = self.codec.apply(
            self.codec_variables, wav[:, : max_frames * self.frame_shift],
            method=type(self.codec).encode,
        )  # [B, frames, S_codec] — any codec with the RVQCodec contract
        # plugs in here, incl. the converted-weights XcodecFlax
        # (models/ualm/xcodec.py), the reference's actual tokenizer
        if self.n_ssl_streams:
            feats = self.ssl_feature_fn(wav[:, : max_frames * self.frame_shift])
            ssl_ids = self.ssl_quantizer(feats)[:, : codes.shape[1]]  # [B, frames]
            codes = jnp.concatenate([ssl_ids[..., None], codes], axis=-1)

        # positions past each sample's length take the per-stream pad (idx 0
        # of each interval → after offset math, exactly offset_start)
        frame_idx = jnp.arange(codes.shape[1])[None, :, None]
        valid = frame_idx < frame_lengths[:, None, None]
        offsets = jnp.asarray([s for s, _ in self._stream_intervals])
        codes = jnp.where(valid, codes + offsets[None, None, :] + 1, offsets[None, None, :])

        if self.delay_interleave:
            codes = self._interleave_jax(codes, offsets)
        return codes

    def _interleave_jax(self, codes: jax.Array, pads: jax.Array) -> jax.Array:
        b, t, n = codes.shape
        out = jnp.broadcast_to(pads[None, None, :], (b, t + n - 1, n))
        for i in range(n):
            out = out.at[:, i : i + t, i].set(codes[:, :, i])
        return out

    def decode_batch(self, codes, lengths=None):
        """Interleaved IO-local codes → waveform (audio.py:494-543)."""
        assert self.codec is not None, "worker copy cannot decode"
        codes = np.asarray(codes)
        if self.delay_interleave:
            codes = delay_deinterleave(codes)
            if lengths is not None:
                lengths = lengths - self.n_streams + 1
        offsets = np.asarray([s for s, _ in self._stream_intervals])
        local = codes - offsets[None, None, :] - 1
        # negative codes (pads / out of range) clamp to 0 (audio.py:577-581)
        local = np.clip(local, 0, self.codebook_size - 1)
        # SSL streams carry no waveform information — codec decode uses the
        # codec streams only (audio.py:494-543 strips them the same way)
        local = local[..., self.n_ssl_streams :]
        wav = self.codec.apply(
            self.codec_variables, jnp.asarray(local),
            method=type(self.codec).decode,
        )
        return wav, (lengths * self.frame_shift if lengths is not None else None), self.sample_rate


class ContinuousAudioIO(AbsIO):
    """Dense audio features for understanding inputs. Two encoder types,
    mirroring the reference's encoder_choice (audio.py:929-1006):
    "afwhisper" (local AF-Whisper tower) and "qwen_omni" (the Qwen2.5-Omni
    thinker audio tower — windowed attention, output_dim projection)."""

    modality = "audio"
    is_discrete = False

    def __init__(
        self,
        tower=None,
        tower_variables=None,
        cfg=None,
        sample_rate: int = 16000,
        max_seconds: float = 30.0,
        hop_length: int = 160,
        n_fft: int = 400,
        encoder_type: str = "afwhisper",
    ):
        from audio_intelligence_tpu.models.ualm.omni_tower import (
            OmniAudioTower,
            OmniTowerConfig,
        )

        if tower is not None and isinstance(tower, OmniAudioTower):
            encoder_type = "qwen_omni"
        self.encoder_type = encoder_type
        self.tower = tower
        self.tower_variables = tower_variables
        if cfg is None:
            if tower is not None:
                cfg = tower.cfg
            elif encoder_type == "qwen_omni":
                cfg = OmniTowerConfig()
            else:
                cfg = WhisperTowerConfig()
        self.cfg = cfg
        self.sample_rate = sample_rate
        self.max_samples = int(max_seconds * sample_rate)
        self.hop_length = hop_length
        self.n_fft = n_fft

    def feature_dim(self) -> int:
        if self.encoder_type == "qwen_omni":
            return self.cfg.output_dim
        return self.cfg.d_model

    def _mel_frames(self, n_samples: int) -> int:
        # whisper drops the final frame (ops.log_mel_whisper)
        return n_samples // self.hop_length

    def find_length(self, data) -> int:
        wav, sr = data
        n = wav.shape[-1]
        if sr != self.sample_rate:
            n = int(np.ceil(n * self.sample_rate / sr))
        n = min(n, self.max_samples)
        frames = self._mel_frames(n)
        if self.encoder_type == "qwen_omni":
            # conv stride-2 ceil then ×2 avg-pool floor (Omni tower math)
            return max(((frames - 1) // 2 + 1) // 2, 1)
        # conv stride-2 + avgpool ×2 (audio.py:1092-1095 length math)
        return max(feat_extract_output_length(frames), 1)

    def preprocess(self, data):
        """(wav, sr) → zero token placeholders + (length, mel) conti_feat."""
        wav, sr = data
        wav = np.asarray(wav, np.float32)
        if wav.ndim > 1:
            wav = wav.mean(axis=0)
        if sr != self.sample_rate:
            wav = np.asarray(resample(jnp.asarray(wav), sr, self.sample_rate))
        wav = wav[: self.max_samples]
        mel = np.asarray(
            log_mel_whisper(
                jnp.asarray(wav), n_fft=self.n_fft, hop_length=self.hop_length,
                n_mels=self.cfg.n_mels, sample_rate=self.sample_rate,
            )
        )  # [n_mels, frames]
        length = self.find_length((wav, self.sample_rate))
        seq = np.zeros((length, 1), np.int64)
        loss_mask = np.zeros((length, 1), np.float32)  # inputs carry no loss
        return seq, (length, mel.T), loss_mask

    def copy_for_worker(self):
        return ContinuousAudioIO(
            tower=None, tower_variables=None, cfg=self.cfg,
            sample_rate=self.sample_rate,
            max_seconds=self.max_samples / self.sample_rate,
            hop_length=self.hop_length, n_fft=self.n_fft,
            encoder_type=self.encoder_type,
        )

    def encode_batch(self, feats: jax.Array, lengths: jax.Array) -> jax.Array:
        """[B, frames, n_mels] mel batches → tower features [B, L, D].

        lengths are MEL-frame lengths; the omni path pads the frame axis
        to the tower's 2·n_window chunking and returns features already
        zeroed past each sample's output length."""
        assert self.tower is not None, "worker copy cannot encode"
        mel = jnp.swapaxes(feats, -1, -2)
        if self.encoder_type == "qwen_omni":
            w = 2 * self.cfg.n_window
            pad = (-mel.shape[-1]) % w
            if pad:
                mel = jnp.pad(mel, ((0, 0), (0, 0), (0, pad)))
            out, _ = self.tower.apply(self.tower_variables, mel, lengths)
            return out
        frame_mask = jnp.arange(mel.shape[-1])[None, :] < lengths[:, None]
        return self.tower.apply(self.tower_variables, mel, frame_mask)
