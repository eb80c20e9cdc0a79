"""Shared audio front-end ops (TPU-first, XLA/Pallas).

This package unifies the three per-project audio front-ends of the reference
(A2SB ``audio_transforms/transforms.py``, ETTA ``stable_audio_tools`` data
utils, UALM feature extractors) into one set of pure-functional JAX ops.
"""

from audio_intelligence_tpu.ops.stft import (
    stft,
    istft,
    spectrogram,
    inverse_spectrogram,
    frame_signal,
    hann_window,
)
from audio_intelligence_tpu.ops.mel import mel_filterbank, melspectrogram, log_mel_whisper
from audio_intelligence_tpu.ops.resample import resample
from audio_intelligence_tpu.ops.phase import (
    complex_to_mag_inst_phase,
    mag_inst_phase_to_complex,
    svd_fix_mag_inst_phase,
    power_scale_spectrogram,
    drop_dc_term,
    add_dc_term,
)
from audio_intelligence_tpu.ops.griffinlim import griffin_lim
