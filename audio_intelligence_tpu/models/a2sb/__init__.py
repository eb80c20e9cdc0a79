"""A2SB — Audio-to-Audio Schrödinger Bridge restoration, TPU-native.

Capabilities of the reference's A2SB project (44.1 kHz music bandwidth
extension + inpainting, diffusion bridge on STFT mag/inst-phase
spectrograms, hour-long audio via MultiDiffusion windowing), re-designed
as pure-functional JAX: bridge math as vectorized closed forms, the
sampler as one ``lax.scan`` with zero per-step host sync, MultiDiffusion
as batched window gather/scatter.
"""

from audio_intelligence_tpu.models.a2sb.bridge import BridgeSchedule
from audio_intelligence_tpu.models.a2sb.unet import AttnUNetF, sinusoidal_temporal_embedding
from audio_intelligence_tpu.models.a2sb.sampler import (
    bridge_sample,
    multidiffusion_vf,
    pad_for_multidiffusion,
)
from audio_intelligence_tpu.models.a2sb import corruption
