"""ETTA — Elucidated Text-To-Audio, TPU-native.

Capabilities of the reference's ETTA project (stable_audio_tools fork):
the Oobleck GAN-VAE waveform codec (×2048 downsample, 64-dim latent,
stereo 44.1 kHz), the adaLN-Zero ETTA-DiT latent-diffusion transformer
with T5 cross-attention conditioning, rectified-flow/v-objective samplers
with CFG(+rescale)/autoguidance, and the GAN + MR-STFT + KL multi-
optimizer VAE training loop.
"""

from audio_intelligence_tpu.models.etta.vae import (
    OobleckEncoder,
    OobleckDecoder,
    AudioAutoencoder,
)
from audio_intelligence_tpu.models.etta.bottleneck import (
    vae_sample,
    VAEBottleneck,
    TanhBottleneck,
)
