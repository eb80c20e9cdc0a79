"""audio_intelligence_tpu — a TPU-native audio-intelligence framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
NVIDIA/audio-intelligence:

- ``models.a2sb``  — Schrödinger-bridge music restoration (bandwidth
  extension + inpainting on 44.1 kHz STFT spectrograms).
- ``models.etta``  — latent-diffusion text-to-audio (Oobleck GAN-VAE codec +
  adaLN-Zero DiT, rectified-flow sampling with CFG/autoguidance).
- ``models.ualm``  — unified multi-stream audio language model
  (understanding + generation over a decoder-only LM).
- ``ops``          — the shared audio front-end (STFT/iSTFT, mel, resample,
  mag/phase codecs, Griffin-Lim, MR-STFT losses) as XLA/Pallas kernels.
- ``parallel``     — GSPMD mesh utilities (data/fsdp/tensor/expert axes)
  replacing the reference's DDP/DeepSpeed/NCCL stack.
- ``train``        — functional training loops, EMA, orbax checkpointing.
- ``data``         — manifests, token-budget batching, tar-shard readers.

Everything on the compute path is pure-functional JAX: sampling loops are
``lax.scan`` with no per-step host round-trips, training steps are single
jitted functions over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"
