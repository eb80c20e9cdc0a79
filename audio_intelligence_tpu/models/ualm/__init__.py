"""UALM — Unified Audio Language Model, TPU-native.

Capabilities of the reference's UALM project: a decoder-only LM (Qwen-
style) extended with parallel multi-stream heads over a unified
text+audio vocabulary, discrete audio IO (RVQ codec tokens with delay
interleaving) and continuous audio IO (Whisper-style tower + adaptor),
chat-template preprocessing with per-role loss regions, CFG-dropout
training, and KV-cached autoregressive inference with CFG and restricted
decoding. GSPMD-sharded prefill/decode replaces DeepSpeed.
"""

from audio_intelligence_tpu.models.ualm.vocab import build_vocabulary, SPECIAL_TOKENS
from audio_intelligence_tpu.models.ualm.interleave import (
    delay_interleave,
    delay_deinterleave,
)
