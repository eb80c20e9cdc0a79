"""Data plane: manifests, token-budget batching, resumable batch plans,
tar-shard readers, WAV I/O."""

from audio_intelligence_tpu.data.batching import batchfy_bucket, batchfy_pack, batchfy
from audio_intelligence_tpu.data.audio_io import read_wav, write_wav
