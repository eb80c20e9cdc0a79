"""Training utilities: EMA, schedules, checkpointing, NaN guards."""

from audio_intelligence_tpu.train.common import (
    ema_update,
    inverse_lr,
    logit_normal_sample,
    nan_safe_update,
)
