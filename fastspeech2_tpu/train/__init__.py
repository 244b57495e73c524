"""Training: Noam optimizer, jitted data-parallel train step, checkpointing,
metrics."""

from fastspeech2_tpu.train.optimizer import make_optimizer, noam_schedule  # noqa: F401
from fastspeech2_tpu.train.step import TrainState, make_train_step  # noqa: F401
