"""Training harness: jitted train step, optimizers, checkpointing, logging."""

from .trainer import (
    TrainConfig,
    TrainState,
    init_train_state,
    make_optimizer,
    make_train_step,
)
