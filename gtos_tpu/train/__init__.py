from gtos_tpu.train.optim import inverse_sqrt_schedule, make_optimizer
from gtos_tpu.train.trainer import TrainState, Trainer, make_train_step

__all__ = [
    "inverse_sqrt_schedule", "make_optimizer",
    "TrainState", "Trainer", "make_train_step",
]
