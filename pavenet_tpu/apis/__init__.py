from .train import (
    TrainState,
    build_optimizer,
    create_train_state,
    make_train_step,
    step_lr_schedule,
)

__all__ = [
    "TrainState", "build_optimizer", "create_train_state",
    "make_train_step", "step_lr_schedule",
]
