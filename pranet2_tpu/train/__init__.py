from pranet2_tpu.train.optim import make_optimizer, step_decay_schedule
from pranet2_tpu.train.state import TrainState, create_train_state

__all__ = [
    "make_optimizer",
    "step_decay_schedule",
    "TrainState",
    "create_train_state",
]
