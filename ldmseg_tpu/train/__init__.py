from .optim import make_optimizer, make_lr_schedule
from .state import TrainState

__all__ = ["make_optimizer", "make_lr_schedule", "TrainState"]
