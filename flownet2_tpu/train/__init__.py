"""Training: optimizers, sharded steps, epoch driver."""

from .optim import LRSchedule, OPTIMIZERS, get_optimizer  # noqa: F401
from .state import StepFactory, TrainState  # noqa: F401
from .trainer import Trainer, TrainerConfig  # noqa: F401
