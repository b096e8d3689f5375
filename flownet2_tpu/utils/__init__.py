"""Run tooling: timers, metric logging, progress."""

from .tensorboard import SummaryWriter  # noqa: F401
from .tools import (  # noqa: F401
    IteratorTimer,
    MetricLogger,
    TimerBlock,
    format_dictionary_of_losses,
    gpumemusage,
    progress,
)
