from . import constants
from .config import (
    CallbacksConfig,
    Config,
    DatasetConfig,
    LRSchedulerConfig,
    ModelConfig,
    OptimizerConfig,
    ParallelConfig,
    TrainerConfig,
)
from .device import select_device
from .logging import ExperimentTracker, Logger

__all__ = [
    "select_device",
    "constants",
    "Config",
    "ModelConfig",
    "DatasetConfig",
    "TrainerConfig",
    "OptimizerConfig",
    "LRSchedulerConfig",
    "CallbacksConfig",
    "ParallelConfig",
    "Logger",
    "ExperimentTracker",
]
