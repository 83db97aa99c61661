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
from .logging import ExperimentTracker, Logger

__all__ = [
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
