from .callbacks import Callbacks, CheckpointManager, EarlyStopping
from .factory import build_model, model_family
from .optimizer import build_optimizer, label_params, linear_schedule_with_warmup
from .trainer import VQATrainer

__all__ = [
    "VQATrainer", "build_model", "model_family",
    "build_optimizer", "label_params", "linear_schedule_with_warmup",
    "Callbacks", "EarlyStopping", "CheckpointManager",
]
