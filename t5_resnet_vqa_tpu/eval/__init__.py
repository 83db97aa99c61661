from .session import VQAInferenceSession
from .wups import average_wups, batch_wups, wup_measure, wups_mode

__all__ = ["wup_measure", "batch_wups", "average_wups", "wups_mode",
           "VQAInferenceSession"]
