from .collate import DaquarCnnCollate, DaquarVitCollate
from .daquar import Annotation, DaquarDataset, Question, Sample, load_answer_spaces
from .okvqa import OkVqaCollate, OKVQADataset, OkVqaTrainableDataset
from .pipeline import DataLoader, Prefetcher
from .synthetic import make_synthetic_daquar, make_synthetic_okvqa
from .tokenizer import HashTokenizer, HFTokenizer, get_tokenizer

__all__ = [
    "DaquarDataset", "Question", "Annotation", "Sample", "load_answer_spaces",
    "DaquarCnnCollate", "DaquarVitCollate",
    "DataLoader", "Prefetcher",
    "OKVQADataset", "OkVqaCollate",
    "make_synthetic_daquar",
    "make_synthetic_okvqa",
    "OkVqaTrainableDataset",
    "get_tokenizer", "HashTokenizer", "HFTokenizer",
]
