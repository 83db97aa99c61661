from .collate import DaquarCnnCollate, DaquarVitCollate
from .daquar import Annotation, DaquarDataset, Question, Sample, load_answer_spaces
from .okvqa import OkVqaCollate, OKVQADataset
from .pipeline import DataLoader, Prefetcher
from .synthetic import make_synthetic_daquar
from .tokenizer import HashTokenizer, HFTokenizer, get_tokenizer

__all__ = [
    "DaquarDataset", "Question", "Annotation", "Sample", "load_answer_spaces",
    "DaquarCnnCollate", "DaquarVitCollate",
    "DataLoader", "Prefetcher",
    "OKVQADataset", "OkVqaCollate",
    "make_synthetic_daquar",
    "get_tokenizer", "HashTokenizer", "HFTokenizer",
]
