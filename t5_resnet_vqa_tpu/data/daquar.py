"""DAQUAR dataset: CSV reader + image-id -> filename map.

Parity with the reference DaquarDataset
(/root/reference/dataset_utils/resnet_vqa_daquar_dataset.py:17-89, duplicated
verbatim in vit_vqa_daquar_dataset.py — implemented once here): a pandas CSV
with columns ``image_id, question, answers_list`` (answers_list is a
python-literal string), an images dir scanned into an image_id -> filename
map, and per-item Question/Annotation records (answer spaces get
space->underscore normalization, ref :34).
"""

from __future__ import annotations

import ast
import dataclasses
import os
from typing import Dict, List

import pandas as pd


@dataclasses.dataclass
class Question:
    question_text: str
    question_id: str
    image_id: str

    def __str__(self) -> str:
        return (f"Id: {self.question_id}, Text: {self.question_text}, "
                f"Image_id: {self.image_id}")


@dataclasses.dataclass
class Annotation:
    question_id: str
    image_id: str
    answers: List[str]

    def __post_init__(self):
        self.answers = [a.replace(" ", "_") for a in self.answers]


@dataclasses.dataclass
class Sample:
    question: Question
    annotation: Annotation
    image_path: str


class DaquarDataset:
    """Map-style dataset over the DAQUAR csv."""

    def __init__(self, root_dir: str, csv_file_path: str, images_dir: str,
                 type: str = "train"):
        self.data = pd.read_csv(os.path.join(root_dir, csv_file_path))
        self.images_dir = os.path.join(root_dir, images_dir)
        self.type = type

        self.image_ids_to_fn: Dict[str, str] = {}
        for image_fn in os.listdir(self.images_dir):
            self.image_ids_to_fn[image_fn.split(".")[0]] = image_fn

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, idx: int) -> Sample:
        row = self.data.iloc[idx]
        image_id = str(row["image_id"])
        question = Question(
            question_text=str(row["question"]),
            question_id=f"{image_id}_{idx}_Question",
            image_id=image_id,
        )
        annotation = Annotation(
            question_id=f"{image_id}__{idx}_Question",
            image_id=image_id,
            answers=list(ast.literal_eval(row["answers_list"])),
        )
        image_fn = self.image_ids_to_fn[image_id]
        return Sample(question, annotation,
                      os.path.join(self.images_dir, image_fn))


def load_answer_spaces(path: str) -> List[str]:
    """Answer-space vocabulary file, one answer per line (entry script
    semantics, train_faster_rcnn_vqa.py:58-61 + collate strip,
    resnet_vqa_daquar_dataset.py:118)."""
    with open(path) as f:
        return [line.strip("\n") for line in f.readlines()]
