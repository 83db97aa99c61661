"""Legacy OK-VQA path (reference dataset_utils/dataset.py C13 — the working
version; the reference's is dead code with an image_fns typo crash)."""

import os

import numpy as np
import pytest

from t5_resnet_vqa_tpu.core import constants
from t5_resnet_vqa_tpu.data.okvqa import OkVqaCollate, OKVQADataset
from t5_resnet_vqa_tpu.data.synthetic import _write_png


@pytest.fixture(scope="module")
def okvqa_root(tmp_path_factory, rng):
    root = tmp_path_factory.mktemp("okvqa")
    images = root / "images"
    images.mkdir()
    image_ids = [17, 4200]
    for iid in image_ids:
        arr = np.random.default_rng(iid).integers(
            0, 256, size=(48, 64, 3), dtype=np.uint8)
        _write_png(str(images / f"COCO_train2014_{iid:012d}.png"), arr)

    questions = {"questions": [
        {"question_id": 1, "image_id": 17, "question": "what brand is this"},
        {"question_id": 2, "image_id": 4200, "question": "what animal"},
    ]}
    annotations = {"annotations": [
        {"question_id": 1, "image_id": 17,
         "question_type": "two",
         "answers": [{"answer": f"brand{i}"} for i in range(10)],
         "answer_type": "other"},
        {"question_id": 2, "image_id": 4200,
         "question_type": "eight",
         "answers": [{"answer": "dog"}] * 10,
         "answer_type": "other"},
    ]}
    return str(root / "images"), questions, annotations


def test_okvqa_dataset_coco_filename_parsing(okvqa_root):
    images_dir, questions, annotations = okvqa_root
    ds = OKVQADataset(annotations, questions, images_dir, type="train")
    assert len(ds) == 2
    s = ds[0]
    assert s.question.image_id == 17
    assert s.image_path.endswith("COCO_train2014_000000000017.png")
    assert s.annotation.question_type == "two"
    assert len(s.annotation.answers) == 10


def test_okvqa_collate_shapes(okvqa_root):
    images_dir, questions, annotations = okvqa_root
    ds = OKVQADataset(annotations, questions, images_dir, type="train")
    coll = OkVqaCollate(resizing_dimensions=(64, 64), eval_mode=True)
    batch = coll([ds[0], ds[1]])
    # [bs, 10 answers, MAX_LEN] annotation grid (ref dataset.py:178)
    assert batch["annotation_ids"].shape == (
        2, constants.ANSWERS_PER_QUESTION, constants.MAX_LEN)
    assert batch["image_tensors"].shape == (2, 64, 64, 3)
    assert batch["question_type_ids"].tolist() == [
        constants.QUESTION_TYPE_TO_IDS["two"],
        constants.QUESTION_TYPE_TO_IDS["eight"]]
    assert batch["question_input_ids"].shape == (2, constants.MAX_LEN)
    assert len(batch["answers"]) == 2
