"""Data layer: dataset, collates, tokenizer, prefetching pipeline."""

import numpy as np
import pytest

from t5_resnet_vqa_tpu.core import constants
from t5_resnet_vqa_tpu.data import (
    DaquarCnnCollate,
    DaquarDataset,
    DaquarVitCollate,
    DataLoader,
    HashTokenizer,
    Prefetcher,
    load_answer_spaces,
    make_synthetic_daquar,
)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("daquar"))
    root, kwargs = make_synthetic_daquar(root)
    return root, kwargs


def test_dataset_layout(synth):
    root, kwargs = synth
    ds = DaquarDataset(root, "train.csv", "images", "train")
    assert len(ds) == 16
    s = ds[0]
    assert s.question.image_id.startswith("image")
    assert s.image_path.endswith(".png")
    assert len(s.annotation.answers) >= 1
    # Annotation normalizes spaces to underscores (ref :34)
    assert all(" " not in a for a in s.annotation.answers)


def test_hash_tokenizer_contract():
    tok = HashTokenizer()
    texts = ["[Question] what is on the table",
             "[Question] what colour is the chair [Answer]"]
    ids, mask = tok(texts, constants.QUESTION_MAX_LEN)
    assert ids.shape == (2, 16) and mask.shape == (2, 16)
    # determinism
    ids2, _ = tok(texts, 16)
    np.testing.assert_array_equal(ids, ids2)
    # special tokens pinned in t5's 32100+ padding range, same word -> same id
    assert ids[0, 0] == constants.T5_FIRST_EXTRA_ID
    assert ids[1, 0] == constants.T5_FIRST_EXTRA_ID
    # sequences end with EOS then pads
    row = ids[0][mask[0] == 1]
    assert row[-1] == constants.EOS_TOKEN_ID
    assert (ids[0][mask[0] == 0] == constants.PAD_TOKEN_ID).all()
    # [Answer] special id is the registration-order slot
    assert constants.T5_FIRST_EXTRA_ID + 1 in ids[1]
    # every id fits the t5 embedding table
    assert int(ids.max()) < constants.T5_VOCAB_SIZE


def test_cnn_collate_shapes_and_ranges(synth):
    root, kwargs = synth
    ds = DaquarDataset(root, "train.csv", "images", "train")
    answers = load_answer_spaces(f"{root}/answer_spaces.txt")
    coll = DaquarCnnCollate(answers, seed=0)
    batch = coll([ds[i] for i in range(4)])

    assert batch["image_tensors"].shape == (4, 256, 256, 3)
    assert batch["image_tensors"].dtype == np.float32
    # ToTensor-only parity: values stay in [0,1], no normalization
    assert 0.0 <= batch["image_tensors"].min()
    assert batch["image_tensors"].max() <= 1.0
    assert batch["question_input_ids"].shape == (4, 16)
    assert batch["decoder_question_input_ids"].shape == (4, 20)
    assert batch["answer_input_ids"].shape == (4, 20)
    assert batch["annotation_ids"].shape == (4,)
    assert batch["annotation_ids"].max() < len(answers)


def test_vit_collate_normalized(synth):
    root, kwargs = synth
    ds = DaquarDataset(root, "test.csv", "images", "val")
    answers = load_answer_spaces(f"{root}/answer_spaces.txt")
    coll = DaquarVitCollate(answers, eval_mode=True, seed=0)
    batch = coll([ds[i] for i in range(3)])
    assert batch["pixel_values"].shape == (3, 224, 224, 3)
    # mean/std 0.5 normalization puts values in [-1, 1]
    assert batch["pixel_values"].min() >= -1.0 - 1e-6
    assert batch["pixel_values"].max() <= 1.0 + 1e-6
    # eval mode carries raw strings (ref :197-213)
    assert len(batch["answers"]) == 3
    assert len(batch["questions"]) == 3
    assert len(batch["image_fns"]) == 3


def test_oov_answer_falls_back_to_O(synth):
    """Unified OOV policy (ref ViT collate :149-153; CNN collate would
    crash — documented divergence)."""
    root, _ = synth
    ds = DaquarDataset(root, "train.csv", "images", "train")
    answers = ["O", "table"]
    coll = DaquarCnnCollate(answers, seed=0)
    s = ds[0]
    s.annotation.answers = ["definitely_not_in_space"]
    batch = coll([s])
    assert batch["annotation_ids"][0] == 0  # index of 'O'


def test_label_choice_reseeded_determinism(synth):
    root, _ = synth
    ds = DaquarDataset(root, "train.csv", "images", "train")
    answers = load_answer_spaces(f"{root}/answer_spaces.txt")
    b1 = DaquarCnnCollate(answers, seed=7)([ds[i] for i in range(8)])
    b2 = DaquarCnnCollate(answers, seed=7)([ds[i] for i in range(8)])
    np.testing.assert_array_equal(b1["annotation_ids"], b2["annotation_ids"])


def test_dataloader_static_shapes_and_padding(synth):
    root, _ = synth
    ds = DaquarDataset(root, "train.csv", "images", "train")
    answers = load_answer_spaces(f"{root}/answer_spaces.txt")
    coll = DaquarCnnCollate(answers, seed=0)

    # drop_remainder: 16 samples / bs 5 -> 3 batches
    dl = DataLoader(ds, coll, batch_size=5, drop_remainder=True)
    batches = list(dl)
    assert len(batches) == len(dl) == 3
    assert all(b["image_tensors"].shape[0] == 5 for b in batches)

    # padded last batch keeps static shape, _valid marks real rows
    dl = DataLoader(ds, coll, batch_size=5, drop_remainder=False)
    batches = list(dl)
    assert len(batches) == 4
    assert batches[-1]["image_tensors"].shape[0] == 5
    assert int(batches[-1]["_valid"]) == 1


def test_prefetcher_equivalence_and_error_propagation(synth):
    root, _ = synth
    ds = DaquarDataset(root, "train.csv", "images", "train")
    answers = load_answer_spaces(f"{root}/answer_spaces.txt")
    coll = DaquarCnnCollate(answers, seed=3)
    dl = DataLoader(ds, coll, batch_size=4, shuffle=True, seed=1)

    direct = [b["annotation_ids"] for b in dl]
    coll2 = DaquarCnnCollate(answers, seed=3)
    dl2 = DataLoader(ds, coll2, batch_size=4, shuffle=True, seed=1)
    prefetched = [b["annotation_ids"] for b in Prefetcher(dl2, 2)]
    for a, b in zip(direct, prefetched):
        np.testing.assert_array_equal(a, b)

    class Boom:
        def __iter__(self):
            raise RuntimeError("producer failed")

        def __len__(self):
            return 0

    with pytest.raises(RuntimeError, match="producer failed"):
        list(Prefetcher(Boom()))
