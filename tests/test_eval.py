"""Eval metrics: WUPS semantics (SURVEY §4 pinned behaviors) and ROUGE."""

import numpy as np
import pytest

from t5_resnet_vqa_tpu.eval import average_wups, wup_measure, wups_mode
from t5_resnet_vqa_tpu.eval.rouge import compute_rouge_metric, score


def test_wups_exact_match_is_one():
    assert wup_measure("table", "table") == 1.0
    assert wup_measure("red_chair", "red_chair") == 1.0


def test_wups_mismatch():
    s = wup_measure("table", "chair")
    if wups_mode() == "wordnet":
        # below-threshold scores are downweighted x0.1 (ref :55-58)
        assert 0.0 < s < 0.925 * 0.1 + 1e-9 or s >= 0.925
    else:
        assert s == 0.0


def test_wups_unknown_words_zero():
    assert wup_measure("zzzqqq", "table") == 0.0


@pytest.mark.skipif(wups_mode() != "wordnet", reason="wordnet corpus absent")
def test_wups_threshold_semantics():
    # dog/cat wup ~0.86 < 0.925 -> x0.1
    raw = wup_measure("dog", "cat")
    assert raw < 0.0925 + 1e-9


def test_average_wups():
    assert average_wups(["a", "b"], ["a", "c"]) == pytest.approx(0.5)
    assert average_wups([], []) == 0.0


def test_rouge_identical_text():
    s = score("red table", "red table")
    for key in ("rouge1", "rouge2", "rougeL"):
        assert s[key]["fmeasure"] == pytest.approx(1.0)


def test_rouge_partial_overlap():
    s = score("the red table", "red chair")
    assert s["rouge1"]["precision"] == pytest.approx(1 / 2)
    assert s["rouge1"]["recall"] == pytest.approx(1 / 3)
    assert s["rouge2"]["fmeasure"] == 0.0
    assert 0 < s["rougeL"]["fmeasure"] < 1


def test_compute_rouge_metric_reference_signature():
    answers = ["table", "red_chair", "lamp"]
    _, overall = compute_rouge_metric([0, 1, 2], [0, 1, 1], answers)
    assert overall["rouge1"]["fmeasure"] == pytest.approx(2 / 3, abs=1e-6)
    assert set(overall.keys()) == {"rouge1", "rouge2", "rougeL"}
