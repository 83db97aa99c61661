"""Eval metrics: WUPS semantics (SURVEY §4 pinned behaviors) and ROUGE."""

import numpy as np
import pytest

from t5_resnet_vqa_tpu.eval import average_wups, wup_measure, wups_mode
from t5_resnet_vqa_tpu.eval.rouge import compute_rouge_metric, score


def test_wups_exact_match_is_one():
    assert wup_measure("table", "table") == 1.0
    assert wup_measure("red_chair", "red_chair") == 1.0


def test_wups_mode_is_real_scoring():
    # the vendored taxonomy guarantees Wu-Palmer math runs even without the
    # NLTK corpus (round-1 gap: exact-match fallback was silently active)
    assert wups_mode() in ("wordnet", "mini-wordnet")


def test_wups_mismatch():
    # below-threshold scores are downweighted x0.1 (ref :55-58)
    s = wup_measure("table", "chair")
    assert 0.0 < s < 0.925 * 0.1 + 1e-9 or s >= 0.925


def test_wups_unknown_words_zero():
    assert wup_measure("zzzqqq", "table") == 0.0


def test_wups_threshold_semantics():
    # dog/cat: carnivore LCS at depth 12 -> wup 0.857 < 0.925 -> x0.1
    raw = wup_measure("dog", "cat")
    assert raw == pytest.approx(0.857142857 * 0.1, abs=5e-3)


def test_wups_above_threshold_full_weight():
    # fridge IS-A refrigerator: wup 22/23 ~ 0.956 >= 0.925 -> no downweight
    s = wup_measure("fridge", "refrigerator")
    assert s >= 0.925


def test_wups_digit_and_spelled_numbers_match():
    # "2" is a lemma of two.n.01 -> same synset -> 1.0
    assert wup_measure("2", "two") == 1.0
    assert 0.0 < wup_measure("3", "4") < 0.925


def test_wups_multi_synset_most_optimistic():
    # "orange" has a fruit synset and a color synset; scoring takes the max
    vs_color = wup_measure("orange", "red")
    vs_fruit = wup_measure("orange", "apple")
    assert vs_color > 0.0 and vs_fruit > 0.0


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
