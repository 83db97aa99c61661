"""Generate the committed WUPS golden table (tests/goldens/wups_goldens.json).

Pins the metric the framework will actually score with in this image
(eval/wups.py mini-wordnet tier) over the ENTIRE vendored DAQUAR answer
vocabulary (data/daquar_vocab.py): any chain edit that changes any pair's
score fails tests/test_eval.py::test_wups_golden_table until this tool is
re-run and the diff reviewed.

Two layers:
  * sha256 digest of the full ordered-pair matrix (scores rounded to 6dp)
    — catches every drift at ~60 bytes committed;
  * explicit values for a deterministic sample of pairs plus every pair
    whose score is >= 0.5 (the semantically-close pairs a reviewer would
    want to eyeball), so a digest mismatch is debuggable from the JSON.

The reference metric is NLTK WordNet 3.0 (reference wup_measure.py:46-58).
This zero-egress image has no WordNet corpus anywhere on disk (verified:
only nltk source files exist), so true NLTK goldens cannot be generated
here; this table pins the vendored approximation instead and documents the
divergence surface. Where WordNet 3.0 paths are known exactly (dog/cat
0.857142..., digit/spelled number lemma identity) tests assert those values
directly.
"""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from t5_resnet_vqa_tpu.data import daquar_vocab
from t5_resnet_vqa_tpu.eval.wups import wup_measure, wups_mode


def main():
    assert wups_mode() == "mini-wordnet", (
        f"goldens must be generated in mini-wordnet mode, got {wups_mode()}")
    words = sorted(set(daquar_vocab.ANSWER_WORDS))
    h = hashlib.sha256()
    explicit = {}
    n = 0
    for i, a in enumerate(words):
        for b in words:
            s = round(wup_measure(a, b), 6)
            h.update(f"{a}|{b}|{s:.6f};".encode())
            n += 1
            # all close pairs + a deterministic 1-in-97 sample of the rest
            if a != b and (s >= 0.5 or (i * len(words) + words.index(b)) % 97 == 0):
                explicit[f"{a}|{b}"] = s
    out = {
        "n_words": len(words),
        "n_pairs": n,
        "matrix_sha256": h.hexdigest(),
        "mode": wups_mode(),
        "explicit": explicit,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens", "wups_goldens.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"{len(words)} words, {n} pairs, {len(explicit)} explicit "
          f"-> {path}")


if __name__ == "__main__":
    main()
