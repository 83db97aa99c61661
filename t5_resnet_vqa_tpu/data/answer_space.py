"""Answer-space vocabulary construction.

The reference ships a pre-built ``answer_spaces_single_word_threshold_5
_without_O.txt`` (vit_daquar_config.json:12; README: "answer space 170 after
<5-occurrence filtering") but not the script that produced it. This is that
tool: scan the train CSV's answers_list column, count normalized answers
(space->underscore, the Annotation rule), keep those with >= min_count
occurrences, optionally drop multi-word answers and/or the 'O' class, and
always append 'O' as the OOV bucket unless excluded.
"""

from __future__ import annotations

import ast
from collections import Counter
from typing import List, Optional

import pandas as pd


def build_answer_space(
    train_csv_path: str,
    min_count: int = 5,
    single_word_only: bool = True,
    include_oov_class: bool = True,
) -> List[str]:
    df = pd.read_csv(train_csv_path)
    counts: Counter = Counter()
    for raw in df["answers_list"]:
        for ans in ast.literal_eval(raw):
            counts[str(ans).replace(" ", "_")] += 1

    kept = []
    for ans, n in counts.items():
        if n < min_count:
            continue
        if single_word_only and "," in ans:
            continue
        if ans == "O":
            continue
        kept.append(ans)
    kept = sorted(kept)
    if include_oov_class:
        kept.append("O")
    return kept


def write_answer_space(answers: List[str], path: str) -> None:
    with open(path, "w") as f:
        f.write("\n".join(answers) + "\n")
