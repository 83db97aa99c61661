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


# --- round-3: full-vocabulary metric pinning ------------------------------

def test_wups_covers_entire_answer_vocabulary():
    """Every word in the vendored DAQUAR answer vocabulary must have a
    taxonomy chain — no silent OOV-scores-0 inside the answer space
    (VERDICT r2 weak #4). Words with no noun synsets in WordNet 3.0 are
    exempt: the reference itself scores those 0.0 (wup_measure.py:42-43)."""
    from t5_resnet_vqa_tpu.data import daquar_vocab
    from t5_resnet_vqa_tpu.eval import mini_wordnet as mw

    missing = [w for w in daquar_vocab.ANSWER_WORDS
               if not mw.synsets(w) and w not in mw.NO_NOUN_SYNSET]
    assert missing == [], f"answer words without chains: {missing}"


def test_wups_golden_table():
    """The committed all-pairs golden matrix (tools/gen_wups_goldens.py)
    must reproduce exactly: any chain edit that shifts any score over the
    367-word vocabulary fails here until the goldens are regenerated and
    the diff reviewed."""
    import hashlib
    import json
    import os

    from t5_resnet_vqa_tpu.data import daquar_vocab
    from t5_resnet_vqa_tpu.eval.wups import wup_measure, wups_mode

    if wups_mode() != "mini-wordnet":
        pytest.skip("goldens pin the mini-wordnet tier")
    path = os.path.join(os.path.dirname(__file__), "goldens",
                        "wups_goldens.json")
    golden = json.load(open(path))
    words = sorted(set(daquar_vocab.ANSWER_WORDS))
    assert len(words) == golden["n_words"]

    h = hashlib.sha256()
    for a in words:
        for b in words:
            h.update(f"{a}|{b}|{round(wup_measure(a, b), 6):.6f};".encode())
    assert h.hexdigest() == golden["matrix_sha256"], (
        "WUPS matrix drifted from committed goldens — re-run "
        "tools/gen_wups_goldens.py and review the explicit-value diff")

    for pair, want in golden["explicit"].items():
        a, b = pair.split("|")
        assert wup_measure(a, b) == pytest.approx(want, abs=1e-6), pair


def test_wups_known_wordnet_exact_values():
    """Pairs whose WordNet 3.0 value is known exactly must match it (the
    vendored chains follow the real hierarchy for these)."""
    # dog/cat: LCS carnivore at depth 12, both synsets depth 14
    # -> 2*12/(14+14) = 6/7; below 0.925 threshold -> x0.1
    assert wup_measure("dog", "cat") == pytest.approx(6 / 7 * 0.1, abs=1e-9)
    # digit and spelled forms are lemmas of the SAME synset -> exact 1.0
    for d, w in [("2", "two"), ("7", "seven"), ("0", "zero")]:
        assert wup_measure(d, w) == 1.0
    # identical chains, different synsets never happen for the same word;
    # exact-string match short-circuits to 1.0 (ref :31-33)
    assert wup_measure("washing_machine", "washing_machine") == 1.0


def test_wups_wordnet_exact_value_table():
    """Round-4 provenance audit (VERDICT r3 #3): hand-derived WordNet 3.0
    values for pairs within the ``_EXACT`` categories — colors, numbers,
    furniture, dog/cat. Each value below is computed from the verbatim
    WordNet 3.0 hypernym paths (depth counts in eval/mini_wordnet.py chain
    comments) with the reference's 0.925-threshold x0.1 downweight
    (reference wup_measure.py:55-58). A chain edit that moves any of these
    is a regression against the real corpus, not just golden drift."""
    cases = [
        # --- colors: chromatic/achromatic depth 7(+word=8) ---
        # siblings: 2*7/16 = 0.875 -> x0.1
        ("red", "blue", 0.875 * 0.1),
        ("green", "yellow", 0.875 * 0.1),
        ("pink", "purple", 0.875 * 0.1),
        ("white", "black", 0.875 * 0.1),
        ("black", "gray", 0.875 * 0.1),
        # chromatic vs achromatic: LCS color at 6 -> 2*6/16 = 0.75 -> x0.1
        ("red", "white", 0.75 * 0.1),
        ("brown", "black", 0.75 * 0.1),
        # child/parent: 2*8/17 = 0.941 (>= 0.925, no downweight)
        ("violet", "purple", 2 * 8 / 17),
        ("beige", "brown", 2 * 8 / 17),
        # same synset, different lemma (gray.n.01 lemmas "gray, grey")
        ("gray", "grey", 1.0),
        # --- numbers: digit depth 7(+word=8); 10..12 under large_integer ---
        ("two", "three", 0.875 * 0.1),
        ("five", "nine", 0.875 * 0.1),
        ("1", "9", 0.875 * 0.1),
        ("ten", "eleven", 0.875 * 0.1),     # large_integer siblings
        ("eleven", "twelve", 0.875 * 0.1),
        # digit vs large_integer: LCS integer at 6 -> 0.75 -> x0.1
        ("nine", "ten", 0.75 * 0.1),
        ("9", "10", 0.75 * 0.1),
        ("10", "ten", 1.0),                 # same-synset lemma forms
        ("12", "twelve", 1.0),
        # --- furniture: furniture depth 8 ---
        ("table", "desk", 2 * 9 / 19),       # desk ⊂ table
        ("nightstand", "table", 2 * 9 / 19),
        ("table", "chair", 2 * 8 / 19 * 0.1),
        ("chair", "armchair", 2 * 10 / 21),
        ("chair", "stool", 2 * 9 / 20 * 0.1),
        ("stool", "bench", 2 * 9 / 20 * 0.1),
        ("sofa", "couch", 1.0),              # sofa.n.01 lemmas
        ("sofa", "chair", 2 * 9 / 20 * 0.1),
        ("bed", "table", 2 * 8 / 19 * 0.1),  # bed ⊂ bedroom_furniture
        ("bed", "mattress", 2 * 9 / 20 * 0.1),
        ("wardrobe", "cabinet", 2 * 8 / 18 * 0.1),
        ("wardrobe", "closet", 1.0),         # wardrobe.n.01 lemmas
        ("dresser", "chest_of_drawers", 1.0),
        ("nightstand", "night_stand", 1.0),
        ("bookcase", "cabinet", 2 * 8 / 18 * 0.1),
        # table-vs-dog rides dog's ANDIRON sense ("andiron, firedog, dog,
        # dog-iron" ⊂ support ⊂ device): LCS instrumentality(6), not the
        # animal path's whole(4) — r5 polysemy audit
        ("table", "dog", 2 * 6 / (9 + 9) * 0.1),
        # --- morphy plural lemmatization, as NLTK resolves it ---
        ("shelves", "shelf", 1.0),
        ("books", "book", 1.0),
        ("tv", "television", 1.0),
        ("bike", "bicycle", 1.0),
        # =========== round-5 exact-subtree derivations (VERDICT r4 #3) ====
        # furniture tail: counter/coffee_table/dining_table ⊂ table(9);
        # rocking_chair ⊂ chair(10); ottoman lemma of footstool ⊂ stool(10);
        # bunk_bed ⊂ bed(10); crib ⊂ baby_bed(9)
        ("counter", "desk", 2 * 9 / 20 * 0.1),
        ("coffee_table", "dining_table", 2 * 9 / 20 * 0.1),
        ("coffee_table", "table", 2 * 9 / 19),
        ("rocking_chair", "chair", 2 * 10 / 21),
        ("rocking_chair", "armchair", 2 * 10 / 22 * 0.1),
        ("ottoman", "stool", 2 * 10 / 21),
        ("ottoman", "chair", 2 * 9 / 21 * 0.1),
        ("bunk_bed", "bed", 2 * 10 / 21),
        ("crib", "bed", 2 * 8 / 20 * 0.1),
        ("crib", "cabinet", 2 * 8 / 19 * 0.1),
        # shelf.n.01 ⊂ support.n.10 ⊂ device(7) — NOT furniture
        ("shelf", "bookshelf", 2 * 9 / 19),
        ("shelf", "table", 2 * 6 / 18 * 0.1),
        # containers(7) / vessels(8)
        ("box", "bag", 2 * 7 / 16 * 0.1),
        ("basket", "bin", 2 * 7 / 16 * 0.1),
        ("trash_can", "bin", 2 * 8 / 17),
        ("trash_can", "garbage_can", 1.0),   # ashcan.n.01 lemmas
        ("bottle", "jar", 2 * 8 / 18 * 0.1),
        ("vase", "jar", 2 * 9 / 19),
        ("water_bottle", "wine_bottle", 2 * 9 / 20 * 0.1),
        ("water_bottle", "bottle", 2 * 9 / 19),
        ("kettle", "teapot", 2 * 9 / 20 * 0.1),   # siblings under pot(9)
        ("kettle", "pot", 2 * 9 / 19),
        ("bucket", "pot", 2 * 8 / 18 * 0.1),
        ("mug", "bottle", 2 * 8 / 19 * 0.1),  # mug ⊂ drinking_vessel(9)
        ("backpack", "bag", 2 * 8 / 17),
        ("box", "bottle", 2 * 7 / 17 * 0.1),
        # white goods(10) / kitchen appliances(10)
        ("stove", "oven", 2 * 10 / 22 * 0.1),
        ("microwave", "oven", 2 * 11 / 23),   # microwave_oven ⊂ oven
        ("microwave", "stove", 2 * 10 / 23 * 0.1),
        ("refrigerator", "fridge", 2 * 11 / 23),
        ("refrigerator", "dishwasher", 2 * 10 / 22 * 0.1),
        ("washing_machine", "dishwasher", 2 * 10 / 22 * 0.1),
        ("stove", "refrigerator", 2 * 9 / 22 * 0.1),
        ("toaster", "oven", 2 * 10 / 22 * 0.1),
        # machine(8) / computer(9) / laptop(13, the 5-link WN path)
        ("machine", "computer", 2 * 8 / 17),
        ("laptop", "computer", 2 * 9 / 22 * 0.1),
        ("machine", "stove", 2 * 7 / 19 * 0.1),
        # lamps(9), electronic equipment, timepieces(10)
        ("lamp", "floor_lamp", 2 * 9 / 19),
        ("floor_lamp", "table_lamp", 2 * 9 / 20 * 0.1),
        ("television", "radio", 2 * 10 / 22 * 0.1),  # receiver siblings
        ("telephone", "television", 2 * 8 / 20 * 0.1),
        ("telephone", "phone", 1.0),
        ("clock", "watch", 2 * 10 / 22 * 0.1),
        ("alarm_clock", "clock", 2 * 11 / 23),
        ("clock", "lamp", 2 * 7 / 20 * 0.1),  # LCS device(7)
        ("television", "computer", 2 * 6 / 20 * 0.1),  # instrumentality
        # writing implements(8), publications(9)
        ("pen", "pencil", 2 * 8 / 18 * 0.1),
        ("book", "magazine", 2 * 9 / 20 * 0.1),
        ("notebook", "book", 2 * 10 / 21),
        # musical instruments — piano's THREE WN3.0 hypernyms: the
        # percussion chain is what makes piano/drum 0.9, and the stringed
        # chain lifts piano/guitar from 0.8 to 0.9
        ("guitar", "piano", 2 * 9 / 20 * 0.1),
        ("guitar", "drum", 2 * 8 / 20 * 0.1),
        ("piano", "drum", 2 * 9 / 20 * 0.1),
        # playthings: toy IS plaything.n.01 (lemma), depth 6
        ("toy", "doll", 2 * 6 / 13 * 0.1),
        ("toy", "teddy_bear", 2 * 6 / 13 * 0.1),
        ("doll", "teddy_bear", 2 * 6 / 14 * 0.1),
        ("toys", "toy", 1.0),
        ("ball", "toy", 2 * 5 / 15 * 0.1),   # game_equipment vs plaything
        # floor covers(7), cushions, bedclothes(8), cloth
        ("carpet", "rug", 1.0),              # rug.n.01 lemmas
        ("carpet", "mat", 2 * 7 / 16 * 0.1),
        ("doormat", "mat", 2 * 8 / 17),
        ("doormat", "carpet", 2 * 7 / 17 * 0.1),
        ("pillow", "cushion", 2 * 7 / 15),   # pillow ⊂ cushion ⊂ padding
        ("blanket", "sheet", 2 * 8 / 18 * 0.1),
        ("sheets", "sheet", 1.0),
        # bedsheets is NOT a WN3.0 lemma (morphy's "bedsheet" is not in
        # the index — the synset lemma is "bed_sheet"): the reference
        # scores it 0.0; the vendored sheet-child chain is documented
        # generous (non-lemma bucket), r5 fix of a false 1.0 alias claim
        ("bedsheets", "sheet", 2 * 9 / 19),
        ("towel", "blanket", 2 * 5 / 17 * 0.1),
        ("pillow", "blanket", 2 * 5 / 17 * 0.1),
        # cutlery ⊂ tableware ⊂ ware ⊂ article (NOT instrumentality)
        ("fork", "spoon", 2 * 9 / 20 * 0.1),
        ("fork", "table", 2 * 5 / 19 * 0.1),
        # fauna / flora
        ("bird", "fish", 2 * 9 / 21 * 0.1),  # LCS vertebrate(9)
        ("dog", "bird", 2 * 9 / 24 * 0.1),
        ("cat", "fish", 2 * 9 / 25 * 0.1),
        ("tree", "plant", 2 * 7 / 17 * 0.1),
        ("flower", "tree", 2 * 8 / 21 * 0.1),  # LCS vascular_plant(8)
        ("plant", "flower", 2 * 7 / 18 * 0.1),
        ("plants", "plant", 1.0),
        ("flowers", "flower", 1.0),
        ("dog", "plant", 2 * 6 / 21 * 0.1),  # LCS organism(6)
        ("bicycle", "bike", 1.0),
        # cross-ontology: color (abstraction) vs furniture (physical):
        # only the fake root "entity" is shared; the max rides table's
        # SHORTEST chain (the 7-node board/meals synset). Vendored-model
        # value: white's unvendored egg-white food sense could raise the
        # true NLTK value within the x0.1 regime (KNOWN_UNVENDORED_SENSES)
        ("white", "table", 2 * 1 / 15 * 0.1),
        ("red", "two", 2 * 2 / 16 * 0.1),    # LCS abstraction(2)
        # ====== round-5 single-noun-sense batch (VERDICT r4 #3) ==========
        # device(7) subtree: mirror ⊂ reflector(8); keyboard(8);
        # remote_control(8), "remote" a lemma of the same synset;
        # faucet ⊂ regulator(8); heater(8)
        ("mirror", "lamp", 2 * 7 / 18 * 0.1),
        ("keyboard", "mirror", 2 * 7 / 17 * 0.1),
        ("remote_control", "remote", 1.0),   # remote_control.n.01 lemmas
        ("remote_control", "keyboard", 2 * 7 / 16 * 0.1),
        ("faucet", "heater", 2 * 7 / 17 * 0.1),
        ("heater", "lamp", 2 * 7 / 17 * 0.1),
        ("heater", "machine", 2 * 7 / 16 * 0.1),
        # containers: tray ⊂ receptacle(8); wallet ⊂ case(8); bathtub ⊂
        # vessel(8)
        ("tray", "box", 2 * 7 / 17 * 0.1),
        # wallet ⊂ case; bag's bag.n.06 (suitcase) sense ⊂ baggage ⊂ case
        # moves the LCS from container to case (wave 6 — the real NLTK
        # LCS: both live under case.n.05)
        ("wallet", "bag", 2 * 8 / 19 * 0.1),
        ("wallet", "backpack", 2 * 7 / 18 * 0.1),
        ("bathtub", "bucket", 2 * 8 / 18 * 0.1),
        # timepieces: wall_clock ⊂ clock(11)
        ("wall_clock", "alarm_clock", 2 * 11 / 24 * 0.1),
        ("wall_clock", "watch", 2 * 10 / 23 * 0.1),
        # stapler ⊂ machine(8); vacuum_cleaner ⊂ home_appliance(9)
        ("stapler", "computer", 2 * 8 / 18 * 0.1),
        ("vacuum_cleaner", "refrigerator", 2 * 9 / 21 * 0.1),
        ("vacuum_cleaner", "stove", 2 * 9 / 21 * 0.1),
        ("mirror", "television", 2 * 6 / 20 * 0.1),  # LCS instrumentality
        # ====== round-5 polysemy audit (secondary senses, _EXTRA_SYNSETS) =
        # pot, stool and toilet are all LEMMAS of the commode synset
        # ("toilet, can, commode, crapper, pot, potty, stool, throne" ⊂
        # plumbing_fixture ⊂ fixture): same synset -> 1.0, NO downweight —
        # NLTK scores these 1.0, not as cross-category vessel/seat pairs
        ("pot", "stool", 1.0),
        ("pot", "toilet", 1.0),
        ("stool", "toilet", 1.0),
        # toy is a lemma of toy_dog.n.01 ⊂ dog: 2*14/(15+14) ≈ 0.966 ≥
        # 0.925 -> full weight (the vendored plaything path is ~0.03)
        ("toy", "dog", 2 * 14 / 29),
        ("toys", "dog", 2 * 14 / 29),
        # board and table share the meals synset ("board, table" ⊂ fare)
        ("board", "table", 1.0),
        # bag and purse share handbag.n.01 ("bag, handbag, pocketbook,
        # purse" ⊂ bag.n.01)
        ("bag", "purse", 1.0),
        # glass is a lemma of looking_glass.n.01 ⊂ mirror: 18/19 ≈ 0.947
        ("glass", "mirror", 2 * 9 / 19),
        # painting.n.01 lemmas are "painting, picture"
        ("painting", "picture", 1.0),
        # kettle is a lemma of kettledrum ⊂ percussion_instrument: 0.9
        # against drum AND piano (piano's percussion chain), x0.1 regime
        ("kettle", "drum", 2 * 9 / 20 * 0.1),
        ("kettle", "piano", 2 * 9 / 20 * 0.1),
        # dog's andiron sense ⊂ support.n.10 — shelf's own subtree
        ("dog", "shelf", 2 * 8 / 18 * 0.1),
        ("dog", "mirror", 2 * 7 / 18 * 0.1),   # LCS device via andiron
        # bird is a lemma of shuttlecock ⊂ badminton_equipment:
        # LCS equipment(7) against ball
        ("bird", "ball", 2 * 7 / 19 * 0.1),
        # curtain.n.01 ⊂ blind.n.03 (and furnishing.n.02); "blinds"
        # lemmatizes to blind.n.03 itself -> parent/child, full weight
        ("curtain", "blinds", 2 * 8 / 17),
        ("shower_curtain", "curtain", 2 * 9 / 19),
        # mantel/mantelpiece (lemma "mantle") ⊂ shelf ⊂ support.n.10
        ("mantle", "shelf", 2 * 9 / 19),
        # toilet and sink are plumbing_fixture siblings: 0.875, x0.1
        ("toilet", "sink", 2 * 7 / 16 * 0.1),
        # mantle is ALSO a curtain.n.01 lemma ("curtain, drape, drapery,
        # mantle, pall") -> same synset, 1.0
        ("mantle", "curtain", 1.0),
        # photograph ⊂ representation is a SIBLING of picture/image, not
        # its child: 0.9 -> x0.1 (the old child chain said 0.947 at full
        # weight — a 10x overestimate vs NLTK)
        ("photograph", "picture", 2 * 9 / 20 * 0.1),
        ("photo", "picture", 2 * 9 / 20 * 0.1),
        # notebook/notebook_computer ⊂ portable_computer — laptop's
        # sibling at 24/26 ≈ 0.923, just UNDER the 0.925 line -> x0.1
        ("notebook", "laptop", 2 * 12 / 26 * 0.1),
        # wave-4 same-synset collisions: "board" is a dining_table.n.01
        # lemma; "counter"/"sideboard" are buffet.n.01 lemmas; "file" is a
        # file.n.03 ("file, file_cabinet, filing_cabinet") lemma
        ("board", "dining_table", 1.0),
        ("counter", "sideboard", 1.0),
        ("file", "file_cabinet", 1.0),
        ("file", "cabinet", 2 * 9 / 19),
        # wave-4 overestimate fixes (old full-weight values -> x0.1):
        # sewing_machine ⊂ textile_machine ⊂ machine; cable ⊂ conductor
        # (wire's sibling); sideboard-vs-cabinet via buffet ⊂ furniture;
        # belt ⊂ accessory ⊂ clothing; waste_basket ⊂ basket (not bin);
        # laundry_basket ⊂ hamper ⊂ basket
        ("sewing_machine", "machine", 2 * 8 / 18 * 0.1),
        ("cable", "wire", 2 * 7 / 16 * 0.1),
        ("sideboard", "cabinet", 2 * 8 / 18 * 0.1),
        ("belt", "clothing", 2 * 7 / 16 * 0.1),
        ("waste_basket", "basket", 2 * 8 / 17),
        ("laundry_basket", "hamper", 2 * 9 / 19),
        # =========== wave-6 same-synset collisions ========================
        # "paper" is a newspaper.n.01 lemma ("newspaper, paper") — the
        # sheet-path cross pair said 0.059, the largest divergence found
        ("paper", "newspaper", 1.0),
        ("papers", "newspaper", 1.0),        # plural alias rides along
        # blind.n.03's lemmas are "blind, screen": screen shares curtain's
        # hypernym synset
        ("screen", "blind", 1.0),
        ("screen", "blinds", 1.0),           # morphy: blinds -> blind.n.03
        ("screen", "curtain", 2 * 8 / 17),   # parent/child, full weight
        ("mantle", "screen", 2 * 8 / 17),    # mantle ∈ curtain.n.01 ⊂ blind
        # fabric.n.01 lemmas: "fabric, cloth, material, textile" — cloth is
        # now an alias (the old child chain said 0.941)
        ("cloth", "fabric", 1.0),
        # ...which also FIXES towel-vs-cloth: NLTK scores it through fabric
        # at 0.857 x0.1, not the old piece_of_cloth-sibling 0.933 full
        ("towel", "cloth", 2 * 6 / 14 * 0.1),
        # "glasses" reaches glass's senses via morphy (-ses -> glass) in
        # addition to its spectacles synset
        ("glasses", "glass", 1.0),
        ("glasses", "mirror", 2 * 9 / 19),   # via looking_glass, full weight
        # =========== wave-6 secondary senses ==============================
        # bowl ⊂ dish.n.01 (soup bowl) and bowl ⊂ ball.n.01 (lawn bowls) —
        # both parent/child at full weight (the vessel chain said ~0.05)
        ("bowl", "dish", 2 * 10 / 21),
        ("bowl", "ball", 2 * 9 / 19),
        # cake.n.02 ("cake, patty") ⊂ dish.n.02 ⊂ nutriment: full weight
        ("cake", "dish", 2 * 7 / 15),
        # food.n.01 ⊂ substance is nutriment's parent: dish-vs-food rides
        # the real LCS in the x0.1 regime
        ("food", "dish", 2 * 5 / 12 * 0.1),
        # glassful/cupful are containerful siblings (x0.1)
        ("glass", "cup", 2 * 5 / 12 * 0.1),
        # =========== wave-6 chain fixes ===================================
        # paper_towel.n.01 ⊂ towel.n.01 (was sheet/paper subtree, ~0.06)
        ("paper_towel", "towel", 2 * 8 / 17),
        # outlet IS wall_socket.n.01 ⊂ receptacle ⊂ container — tray's
        # sibling (was hung under device)
        ("outlet", "tray", 2 * 8 / 18 * 0.1),
        # suitcase's ONLY synset is bag.n.06 ("bag, traveling_bag,
        # travelling_bag, grip, suitcase" ⊂ baggage ⊂ case): shared with
        # bag -> 1.0; purse rides bag.n.01/handbag, NOT bag.n.06, so
        # suitcase-vs-purse stays a x0.1 container cross pair
        ("suitcase", "bag", 1.0),
        ("suitcase", "purse", 2 * 7 / 19 * 0.1),
    ]
    assert len(cases) >= 100, len(cases)
    for a, b, want in cases:
        assert wup_measure(a, b) == pytest.approx(want, abs=1e-9), (a, b)


def test_wups_provenance_api():
    """provenance() classifies every audited vocabulary word; the exactness
    stats quantify the remaining approximation surface (module docstring)."""
    from t5_resnet_vqa_tpu.data import daquar_vocab
    from t5_resnet_vqa_tpu.eval import mini_wordnet as mw

    assert mw.provenance("red") == "wordnet-3.0-exact"
    assert mw.provenance("grey") == "wordnet-3.0-exact"   # alias of gray
    assert mw.provenance("lamp") == "wordnet-3.0-exact"   # promoted r5
    assert mw.provenance("candle") == "approximation"
    assert mw.provenance("chandelier") == "approximation"
    assert mw.provenance("transparent") == "no-noun-synset"
    assert mw.provenance("zzz_not_a_word") == "oov"

    words = sorted(set(daquar_vocab.ANSWER_WORDS))
    for w in words:
        assert mw.provenance(w) != "oov", w
    stats = mw.exactness_stats(words)
    # round-5 subtree derivation (53 -> 140) + single-noun-sense batch
    # (-> 152) + polysemy-audit toilet promotion/bedsheets demotion + the
    # wave-6 enumerable-inventory batch (mouse/fan/sink/pitcher/hamper/
    # laundry_basket/waste_basket/radiator/blinds/curtain(s)/
    # shower_curtain/paper_towel/newspaper -> 166 exact words; module
    # docstring); the strict tier excludes exact words carrying a
    # KNOWN_UNVENDORED_SENSES entry
    assert stats["exact_words"] == 167
    assert stats["exact_word_pct"] == pytest.approx(45.50, abs=0.01)
    assert stats["exact_pair_pct"] == pytest.approx(20.71, abs=0.01)
    assert stats["sense_complete_exact_words"] == 125
    assert stats["strict_exact_pair_pct"] == pytest.approx(11.60, abs=0.01)


def test_wups_every_non_exact_word_has_a_documented_reason():
    """VERDICT r4 #3 'done' condition: every audited vocabulary word is
    provenance-exact OR carries a documented reason. non_exact_reason()
    makes the module docstring's three buckets machine-checkable, and the
    non-lemma bucket is verifiable against real NLTK by
    tools/audit_wups_vs_nltk.py (non_lemma_bucket_violations)."""
    from t5_resnet_vqa_tpu.data import daquar_vocab
    from t5_resnet_vqa_tpu.eval import mini_wordnet as mw

    words = sorted(set(daquar_vocab.ANSWER_WORDS))
    buckets = {}
    for w in words:
        prov = mw.provenance(w)
        reason = mw.non_exact_reason(w)
        if prov in ("wordnet-3.0-exact", "no-noun-synset"):
            assert reason is None, w
        else:
            assert prov == "approximation", w
            assert reason is not None, w
            buckets.setdefault(reason, []).append(w)
    assert set(buckets) <= {"multiple-inheritance-linearized",
                            "non-lemma-normalization-scored-generously",
                            "chain-underivable-offline"}
    # the explicit bucket memberships name real vocabulary words
    assert "person" in buckets["multiple-inheritance-linearized"]
    assert "apple" in buckets["multiple-inheritance-linearized"]
    assert ("basket_ball"
            in buckets["non-lemma-normalization-scored-generously"])
    assert "chandelier" in buckets["chain-underivable-offline"]
    # exact words never carry a reason
    assert mw.non_exact_reason("red") is None
    assert mw.non_exact_reason("zzz_not_a_word") is None


def test_wups_polysemy_registry_invariants():
    """Round-5 polysemy audit contract: every KNOWN_UNVENDORED_SENSES key
    is a real vocabulary word; aliases resolve to their canonical entry;
    the full-magnitude secondary senses are VENDORED (same-synset lemma
    collisions score 1.0 with no downweight), so every registered residue
    lies in the x0.1 regime."""
    from t5_resnet_vqa_tpu.eval import mini_wordnet as mw

    vocab = set(mw.vocabulary())
    for key in mw.KNOWN_UNVENDORED_SENSES:
        assert key in vocab, key
        assert mw.KNOWN_UNVENDORED_SENSES[key], key
    # alias resolution
    assert mw.unvendored_senses("grey") == mw.unvendored_senses("gray")
    assert mw.unvendored_senses("toys") == mw.unvendored_senses("toy")
    assert mw.unvendored_senses("mirror") == ()
    # the vendored same-synset collisions (these are NOT approximations —
    # real NLTK returns exactly 1.0 for same-synset lemma pairs)
    for a, b in [("pot", "stool"), ("pot", "toilet"), ("board", "table"),
                 ("bag", "purse"), ("painting", "picture")]:
        assert wup_measure(a, b) == 1.0, (a, b)
    # vendored cross-synset secondary senses that cross the 0.925 line
    assert wup_measure("toy", "dog") >= 0.925
    assert wup_measure("glass", "mirror") >= 0.925
    assert wup_measure("curtain", "blinds") >= 0.925
    assert wup_measure("mantle", "shelf") >= 0.925


def test_wups_no_noun_synset_words_score_zero():
    """Adjective-only words score 0 against everything, like the reference
    (empty noun synsets -> 0.0)."""
    from t5_resnet_vqa_tpu.eval import mini_wordnet as mw

    for w in sorted(mw.NO_NOUN_SYNSET):
        assert wup_measure(w, "red") == 0.0
        assert wup_measure("table", w) == 0.0
        assert wup_measure(w, w) == 1.0     # exact match still wins
