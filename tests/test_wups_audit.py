"""tools/audit_wups_vs_nltk.py logic, driven by a stub WordNet corpus.

The real NLTK corpus cannot exist in this zero-egress image (the tool's CLI
refuses and says so), but the audit logic is dependency-injected: these
tests build small WordNet-interface stubs and verify the audit

  * reports 100% agreement when the corpus mirrors the vendored taxonomy,
  * catches a diverging chain as a worst-pair/worst-word offender,
  * flags a false ``wordnet-3.0-exact`` provenance claim,
  * flags alias-synset and no-noun-synset claim violations and
    OOV-but-in-WordNet coverage gaps,

so that when a user runs the tool on a corpus-ful machine, its verdicts can
be trusted. Reference semantics mirrored: wup_measure.py:31-60."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import audit_wups_vs_nltk as audit_mod
from t5_resnet_vqa_tpu.eval import mini_wordnet


class StubSynset:
    def __init__(self, chain):
        self.chain = tuple(chain)  # root-first, ends with the synset name

    def wup_similarity(self, other):
        common = 0
        for x, y in zip(self.chain, other.chain):
            if x != y:
                break
            common += 1
        if common == 0:
            return None  # NLTK returns None for no common subsumer
        return 2.0 * common / (len(self.chain) + len(other.chain))


class StubWordnet:
    """nltk.corpus.wordnet surface used by the audit: synsets(word, pos)."""

    def __init__(self, table):
        self.table = table  # word -> list of chains

    def synsets(self, word, pos=None):
        assert pos == "n"
        return [StubSynset(c) for c in self.table.get(word, [])]


def _mirror_table(words):
    """A stub corpus that agrees with the vendored taxonomy exactly,
    including alias resolution (mini_wordnet.synsets follows _ALIASES)."""
    return {w: [tuple(c) for c in mini_wordnet.synsets(w)] for w in words}


# Small but representative slice: exact words (colors, numbers, furniture,
# r5 promotions lamp/bottle/television), approximations (candle, glass),
# one alias pair.
WORDS = ["red", "blue", "white", "two", "3", "table", "desk", "chair",
         "sofa", "couch", "lamp", "bottle", "television", "candle", "glass"]


def test_audit_agrees_on_mirror_corpus():
    wn = StubWordnet(_mirror_table(
        WORDS + list(mini_wordnet._ALIASES) + list(mini_wordnet._ALIASES.values())))
    rep = audit_mod.audit(wn, words=WORDS)
    assert rep["ordered_pairs"] == len(WORDS) * (len(WORDS) - 1)
    assert rep["pair_agree_pct"] == 100.0
    assert rep["max_abs_delta"] == 0.0
    assert rep["exact_claim_violations"] == []
    assert rep["alias_claim_violations"] == []
    assert rep["no_noun_synset_violations"] == []
    assert rep["worst_pairs"] == []


def test_audit_catches_diverging_chain():
    table = _mirror_table(
        WORDS + list(mini_wordnet._ALIASES) + list(mini_wordnet._ALIASES.values()))
    # Move 'candle' (an approximation, not _EXACT) somewhere else entirely:
    # now mini's candle-vs-bottle score disagrees with the 'real' corpus.
    table["candle"] = [("entity", "abstraction", "attribute", "candle")]
    rep = audit_mod.audit(StubWordnet(table), words=WORDS)
    assert rep["pair_agree_pct"] < 100.0
    assert any(o["a"] == "candle" or o["b"] == "candle"
               for o in rep["worst_pairs"])
    assert any(w["word"] == "candle" for w in rep["worst_words"])
    # candle is not claimed exact, so the provenance claims still hold
    assert rep["exact_claim_violations"] == []


def test_audit_flags_false_exact_claim():
    table = _mirror_table(
        WORDS + list(mini_wordnet._ALIASES) + list(mini_wordnet._ALIASES.values()))
    # 'blue' IS claimed wordnet-3.0-exact and carries NO registered
    # unvendored sense; a corpus that disagrees must surface it as an
    # exact-claim violation (blue-vs-white both exact).
    assert mini_wordnet.unvendored_senses("blue") == ()
    assert mini_wordnet.unvendored_senses("desk") == ()
    # a corpus where 'blue' sits in the furniture subtree diverges against
    # desk/sofa/lamp — unregistered exact words, so a TRUE claim violation
    table["blue"] = [mini_wordnet.synsets("desk")[0][:-1] + ("blue",)]
    rep = audit_mod.audit(StubWordnet(table), words=WORDS)
    assert rep["exact_claim_violations"], "false exact claim not caught"
    pairs = {(o["a"], o["b"]) for o in rep["exact_claim_violations"]}
    assert any("blue" in p for p in pairs)


def test_audit_routes_registered_word_divergence_to_residue():
    table = _mirror_table(
        WORDS + list(mini_wordnet._ALIASES) + list(mini_wordnet._ALIASES.values()))
    # 'red' is exact but HAS a KNOWN_UNVENDORED_SENSES entry (Bolshevik
    # person sense): a corpus where red scores higher than the vendored max
    # against another exact word is the DOCUMENTED residue, not a claim
    # violation — exactly how the round-5 registry is meant to be read.
    assert mini_wordnet.unvendored_senses("red") != ()
    table["red"] = table["red"] + [
        ("entity", "physical_entity", "object", "whole", "living_thing",
         "organism", "person", "radical", "red")]
    rep = audit_mod.audit(StubWordnet(table), words=WORDS)
    assert rep["exact_claim_violations"] == []
    assert any("red" in (o["a"], o["b"])
               for o in rep["registered_sense_residue"])


def test_audit_flags_alias_nns_and_coverage():
    words = WORDS + ["transparent", "xylophone_case"]
    table = _mirror_table(
        WORDS + list(mini_wordnet._ALIASES) + list(mini_wordnet._ALIASES.values()))
    # break the couch==sofa same-synset claim in the 'real' corpus
    table["couch"] = [mini_wordnet.synsets("sofa")[0][:-1] + ("couch",)]
    # give 'transparent' a noun synset (mini claims it has none)
    table["transparent"] = [("entity", "abstraction", "transparent")]
    # a word mini is OOV on but the corpus knows -> coverage gap
    table["xylophone_case"] = [("entity", "physical_entity", "object",
                                "xylophone_case")]
    rep = audit_mod.audit(StubWordnet(table), words=words)
    assert any(v["alias"] == "couch" for v in rep["alias_claim_violations"])
    assert "transparent" in rep["no_noun_synset_violations"]
    assert "xylophone_case" in rep["oov_but_in_wordnet"]


def test_cli_refuses_without_corpus(capsys):
    # In this image the corpus is absent: the CLI must exit 2 with the
    # install hint, not crash or silently audit nothing.
    rc = audit_mod.main([])
    assert rc == 2
    assert "nltk.downloader wordnet" in capsys.readouterr().err
