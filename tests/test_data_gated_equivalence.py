"""Data-gated equivalence proofs for the two env-blocked deviations
(VERDICT r3 #8, PARITY.md "Known deviations").

This image has no network egress, so nltk's punkt tokenizer models and the
WordNet corpus are absent. The two deviations they force are:

  1. dataset.py:14-26 tokenizes with ``nltk.word_tokenize`` (punkt); we ship
     nltk's data-free ``TreebankWordTokenizer`` and claim output identity on
     these corpora (vcr_tpu/data/captions.py).
  2. train.py:23 / train_utils.py:97-111 score METEOR through the nlg-eval
     jar, whose synonym stage uses a WordNet-derived table; our scorer's
     synonym STAGE is implemented and proven with synthetic tables
     (test_metrics.py), and ``wordnet_synonym_table()`` activates it when
     the corpus data exists.

Each test below RUNS the corresponding proof wherever the data is installed
(drop ``nltk_data`` into any standard nltk search path) and skips with a
pointed message otherwise — so the deviations are one file-drop away from
being *verified*, not just argued.
"""

import json
import os
import glob

import pytest


def _punkt_available() -> bool:
    try:
        import nltk
        nltk.word_tokenize("a man is playing guitar .")
        return True
    except LookupError:
        return False


def _wordnet_available() -> bool:
    try:
        from nltk.corpus import wordnet
        wordnet.synsets("dog")
        return True
    except Exception:
        return False


def _corpus_captions():
    """Every caption string reachable in this environment: the synthetic test
    corpus sentences, a battery of realistic MSVD/MSR-VTT-style captions
    (punctuation, contractions, numerals — where punkt and Treebank could
    plausibly split differently), and any real ``*_captions.json`` under
    $VCR_DATA_DIR when one is mounted."""
    from tests.util_corpus import SENTS

    caps = list(SENTS) + [
        "a man is slicing a potato",
        "someone's dog is running in the park",
        "two men are fighting in a ring",
        "a person is mixing flour, eggs and milk in a bowl",
        "the lady fried the fish in a pan of oil",
        "a boy is playing a video game on his t.v.",
        "a woman dips a shrimp in batter",
        "cartoon characters aren't real people",
        "a man rides a motorcycle at 100 mph",
        "it's a scene from a movie; people are dancing",
        "the chef added 1/2 cup of sugar",
        "kids (two of them) play soccer",
        "don't touch that!",
        "he said \"hello\" to the camera",
        "a man is talking on t.v. about u.s. politics",
    ]
    data_dir = os.environ.get("VCR_DATA_DIR", "")
    if data_dir:
        for fname in glob.glob(os.path.join(data_dir, "**",
                                            "*_captions.json"),
                               recursive=True):
            with open(fname) as fp:
                for sample in json.load(fp):
                    for cap in sample.get("captions", []):
                        if isinstance(cap.get("desc"), str):
                            caps.append(cap["desc"])
    return caps


@pytest.mark.skipif(
    not _punkt_available(),
    reason="nltk punkt data not installed (zero-egress image); install "
           "nltk_data/tokenizers/punkt* to RUN the Treebank≡punkt proof "
           "(PARITY.md deviation 'tokenizer')")
def test_treebank_matches_punkt_on_corpus_captions():
    """PROOF for deviation 1: our data-free tokenizer emits exactly
    nltk.word_tokenize's tokens over every reachable caption string."""
    import nltk

    from vcr_tpu.data import captions as vcap

    mismatches = []
    for text in _corpus_captions():
        ours = vcap.word_tokenize(text)
        punkt = nltk.word_tokenize(text)
        if ours != punkt:
            mismatches.append((text, ours, punkt))
    assert not mismatches, (
        f"{len(mismatches)} caption(s) tokenize differently; first: "
        f"{mismatches[0]}")


@pytest.mark.skipif(
    not _wordnet_available(),
    reason="nltk WordNet corpus not installed (zero-egress image); install "
           "nltk_data/corpora/wordnet* to RUN the synonym-stage activation "
           "proof (PARITY.md deviation 'METEOR synonyms')")
def test_wordnet_synonym_stage_activates():
    """PROOF for deviation 2: wordnet_synonym_table() feeds the SAME matcher
    stage the synthetic-table tests prove — a known synonym pair must score
    identically through the real table and through a hand-built table that
    forces the same stage-2 match, and strictly above the no-resource score."""
    from vcr_tpu.evals import metrics

    table = metrics.wordnet_synonym_table()
    assert table is not None and len(table) > 10000
    # data sanity: a canonical WordNet synonym pair shares a synset id
    assert table["dog"] & table["domestic dog"] or table["dog"] & table.get(
        "canis familiaris", frozenset())

    hyp = [["a", "man", "is", "slicing", "a", "dog"]]
    ref = [[["a", "man", "is", "cutting", "a", "hound"]]]

    try:
        metrics.set_meteor_resources()          # stage inert
        base_score = metrics.meteor_score(hyp, ref)

        metrics.set_meteor_resources(synonyms=table)
        wn_score = metrics.meteor_score(hyp, ref)

        # the same match forced through a synthetic table must agree exactly
        # (locks the wordnet loader to the proven stage-2 semantics)
        shared = table["dog"] & table["hound"]
        assert shared, "WordNet should synset-link dog/hound"
        synth = {"dog": frozenset({"x"}), "hound": frozenset({"x"}),
                 "slicing": table["slicing"] if "slicing" in table
                 else frozenset(),
                 "cutting": table.get("cutting", frozenset())}
        metrics.set_meteor_resources(synonyms=synth)
        synth_score = metrics.meteor_score(hyp, ref)
    finally:
        metrics.set_meteor_resources()          # leave the module inert

    assert wn_score > base_score, (
        "synonym stage did not activate through the WordNet table")
    assert abs(wn_score - synth_score) < 1e-12, (
        f"WordNet-table score {wn_score} != synthetic-table score "
        f"{synth_score} for the identical match set")


def test_gating_probes_are_accurate():
    """The skip conditions themselves must reflect reality: in THIS image the
    data is absent, so both probes must return False (if someone installs the
    data, the two proofs above start running and this guard inverts —
    delete it then)."""
    installed = _punkt_available() or _wordnet_available()
    if installed:
        pytest.skip("nltk data present — the real proofs above now run")
    assert not _punkt_available()
    assert not _wordnet_available()
