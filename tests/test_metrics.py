"""Sanity tests for METEOR / BLEU-4 / CIDEr-D implementations."""

import math

from vcr_tpu.evals import metrics as m


def test_meteor_perfect_match():
    s = "a man is playing a guitar"
    score = m.meteor_single(s, s)
    # perfect alignment: P=R=1 -> fmean=1; one chunk, frag=1/6 -> tiny penalty
    assert 0.95 < score <= 1.0


def test_meteor_no_match():
    assert m.meteor_single("cat dog", "piano violin") == 0.0


def test_meteor_stem_matching():
    a = m.meteor_single("a man plays guitar", "a man playing guitar")
    b = m.meteor_single("a man xxxx guitar", "a man playing guitar")
    assert a > b  # 'plays'~'playing' match via stemming


def test_meteor_multi_ref_max():
    hyp = "a dog runs"
    refs = ["piano violin cello", "a dog runs"]
    assert m.meteor_score(hyp, refs) == m.meteor_single(hyp, "a dog runs")


def test_bleu4_identity():
    s = "a man is playing a guitar by the fire"
    assert abs(m.bleu4_score(s, [s]) - 1.0) < 1e-9
    assert abs(m.corpus_bleu([s, s], [[s], [s]]) - 1.0) < 1e-9


def test_bleu4_brevity_penalty():
    hyp = "a man is"
    ref = "a man is playing a guitar"
    score = m.bleu4_score(hyp, [ref])
    assert 0.0 < score < math.exp(1 - 6 / 3) + 1e-9


def test_corpus_bleu_orders_quality():
    refs = [["a man is playing a guitar"], ["a dog runs in the park"]]
    good = ["a man is playing a guitar", "a dog runs in the park"]
    bad = ["guitar a playing", "park dog the"]
    assert m.corpus_bleu(good, refs) > m.corpus_bleu(bad, refs)


def test_cider_identity_beats_garbage():
    refs = [["a man is playing a guitar", "a person plays guitar"],
            ["a dog runs in the park", "the dog is running"]]
    good = ["a man is playing a guitar", "a dog runs in the park"]
    bad = ["xyzzy foo bar", "qwerty baz quux"]
    assert m.cider_d(good, refs) > m.cider_d(bad, refs)
    assert m.cider_d(bad, refs) < 1e-6
