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


# ------------------------------------------------- METEOR 1.5 (hand goldens)

def test_meteor15_identity_golden():
    """Identical 6-token sentence: P=R=Fmean=1, 1 chunk / 6 matches,
    Pen = 0.6*(1/6)**0.2 -> score = 1 - 0.6*6**-0.2 (the 1.5 jar's known
    'identical sentences score well below 1' behavior)."""
    s = "a man is playing a guitar"
    want = 1.0 - 0.6 * (1.0 / 6.0) ** 0.2
    assert abs(m.meteor15_single(s, s) - want) < 1e-12


def test_meteor15_function_word_weighting_golden():
    """hyp 'the cat' vs ref 'a cat': only the content word matches.
    P = R = 0.75/(0.25+0.75) = 0.75, Fmean = 0.75, Pen = 0.6*1**0.2 = 0.6
    -> 0.3. A content-word miss ('big cat') weighs more: P = 0.75/1.5 = 0.5,
    Fmean = 0.375/0.5375 -> score ~0.27907."""
    a = m.meteor15_single("the cat", "a cat")
    assert abs(a - 0.3) < 1e-12
    b = m.meteor15_single("big cat", "a cat")
    want_b = 0.4 * (0.5 * 0.75 / (0.85 * 0.5 + 0.15 * 0.75))
    assert abs(b - want_b) < 1e-12
    assert a > b  # missing a function word hurts less than a content word


def test_meteor15_stem_stage_weight_golden():
    """'man plays' vs 'man playing': exact (w=1.0) + stem (w=0.6) matches,
    all content words. P = R = (0.75 + 0.6*0.75)/1.5 = 0.8; 1 chunk / 2
    matches -> Pen = 0.6*0.5**0.2; score = 0.8*(1 - 0.6*0.5**0.2)."""
    want = 0.8 * (1.0 - 0.6 * 0.5 ** 0.2)
    assert abs(m.meteor15_single("man plays", "man playing") - want) < 1e-12


def test_meteor15_multi_ref_and_batch():
    hyp = "a dog runs"
    refs = ["piano violin cello", "a dog runs"]
    assert m.meteor15_score(hyp, refs) == m.meteor15_single(hyp, "a dog runs")
    assert m.batch_meteor([hyp], [refs]) == m.meteor15_score(hyp, refs)


# ----------------------- chunk-minimizing alignment (Meteor 1.5 jar, round 3)
# Cases constructed so greedy first-come matching and the jar's
# chunk-minimizing beam search genuinely disagree (VERDICT.md r2 item #2).

def test_align_beam_beats_greedy_on_chunks():
    """hyp 'the cat the dog' vs ref 'the dog the cat': both align all 4
    words, but greedy's first-come 'the' assignments give 4 chunks where the
    chunk-minimizing alignment pairs ('the cat'->ref[2:4], 'the dog'->
    ref[0:2]) for 2 chunks."""
    h, r = "the cat the dog".split(), "the dog the cat".split()
    beam = m._align_pairs(h, r)
    greedy = m._align_pairs_greedy(h, r)
    assert len(beam) == len(greedy) == 4
    assert m._chunks(beam) == 2
    assert m._chunks(greedy) == 4
    # golden score: P=R=1 (all matched, exact), Pen = 0.6*(2/4)**0.2
    want = 1.0 - 0.6 * 0.5 ** 0.2
    assert abs(m.meteor15_single("the cat the dog", "the dog the cat") - want) < 1e-12


def test_align_beam_repeated_word():
    """hyp 'a b' vs ref 'b a b': greedy sends hyp 'b' to ref[0] (2 chunks);
    the beam finds the contiguous (0,1),(1,2) alignment (1 chunk)."""
    h, r = ["a", "b"], ["b", "a", "b"]
    beam = m._align_pairs(h, r)
    assert sorted(p[:2] for p in beam) == [(0, 1), (1, 2)]
    assert m._chunks(beam) == 1
    assert m._chunks(m._align_pairs_greedy(h, r)) == 2


def test_align_matches_beat_chunks():
    """Priority order: coverage first, chunks second. hyp 'a b' vs ref
    'b a' — taking both matches costs 2 chunks, but the aligner must not
    drop a match to get 1 chunk."""
    beam = m._align_pairs(["a", "b"], ["b", "a"])
    assert len(beam) == 2
    assert m._chunks(beam) == 2


def test_align_chunks_beat_distance():
    """hyp 'the cat' vs ref 'the the cat': matching hyp[0] to ref[1] gives
    1 chunk at distance 2; matching ref[0] gives 2 chunks at distance 1.
    Fewer chunks must win over smaller distance."""
    beam = m._align_pairs(["the", "cat"], ["the", "the", "cat"])
    assert sorted(p[:2] for p in beam) == [(0, 1), (1, 2)]
    assert m._chunks(beam) == 1


def test_align_exact_stage_preferred():
    """A pair matching both exactly and by stem records the exact stage."""
    beam = m._align_pairs(["plays"], ["plays"])
    assert beam == [(0, 0, 0)]
    stem_only = m._align_pairs(["plays"], ["playing"])
    assert stem_only == [(0, 0, 1)]


# ------------------------------------------------- BLEU anchored to nltk

def test_corpus_bleu_matches_nltk():
    from nltk.translate.bleu_score import corpus_bleu as nltk_corpus_bleu

    refs = [["the cat sat on the mat", "a cat was on the mat"],
            ["the dog ran in the park", "a dog runs through the park"],
            ["a man is playing a guitar by the fire"]]
    hyps = ["the cat sat on the mat",
            "the dog ran quickly in the park",
            "a man is playing a guitar"]
    ours = m.corpus_bleu(hyps, refs)
    want = nltk_corpus_bleu(
        [[r.split() for r in rs] for rs in refs], [h.split() for h in hyps])
    assert abs(ours - want) < 1e-12


def test_sentence_bleu_matches_nltk_unsmoothed():
    from nltk.translate.bleu_score import sentence_bleu as nltk_sentence_bleu

    refs = ["the cat sat on the mat quietly", "a cat was sitting on the mat"]
    hyp = "the cat sat quietly on the mat"  # all 1-4 gram precisions > 0
    ours = m.bleu4_score(hyp, refs, smooth=False)
    want = nltk_sentence_bleu([r.split() for r in refs], hyp.split())
    assert abs(ours - want) < 1e-12


# ------------------------------------------------- CIDEr-D hand golden

def test_cider_d_hand_golden_identity():
    """Two single-ref docs, hyp == ref. 1- and 2-gram cosines are exactly 1
    (any nonzero tf-idf vector vs itself), 3-/4-grams vanish (len 2), length
    penalty exp(0)=1 -> per-doc 10*(1+1+0+0)/4 = 5."""
    score = m.cider_d(["a b", "c d"], [["a b"], ["c d"]])
    assert abs(score - 5.0) < 1e-12


def test_cider_d_hand_golden_partial():
    """doc1: hyp 'a b' vs ref 'a c'; doc2: hyp 'c d' vs ref 'c d'.
    df: a->1, c->2, d->1, b->0 over 2 docs.
    doc1 1-gram: hyp vec {a: ln2, b: ln2}, ref vec {a: ln2, c: 0};
    min-clipped dot = ln2^2, norms sqrt(2)*ln2 and ln2 -> sim 1/sqrt2;
    2-grams share nothing -> doc1 = 10*(1/sqrt2)/4.
    doc2: c has idf 0, d carries it -> 1-gram sim 1; 2-gram sim 1 -> 5."""
    import math as _math
    want = (10.0 * (1.0 / _math.sqrt(2.0)) / 4.0 + 5.0) / 2.0
    score = m.cider_d(["a b", "c d"], [["a c"], ["c d"]])
    assert abs(score - want) < 1e-12


def test_meteor_formula_vs_nltk_external_anchor():
    """EXTERNAL cross-check of the METEOR scoring formula (P/R, fmean,
    chunk fragmentation penalty) against nltk's independent implementation.

    nltk's synonym stage needs the WordNet corpus (absent offline), so it is
    stubbed to empty synsets; sentences are built from words with pairwise
    DISTINCT Porter stems, which (a) makes the synonym stage irrelevant and
    (b) forces a unique alignment — nltk's stage-sequential matcher and our
    chunk-minimizing beam aligner must then produce the identical matching,
    isolating the formula for comparison. meteor_single uses the classic
    alpha=0.9/beta=3/gamma=0.5 parameters nltk also defaults to."""
    import random

    from nltk.stem.porter import PorterStemmer

    from vcr_tpu.evals.metrics import meteor_single

    try:
        from nltk.translate.meteor_score import single_meteor_score
    except ImportError:  # pragma: no cover - nltk always in this image
        import pytest

        pytest.skip("nltk meteor_score unavailable")

    class _NoWordnet:
        @staticmethod
        def synsets(word):
            return []

    stemmer = PorterStemmer()
    pool, seen = [], set()
    for w in ("cat dog house tree river guitar window garden mountain blue "
              "green seven table chair cloud stone music paper bottle king "
              "ocean forest candle mirror lamp engine planet shadow").split():
        s = stemmer.stem(w)
        if s not in seen:
            seen.add(s)
            pool.append(w)

    rng = random.Random(7)
    checked = 0
    for _ in range(300):
        n_h, n_r = rng.randint(1, 10), rng.randint(1, 10)
        hyp = rng.sample(pool, n_h)
        ref = rng.sample(pool, n_r)
        ours = meteor_single(" ".join(hyp), " ".join(ref))
        theirs = single_meteor_score(ref, hyp, wordnet=_NoWordnet())
        assert abs(ours - theirs) < 1e-12, (hyp, ref, ours, theirs)
        checked += 1
    assert checked == 300


def test_cider_d_raw_count_tf_golden():
    """Locks the CANONICAL raw-count tf (pycocoevalcap counts2vec): doc1 has
    hyp 'a a' (count 2) vs ref 'a' (count 1) — under raw counts the
    min-clip gives sim = ln2^2/(2ln2*ln2) = 1/2, under a length-normalized
    tf it would give 1.0. With the bigram side empty and delta=1:
    doc1 = 10*(0.5*exp(-1/72))/4; doc2 (identical 'b') = 10/4."""
    import math as _math

    want = (10.0 * 0.5 * _math.exp(-1.0 / 72.0) / 4.0 + 2.5) / 2.0
    score = m.cider_d(["a a", "b"], [["a"], ["b"]])
    assert abs(score - want) < 1e-12


# ------------------------------------------- ROUGE-L anchored to rouge_score

def test_rouge_l_matches_rouge_score_package():
    """LCS precision/recall externally anchored against Google's rouge_score
    (coco-caption's F uses beta=1.2 where rouge_score fixes beta=1, so F is
    recomputed from the package's own P/R via the same formula)."""
    import random

    from rouge_score import rouge_scorer

    class _WhitespaceTok:
        def tokenize(self, text):
            return text.lower().split()

    scorer = rouge_scorer.RougeScorer(["rougeL"], tokenizer=_WhitespaceTok())
    pool = ("cat dog table chair runs jumps sits red blue small the a on "
            "under over garden river child book tree").split()
    rng = random.Random(11)
    beta = 1.2
    for _ in range(200):
        hyp = " ".join(rng.choices(pool, k=rng.randint(1, 12)))
        refs = [" ".join(rng.choices(pool, k=rng.randint(1, 12)))
                for _ in range(rng.randint(1, 3))]
        prec = max(scorer.score(r, hyp)["rougeL"].precision for r in refs)
        rec = max(scorer.score(r, hyp)["rougeL"].recall for r in refs)
        if prec == 0.0 or rec == 0.0:
            want = 0.0
        else:
            want = (1 + beta ** 2) * prec * rec / (rec + beta ** 2 * prec)
        got = m.rouge_l(hyp, refs)
        assert abs(got - want) < 1e-12, (hyp, refs, got, want)


def test_rouge_l_identity_and_corpus_mean():
    assert abs(m.rouge_l("a cat sat", ["a cat sat"]) - 1.0) < 1e-12
    assert m.rouge_l("x y z", ["a b c"]) == 0.0
    one = m.rouge_l("a cat", ["a cat sat on the mat"])
    got = m.corpus_rouge_l(["a cat", "x"], [["a cat sat on the mat"], ["y"]])
    assert abs(got - one / 2) < 1e-12
    assert m.corpus_rouge_l([], []) == 0.0


def test_rouge_l_empty_hyp_or_ref():
    assert m.rouge_l("", ["a b"]) == 0.0
    assert m.rouge_l("a b", [""]) == 0.0


# --------------------------------------------- embedding metrics (GloVe-based)

def _toy_lookup():
    import numpy as np

    table = {
        "cat": np.array([1.0, 0.0]),
        "dog": np.array([0.0, 1.0]),
        "kitten": np.array([0.8, 0.6]),   # unit, 0.8 cosine to cat
        "neg": np.array([-2.0, 0.0]),
    }
    return lambda w: table.get(w)


def test_embedding_average_golden():
    import math

    lk = _toy_lookup()
    # identical sentence -> 1.0
    assert abs(m.embedding_average("cat dog", ["cat dog"], lk) - 1.0) < 1e-12
    # mean(cat,dog)=(.5,.5) vs cat=(1,0): cos = .5/(sqrt(.5)*1)
    want = 0.5 / math.sqrt(0.5)
    assert abs(m.embedding_average("cat dog", ["cat"], lk) - want) < 1e-12
    # max over refs picks the identical one
    assert abs(m.embedding_average("cat dog", ["cat", "cat dog"], lk) - 1.0) < 1e-12
    # OOV-only -> 0
    assert m.embedding_average("zzz", ["cat"], lk) == 0.0
    assert m.embedding_average("cat", ["zzz"], lk) == 0.0


def test_vector_extrema_golden():
    lk = _toy_lookup()
    # extrema of (cat, neg) picks -2 on dim0 (|−2| > |1|) -> (-2, 0)
    # vs ref cat (1,0): cos = -1 -> max(best,.) keeps 0.0 floor
    assert m.vector_extrema("cat neg", ["cat"], lk) == 0.0
    # extrema of (cat, dog) = (1,1); vs kitten (.8,.6): cos=(1.4)/(sqrt2*1)
    import math
    want = 1.4 / math.sqrt(2.0)
    assert abs(m.vector_extrema("cat dog", ["kitten"], lk) - want) < 1e-12


def test_greedy_matching_golden():
    lk = _toy_lookup()
    # hyp "cat dog" vs ref "cat": G(h,r) = mean(1, 0) = .5 ; G(r,h) = 1
    assert abs(m.greedy_matching("cat dog", ["cat"], lk) - 0.75) < 1e-12
    # identity -> 1
    assert abs(m.greedy_matching("cat dog", ["cat dog"], lk) - 1.0) < 1e-12


def test_corpus_embedding_metrics_mean():
    lk = _toy_lookup()
    got = m.corpus_embedding_metrics(
        ["cat", "dog"], [["cat"], ["cat"]], lk)
    assert abs(got["EmbAverage"] - 0.5) < 1e-12       # (1 + 0)/2
    assert abs(got["GreedyMatching"] - 0.5) < 1e-12
    assert abs(got["VectorExtrema"] - 0.5) < 1e-12
    empty = m.corpus_embedding_metrics([], [], lk)
    assert empty == {"EmbAverage": 0.0, "VectorExtrema": 0.0,
                     "GreedyMatching": 0.0}


def test_vocab_lookup_adapter(tmp_path):
    import numpy as np

    glove = tmp_path / "g.txt"
    glove.write_text("cat 1.0 0.0\ndog 0.0 1.0\n")
    from vcr_tpu.vocab import Vocab
    v = Vocab(str(glove))
    lk = m.vocab_lookup(v)
    np.testing.assert_allclose(lk("cat"), [1.0, 0.0])
    assert lk("unknown-word-zzz") is None
    assert abs(m.embedding_average("cat", ["cat"], lk) - 1.0) < 1e-12


def test_corpus_bleu_matches_sacrebleu():
    """Second external anchor (nltk is the first): sacrebleu with
    tokenize='none', no smoothing — identical closest-ref-length brevity
    penalty and clipped modified precisions."""
    import random

    import sacrebleu

    pool = "cat dog runs the a on".split()
    rng = random.Random(5)
    hyps, refs_list = [], []
    for _ in range(60):
        base = rng.choices(pool, k=rng.randint(6, 14))
        hyps.append(" ".join(base))

        def perturb(t):
            t = list(t)
            if len(t) > 4 and rng.random() < 0.7:
                i = rng.randrange(len(t))
                t[i] = rng.choice(pool)
            return " ".join(t)

        refs_list.append([perturb(base), perturb(base)])

    ours = m.corpus_bleu(hyps, refs_list)
    streams = [[r[i] for r in refs_list] for i in range(2)]
    want = sacrebleu.corpus_bleu(hyps, streams, smooth_method="none",
                                 tokenize="none", force=True).score / 100.0
    assert abs(ours - want) < 1e-12


def test_metrics_fuzz_bounds_and_robustness():
    """The validation pass feeds whatever the decoder emits — including empty
    strings, pure punctuation, and long repeats early in training. Every
    metric must stay finite, in range, and exception-free on garbage."""
    import math
    import random

    import numpy as np

    rng = random.Random(99)
    pool = ["cat", "dog", "the", "a", ".", ",", "'s", "n't", "running",
            "jumped", "zzzqx", ""]
    lookup = lambda w: {"cat": np.array([1.0, 0.0]),
                        "dog": np.array([0.0, 1.0])}.get(w)

    def rand_sent():
        k = rng.randint(0, 15)
        return " ".join(rng.choices(pool, k=k))

    for _ in range(150):
        hyp = rand_sent()
        refs = [rand_sent() for _ in range(rng.randint(1, 3))]
        for name, score in [
            ("meteor15", m.meteor15_score(hyp, refs)),
            ("meteor", m.meteor_score(hyp, refs)),
            ("bleu4", m.bleu4_score(hyp, refs)),
            ("rouge_l", m.rouge_l(hyp, refs)),
            ("emb_avg", m.embedding_average(hyp, refs, lookup)),
            ("extrema", m.vector_extrema(hyp, refs, lookup)),
            ("greedy_m", m.greedy_matching(hyp, refs, lookup)),
        ]:
            assert math.isfinite(score), (name, hyp, refs)
            assert -1.0 - 1e-9 <= score <= 1.0 + 1e-9, (name, score, hyp, refs)

    hyps = [rand_sent() for _ in range(20)]
    refs_list = [[rand_sent() for _ in range(2)] for _ in range(20)]
    assert math.isfinite(m.corpus_bleu(hyps, refs_list))
    c = m.cider_d(hyps, refs_list)
    assert math.isfinite(c) and c >= 0.0
    assert math.isfinite(m.corpus_rouge_l(hyps, refs_list))
    emb = m.corpus_embedding_metrics(hyps, refs_list, lookup)
    assert all(math.isfinite(v) for v in emb.values())


# -------------------- synonym / paraphrase matcher stages (round 3, pluggable)
# The jar's stage-2/3 matchers at the official weights (synonym 0.8,
# paraphrase 0.6). Their data files are env-blocked, so the stages are inert
# until a table is installed; these tests install tiny synthetic tables.

import pytest


@pytest.fixture
def _clean_resources():
    m.set_meteor_resources()  # start inert
    yield
    m.set_meteor_resources()  # never leak into other tests


def test_synonym_stage_golden(_clean_resources):
    """'a feline' vs 'a cat' with feline~cat synonyms: exact 'a' (function
    word, weight 0.25) + synonym stage (w=0.8) on the content pair.
    P = R = (0.25 + 0.8*0.75)/1.0 = 0.85; 1 chunk / 2 matches ->
    score = 0.85*(1 - 0.6*0.5**0.2)."""
    base = m.meteor15_single("a feline", "a cat")
    m.set_meteor_resources(synonyms={"feline": {"s1"}, "cat": {"s1", "s2"}})
    want = 0.85 * (1.0 - 0.6 * 0.5 ** 0.2)
    assert abs(m.meteor15_single("a feline", "a cat") - want) < 1e-12
    assert want > base  # the stage only adds matches
    m.set_meteor_resources()
    assert m.meteor15_single("a feline", "a cat") == base  # inert again


def test_synonym_requires_shared_synset(_clean_resources):
    m.set_meteor_resources(synonyms={"feline": {"s1"}, "cat": {"s9"}})
    assert m._align_pairs(["feline"], ["cat"]) == []


def test_exact_stage_beats_synonym(_clean_resources):
    # A self-synonymous word must still match at stage 0 (jar priority).
    m.set_meteor_resources(synonyms={"cat": {"s1"}})
    assert m._align_pairs(["cat"], ["cat"]) == [(0, 0, 0)]


def test_paraphrase_stage_span_golden(_clean_resources):
    """'a big dog runs' vs 'a canine runs' with 'big dog' ~ 'canine':
    exact a + runs, paraphrase span (2 hyp words <-> 1 ref word, w=0.6).
    All units chain contiguously -> 1 chunk; covered 4 hyp + 3 ref words,
    matches = 3.5. P = (0.25 + 2*0.6*0.75 + 0.75)/2.5;
    R = (0.25 + 0.6*0.75 + 0.75)/1.75."""
    m.set_meteor_resources(paraphrases=[(["big", "dog"], ["canine"])])
    p = (0.25 + 2 * 0.6 * 0.75 + 0.75) / 2.5
    r = (0.25 + 0.6 * 0.75 + 0.75) / 1.75
    fmean = p * r / (0.85 * p + 0.15 * r)
    want = fmean * (1.0 - 0.6 * (1.0 / 3.5) ** 0.2)
    got = m.meteor15_single("a big dog runs", "a canine runs")
    assert abs(got - want) < 1e-12
    units = m._align_matches(
        ["a", "big", "dog", "runs"], ["a", "canine", "runs"])
    assert (1, 2, 1, 1, 3) in units and m._chunks_m(units) == 1


def test_paraphrase_is_symmetric_and_nonoverlapping(_clean_resources):
    m.set_meteor_resources(paraphrases=[(["big", "dog"], ["canine"])])
    # symmetric: table direction reversed
    units = m._align_matches(["canine"], ["big", "dog"])
    assert units == [(0, 1, 0, 2, 3)]
    # a word already consumed by a span can't be rematched: exact 'dog'
    # (w=1.0) + leftover vs the span (w=0.6 over more coverage) — the beam
    # prefers coverage, so the span wins and 'dog' pairs nowhere else.
    units = m._align_matches(["big", "dog"], ["canine", "dog"])
    covs = m._covered(units)
    assert covs[0] == 2  # both hyp words covered exactly once


def test_resource_file_loaders(_clean_resources, tmp_path):
    syn = tmp_path / "synsets.tsv"
    syn.write_text("feline\ts1 s2\ncat\ts2\n")
    para = tmp_path / "paraphrase.tsv"
    para.write_text("big dog\tcanine\n")
    assert m.load_meteor_synonyms(str(syn)) == 2
    assert m.load_meteor_paraphrases(str(para)) == 1
    assert m._align_pairs(["feline"], ["cat"]) == [(0, 0, 2)]
    assert m._align_matches(["canine"], ["big", "dog"]) == [(0, 1, 0, 2, 3)]
    # loading one resource must not drop the other
    assert m._SYNONYMS is not None and m._PARAPHRASES is not None


def test_wordnet_table_absent_is_none():
    # zero-egress image: nltk wordnet data is absent; the hook must degrade
    # to None, not raise (a deployment with nltk_data gets a dict).
    table = m.wordnet_synonym_table()
    assert table is None or isinstance(table, dict)


def test_configure_meteor_resources_cli_adapter(_clean_resources, tmp_path):
    syn = tmp_path / "syn.tsv"
    syn.write_text("feline\ts1\ncat\ts1\n")
    para = tmp_path / "para.tsv"
    para.write_text("big dog\tcanine\n")
    s = m.configure_meteor_resources(str(syn), str(para))
    assert "2 words" in s and "1 pairs" in s
    assert m._align_pairs(["feline"], ["cat"]) == [(0, 0, 2)]
    # "wordnet" degrades gracefully where nltk_data is absent
    m.set_meteor_resources()
    import warnings as w
    with w.catch_warnings():
        w.simplefilter("ignore")
        s2 = m.configure_meteor_resources("wordnet", "")
    assert ("inert" in s2) or ("wordnet (" in s2)
    assert m.configure_meteor_resources() == ""  # both off: no-op
