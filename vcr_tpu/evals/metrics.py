"""Caption quality metrics: METEOR, BLEU-4, CIDEr-D — pure Python, no external
services.

The reference evaluates METEOR only, via the nlg-eval package's Java jar
(reference: train.py:115-119, train_utils.py:97-111), averaging a per-sample
score over each batch. That jar (and WordNet) are unavailable in a zero-egress
environment, so:

* :func:`meteor_score` implements METEOR with exact + Porter-stem matching
  stages (the standard parameters alpha=0.9, beta=3, gamma=0.5 used by
  nltk.translate.meteor_score); the WordNet synonym stage is skipped. It is
  used exactly like the reference uses METEOR — per-sample, max over
  references, averaged over the batch — for model selection.
* :func:`bleu4_score` / :func:`corpus_bleu` implement smoothed sentence and
  corpus BLEU (uniform 4-gram weights, standard brevity penalty).
* :func:`cider_d` implements CIDEr-D (tf-idf 1..4-gram cosine with length
  penalty, x10), required by the north-star parity target (BASELINE.md).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from typing import Dict, List, Sequence, Tuple

from functools import lru_cache

from nltk.stem.porter import PorterStemmer

_PORTER = PorterStemmer()


@lru_cache(maxsize=65536)
def _stem(word: str) -> str:
    # caption vocabularies are small; caching makes METEOR ~linear in tokens
    return _PORTER.stem(word)


def tokenize(text: str) -> List[str]:
    return text.lower().split()


# ---------------------------------------------------------------- METEOR

def _align(hyp: List[str], ref: List[str]) -> Tuple[int, int]:
    """Greedy two-stage alignment (exact, then stem). Returns (matches, chunks)."""
    h_idx = list(range(len(hyp)))
    r_idx = list(range(len(ref)))
    pairs: List[Tuple[int, int]] = []

    # stage 1: exact matches (first-come greedy, as in nltk's implementation)
    used_r = set()
    for i in list(h_idx):
        for j in r_idx:
            if j not in used_r and hyp[i] == ref[j]:
                pairs.append((i, j))
                used_r.add(j)
                h_idx.remove(i)
                break
    r_idx = [j for j in r_idx if j not in used_r]

    # stage 2: stem matches on the leftovers
    h_stem = {i: _stem(hyp[i]) for i in h_idx}
    r_stem = {j: _stem(ref[j]) for j in r_idx}
    used_r2 = set()
    for i in list(h_idx):
        for j in r_idx:
            if j not in used_r2 and h_stem[i] == r_stem[j]:
                pairs.append((i, j))
                used_r2.add(j)
                h_idx.remove(i)
                break

    if not pairs:
        return 0, 0
    # chunk count: contiguous runs in both hyp and ref order
    pairs.sort()
    chunks = 1
    for (i1, j1), (i2, j2) in zip(pairs, pairs[1:]):
        if not (i2 == i1 + 1 and j2 == j1 + 1):
            chunks += 1
    return len(pairs), chunks


def meteor_single(hyp: str, ref: str,
                  alpha: float = 0.9, beta: float = 3.0, gamma: float = 0.5) -> float:
    h, r = tokenize(hyp), tokenize(ref)
    if not h or not r:
        return 0.0
    matches, chunks = _align(h, r)
    if matches == 0:
        return 0.0
    precision = matches / len(h)
    recall = matches / len(r)
    fmean = precision * recall / (alpha * precision + (1 - alpha) * recall)
    frag = chunks / matches
    penalty = gamma * (frag ** beta)
    return (1 - penalty) * fmean


def meteor_score(hyp: str, refs: Sequence[str]) -> float:
    """Max over references, as METEOR defines multi-reference scoring."""
    return max((meteor_single(hyp, r) for r in refs), default=0.0)


def batch_meteor(hyps: Sequence[str], refs_list: Sequence[Sequence[str]]) -> float:
    """Average per-sample METEOR over a batch — the reference's aggregation
    (train_utils.py:97-111)."""
    if not hyps:
        return 0.0
    return sum(meteor_score(h, rs) for h, rs in zip(hyps, refs_list)) / len(hyps)


# ---------------------------------------------------------------- BLEU

def _ngrams(tokens: List[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def bleu4_score(hyp: str, refs: Sequence[str], max_n: int = 4,
                smooth: bool = True) -> float:
    """Smoothed sentence BLEU-4 (add-epsilon smoothing on zero counts)."""
    h = tokenize(hyp)
    refs_tok = [tokenize(r) for r in refs]
    if not h:
        return 0.0
    log_precisions = 0.0
    for n in range(1, max_n + 1):
        h_ngrams = _ngrams(h, n)
        max_ref: Counter = Counter()
        for rt in refs_tok:
            for g, c in _ngrams(rt, n).items():
                max_ref[g] = max(max_ref[g], c)
        clipped = sum(min(c, max_ref[g]) for g, c in h_ngrams.items())
        total = max(sum(h_ngrams.values()), 1)
        if clipped == 0:
            if not smooth:
                return 0.0
            p = 1.0 / (2 * total)
        else:
            p = clipped / total
        log_precisions += math.log(p) / max_n
    # brevity penalty against the closest reference length
    ref_len = min((len(rt) for rt in refs_tok),
                  key=lambda rl: (abs(rl - len(h)), rl))
    bp = 1.0 if len(h) > ref_len else math.exp(1 - ref_len / max(len(h), 1))
    return bp * math.exp(log_precisions)


def corpus_bleu(hyps: Sequence[str], refs_list: Sequence[Sequence[str]],
                max_n: int = 4) -> float:
    """Corpus-level BLEU-4 (coco-caption style aggregation)."""
    clipped = [0] * max_n
    totals = [0] * max_n
    hyp_len = 0
    ref_len = 0
    for hyp, refs in zip(hyps, refs_list):
        h = tokenize(hyp)
        refs_tok = [tokenize(r) for r in refs]
        hyp_len += len(h)
        if refs_tok:
            ref_len += min((len(rt) for rt in refs_tok),
                           key=lambda rl: (abs(rl - len(h)), rl))
        for n in range(1, max_n + 1):
            h_ngrams = _ngrams(h, n)
            max_ref: Counter = Counter()
            for rt in refs_tok:
                for g, c in _ngrams(rt, n).items():
                    max_ref[g] = max(max_ref[g], c)
            clipped[n - 1] += sum(min(c, max_ref[g]) for g, c in h_ngrams.items())
            totals[n - 1] += sum(h_ngrams.values())
    if hyp_len == 0:
        return 0.0
    log_p = 0.0
    for n in range(max_n):
        if clipped[n] == 0:
            return 0.0
        log_p += math.log(clipped[n] / max(totals[n], 1)) / max_n
    bp = 1.0 if hyp_len > ref_len else math.exp(1 - ref_len / max(hyp_len, 1))
    return bp * math.exp(log_p)


# ---------------------------------------------------------------- CIDEr-D

def cider_d(hyps: Sequence[str], refs_list: Sequence[Sequence[str]],
            max_n: int = 4, sigma: float = 6.0) -> float:
    """CIDEr-D over a corpus: tf-idf weighted n-gram cosine similarity with a
    gaussian length penalty, averaged over 1..4-grams, scaled by 10."""
    assert len(hyps) == len(refs_list)
    if not hyps:
        return 0.0

    # document frequencies from the reference sets
    doc_freq: List[Dict[tuple, int]] = [defaultdict(int) for _ in range(max_n)]
    refs_tok_all = []
    for refs in refs_list:
        refs_tok = [tokenize(r) for r in refs]
        refs_tok_all.append(refs_tok)
        for n in range(1, max_n + 1):
            seen = set()
            for rt in refs_tok:
                seen.update(_ngrams(rt, n).keys())
            for g in seen:
                doc_freq[n - 1][g] += 1
    num_docs = float(len(refs_list))

    def tfidf_vec(tokens: List[str], n: int) -> Tuple[Dict[tuple, float], float]:
        counts = _ngrams(tokens, n)
        length = float(sum(counts.values())) or 1.0
        vec = {}
        norm = 0.0
        for g, c in counts.items():
            df = math.log(max(doc_freq[n - 1].get(g, 0), 1.0))
            w = (c / length) * (math.log(num_docs) - df)
            w = max(w, 0.0)
            vec[g] = w
            norm += w * w
        return vec, math.sqrt(norm)

    total = 0.0
    for hyp, refs_tok in zip(hyps, refs_tok_all):
        h = tokenize(hyp)
        score_n = [0.0] * max_n
        for n in range(1, max_n + 1):
            hv, hnorm = tfidf_vec(h, n)
            for rt in refs_tok:
                rv, rnorm = tfidf_vec(rt, n)
                # CIDEr-D: min-clipped numerator + length penalty
                num = sum(min(hv.get(g, 0.0), rv[g]) * rv[g] for g in rv)
                if hnorm > 0 and rnorm > 0:
                    sim = num / (hnorm * rnorm)
                else:
                    sim = 0.0
                delta = len(h) - len(rt)
                sim *= math.exp(-(delta ** 2) / (2 * sigma ** 2))
                score_n[n - 1] += sim
            score_n[n - 1] /= max(len(refs_tok), 1)
        total += 10.0 * sum(score_n) / max_n
    return total / len(hyps)
