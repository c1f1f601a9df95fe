"""Caption-file reading and tokenization.

Reference: dataset.py:14-26 reads ``{split}_captions.json`` — a list of
``{"video_key"|"video_id": str, "captions": [{"desc": str}, ...]}`` — and
nltk.word_tokenize's every caption at load time. This environment has no punkt
data, so we use nltk's data-free TreebankWordTokenizer, which produces the same
tokens for the simple lowercase English of these corpora.
"""

from __future__ import annotations

import json
from typing import Dict, List

from nltk.tokenize.treebank import TreebankWordTokenizer

_TOKENIZER = TreebankWordTokenizer()


def word_tokenize(text: str) -> List[str]:
    return _TOKENIZER.tokenize(text)


def read_caption_file(fname: str) -> List[Dict]:
    """Load captions JSON and tokenize each description (dataset.py:14-26)."""
    with open(fname, "r") as fp:
        samples = json.load(fp)
    for sample in samples:
        for cap in sample["captions"]:
            cap["desc"] = word_tokenize(cap["desc"]) if isinstance(cap["desc"], str) \
                else cap["desc"]
    return samples
