"""GloVe truncation: filter full GloVe files down to the train-caption vocab.

Reference: data/extract_glove.py:14-55 — builds the lowercased token vocab from
train_captions.json, then writes corpus-local copies of every
``data/glove/*.txt`` containing only in-vocab rows.
"""

from __future__ import annotations

import json
import os
import shutil

from vcr_tpu.data.captions import word_tokenize


def extract_glove(cfg) -> None:
    corpus_base = os.path.join(cfg.data_dir, cfg.corpus)
    with open(os.path.join(corpus_base, "train_captions.json")) as fp:
        content = json.load(fp)

    vocab = set()
    for video in content:
        for cap in video["captions"]:
            desc = cap["desc"]
            toks = word_tokenize(desc) if isinstance(desc, str) else desc
            vocab.update(w.lower() for w in toks)
    print(f"Found {len(vocab)} words in caption vocabulary")

    glove_dir = os.path.join(cfg.data_dir, "glove/")
    trunc_dir = os.path.join(corpus_base, "glove/")
    if os.path.isdir(trunc_dir):
        shutil.rmtree(trunc_dir)
    os.makedirs(trunc_dir)

    for glove_file in sorted(f for f in os.listdir(glove_dir) if f.endswith(".txt")):
        print(f"Processing {glove_file}... ", end="", flush=True)
        out_path = os.path.join(trunc_dir, glove_file)
        # stream the (potentially multi-GB) GloVe file; keep in-vocab rows
        with open(os.path.join(glove_dir, glove_file)) as fin, \
                open(out_path, "w") as fout:
            for line in fin:
                word = line.split(" ", 1)[0]
                if word in vocab:
                    fout.write(line)
        print("done")
