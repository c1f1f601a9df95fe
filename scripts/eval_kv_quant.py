#!/usr/bin/env python
"""A/B quality evaluation of the quantized serving modes (KV cache + weights).

``--serve_kv_cache int8/int4`` shrinks the slot-decode tick's dominant HBM
cache stream (ops/kvquant.py) and ``--serve_decode_weights int8`` halves the
decoder weight stream (ops/wquant.py), each at a bounded quantization error
(SERVING.md). Whether that error is acceptable is an empirical, per-model
question — this tool answers it: caption the SAME split with pools built
from one checkpoint across the mode grid (bf16 / int8 / int4 caches ×
bf16 / int8 weights), and report each variant's corpus metrics
(METEOR / BLEU-4 / ROUGE-L) plus the raw token agreement rate vs the exact
bf16 pool.

    python scripts/eval_kv_quant.py --save_path ./trained_models \
        --data_dir ./data/msrvtt --corpus msrvtt --glove_emb_file glove.6B.300d.txt

Transformer-family checkpoints only (GRU families carry no KV cache).
One JSON line per pool + a "delta" line. Runs on any backend.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    from vcr_tpu.config import build_parser

    ap = build_parser()
    ap.add_argument("--split", default="val")
    args = ap.parse_args(argv)
    split = args.split
    del args.split

    from vcr_tpu.utils import backend_probe

    ok, diag = backend_probe.ensure_backend()
    if not ok:
        print(f"backend unavailable: {diag}", file=sys.stderr)
        return 1

    import jax

    from vcr_tpu.config import Config
    from vcr_tpu.data.pipeline import CaptionDataset
    from vcr_tpu.evals import metrics as qmetrics
    from vcr_tpu.serving_continuous import ContinuousCaptioner
    from vcr_tpu.tools import load_inference_state

    cfg = Config.from_dict({k: v for k, v in vars(args).items()
                            if v is not None})
    cfg, params, spec, vocab = load_inference_state(cfg, "")
    if spec.arch != "transformer":
        print(f"kv_cache='int8' applies to transformer checkpoints only; "
              f"this one is {spec.arch!r}", file=sys.stderr)
        return 1

    ds = CaptionDataset(cfg.data_dir, cfg.corpus, split, vocab,
                        cfg.num_frames, cfg.max_len, "cnn")
    feats = {i: ds.load_features(i) for i in range(len(ds))}
    refs = [[" ".join(c["desc"]).lower() for c in ds.captions[i]["captions"]]
            for i in range(len(ds))]

    variants = [("bf16", "bf16"), ("int8", "bf16"), ("int4", "bf16"),
                ("bf16", "int8"), ("int8", "int8"), ("int4", "int8")]
    rows = {}
    for kv, dw in variants:
        cc = ContinuousCaptioner(params, spec, slots=cfg.serve_slots,
                                 admit_chunk=cfg.serve_admit_chunk,
                                 eos_id=vocab.eos_id,
                                 beam_size=max(cfg.beam_size, 1),
                                 kv_cache=kv, decode_weights=dw,
                                 rng=jax.random.PRNGKey(cfg.seed))
        toks = cc.caption_all(feats)
        hyps = [vocab.get_sents_from_indexes(
            np.asarray(toks[i], np.int32)[None])[0] for i in range(len(ds))]
        row = {
            "metric": f"{kv} KV / {dw} weights pool ({split}, {len(ds)} "
                      f"videos, beam={max(cfg.beam_size, 1)})",
            "METEOR": round(float(np.mean([qmetrics.meteor_score(h, r)
                                           for h, r in zip(hyps, refs)])), 5),
            "BLEU4": round(qmetrics.corpus_bleu(hyps, refs), 5),
            "ROUGE_L": round(qmetrics.corpus_rouge_l(hyps, refs), 5),
        }
        rows[(kv, dw)] = (row, toks, hyps)
        print(json.dumps(row), flush=True)

    (a_row, a_toks, a_hyps) = rows[("bf16", "bf16")]
    for kv, dw in variants[1:]:
        (b_row, b_toks, b_hyps) = rows[(kv, dw)]
        same_caption = sum(a_hyps[i] == b_hyps[i] for i in range(len(ds)))
        a_flat = [int(t) for i in range(len(ds))
                  for t in np.asarray(a_toks[i])]
        b_flat = [int(t) for i in range(len(ds))
                  for t in np.asarray(b_toks[i])]
        n = min(len(a_flat), len(b_flat))
        tok_agree = (sum(a == b for a, b in zip(a_flat[:n], b_flat[:n]))
                     / max(n, 1))
        print(json.dumps({
            "metric": f"{kv} KV / {dw} weights vs bf16 delta",
            "d_METEOR": round(b_row["METEOR"] - a_row["METEOR"], 5),
            "d_BLEU4": round(b_row["BLEU4"] - a_row["BLEU4"], 5),
            "d_ROUGE_L": round(b_row["ROUGE_L"] - a_row["ROUGE_L"], 5),
            "identical_captions": f"{same_caption}/{len(ds)}",
            "token_agreement": round(tok_agree, 4),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
