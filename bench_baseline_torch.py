"""Measured PyTorch baseline anchor for bench.py's `vs_baseline`.

Runs the reference's S2VT greedy eval decode (S2VTModel.py:121-177 flow: 30
encode steps batched by nn.GRU, then 20 sequential single-step decode
iterations with embedding + vocab Linear per step) in torch on THIS host's
CPU at the reference dims (vocab 9k, embed 300, H 512, vid_feat 4096, N=30,
L=20), at the reference default bsize 32 (args.py:20) and at a
throughput-oriented bsize 256.

This gives `vs_baseline` a *measured lower bound*: a V100 runs this workload
faster than a host CPU but is bounded above by the analytic estimate in
bench.py (sequential kernel-launch-dominated decode ≈ 3,000 captions/s).
bench.py's denominator stays the analytic V100 estimate — this script exists
so the anchor chain (measured CPU floor < estimated V100 < our TPU number)
is recorded from real measurements, not only back-of-envelope.

Prints one JSON line per batch size.
"""

import json
import time

import numpy as np
import torch
import torch.nn as nn


class TorchS2VT(nn.Module):
    """Reference S2VTModel skeleton (S2VTModel.py:37-49)."""

    def __init__(self, vocab_size=9000, embed_size=300, hidden=512, vid_feat=4096):
        super().__init__()
        self.embedding = nn.Sequential(nn.Embedding(vocab_size, embed_size),
                                       nn.Dropout(0.0))
        self.rnn1 = nn.GRU(vid_feat, hidden)
        self.rnn2 = nn.GRU(hidden + embed_size, hidden)
        self.linear = nn.Sequential(nn.Dropout(0.0), nn.Linear(hidden, vocab_size))


@torch.no_grad()
def greedy(m, vid_feats, max_len=20, sos_id=8996, vid_feat_size=4096,
           embed_size=300):
    """Reference eval decode loop (S2VTModel.py:148-177)."""
    x = vid_feats.transpose(0, 1)
    out1, state1 = m.rnn1(x)
    b = vid_feats.shape[0]
    pad = torch.zeros(out1.shape[0], b, embed_size)
    _, state2 = m.rnn2(torch.cat([out1, pad], dim=2))
    vid_zero = torch.zeros(1, b, vid_feat_size)
    words = torch.full((1, b), sos_id, dtype=torch.long)
    toks = []
    for _ in range(max_len):
        o1, state1 = m.rnn1(vid_zero, state1)
        emb = m.embedding(words)
        o2, state2 = m.rnn2(torch.cat([o1, emb], dim=2), state2)
        outs = m.linear(o2.squeeze(0))
        words = torch.argmax(outs, dim=1).unsqueeze(0)
        toks.append(words)
    return torch.cat(toks, dim=0)


def main() -> None:
    import os
    torch.set_num_threads(os.cpu_count() or 1)
    torch.manual_seed(0)
    m = TorchS2VT().eval()
    for batch in (32, 256):
        feats = torch.randn(batch, 30, 4096)
        greedy(m, feats)  # warm
        reps = 5 if batch == 32 else 2
        dt = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            greedy(m, feats)
            dt = min(dt, time.perf_counter() - t0)
        print(json.dumps({
            "metric": f"torch-CPU reference S2VT greedy (B={batch}, "
                      f"{torch.get_num_threads()} threads)",
            "value": round(batch / dt, 2),
            "unit": "captions/s",
        }), flush=True)


if __name__ == "__main__":
    main()
